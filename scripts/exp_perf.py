#!/usr/bin/env python
"""Perf experiment sweep for the fused PML classify kernel on the real chip.

Usage: python scripts/exp_perf.py B=65536 node=64 [pack=1] [reps=3]
Prints one line: config -> reads/s, Mbases/s.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    cfg = dict(B=65536, node=64, reps=3, L=1024, pack=0, engine="layered",
               P=128)
    for a in sys.argv[1:]:
        k, v = a.split("=")
        cfg[k] = type(cfg[k])(v)
    B, L, node = cfg["B"], cfg["L"], cfg["node"]

    raw, text, rng = bench.get_index()
    print(f"index: n={raw.n} r={len(raw.run_heads)}", flush=True)

    import jax
    import jax.numpy as jnp
    from spumoni_tpu.index.format import build_dense_index
    from spumoni_tpu.engine import layered, occblock
    from spumoni_tpu.parallel.mesh import fused_classify_kernel

    dense = build_dense_index(raw)
    if cfg["engine"] == "occ":
        arrays, meta, host = occblock.build_occblock(dense, P=cfg["P"])
        print("meta:", meta, flush=True)
        b = arrays.blocks
        print(f"  blocks: {b.shape} {b.dtype} "
              f"{b.size * b.dtype.itemsize / 1e6:.1f} MB", flush=True)
        alphabet = tuple(sorted(set(host.index_chars) | {0}))
    else:
        kw = {}
        if cfg["pack"]:
            kw["pack_pairs"] = True
        arrays, meta, host = layered.build_layered(dense, node=node, **kw)
        print("meta:", meta, flush=True)
        for i, lv in enumerate(arrays.levels):
            print(f"  level[{i}]: {lv.shape} {lv.dtype} "
                  f"{lv.size * lv.dtype.itemsize / 1e6:.1f} MB", flush=True)
        f = arrays.fields
        print(f"  fields: {f.shape} {f.dtype} "
              f"{f.size * f.dtype.itemsize / 1e6:.1f} MB", flush=True)
        alphabet = tuple(sorted(set(host.index_chars) | {0}))

    reads = bench.make_reads(rng, text, B, L)
    rev = np.ascontiguousarray(reads[:, ::-1])
    planes = host.planes_for_alphabet(alphabet)
    rev = host.rank_map(alphabet)[rev]
    lens = np.full((B,), L, dtype=np.int64)
    rp = int(arrays.blocks.shape[0] if cfg["engine"] == "occ"
             else arrays.fields.shape[0])

    def step(rev_d, lens_d):
        return fused_classify_kernel(arrays, rev_d, lens_d, 7, meta, "pml",
                                     rp, 150, planes)

    rev_d = jax.device_put(jnp.asarray(rev))
    lens_d = jax.device_put(jnp.asarray(lens))
    jax.block_until_ready((rev_d, lens_d))
    t0 = time.time()
    found, above, below, _ = step(rev_d, lens_d)
    found = np.asarray(found)
    print(f"compile+run: {time.time()-t0:.1f}s", flush=True)
    assert found[::2].mean() > 0.95 and found[1::2].mean() < 0.05, \
        (found[::2].mean(), found[1::2].mean())

    reps = cfg["reps"]
    t0 = time.time()
    for _ in range(reps):
        found, above, below, _ = step(rev_d, lens_d)
    np.asarray(found)
    dt = (time.time() - t0) / reps
    print(f"RESULT eng={cfg["engine"]} B={B} node={node}: "
          f"{B/dt:,.0f} reads/s  {B*L/dt/1e6:.1f} Mbases/s  "
          f"({dt*1e6/L:.0f} us/step)", flush=True)


if __name__ == "__main__":
    main()
