#!/usr/bin/env python
"""Chunk-size sweep for extend_pointers_sweep phase A (interleaved minima).

Run: python scripts/exp_sweep_ch.py [--B 65536]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def _sync(x):
    np.asarray(x.reshape(-1)[:8])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=65536)
    ap.add_argument("--L", type=int, default=1024)
    ap.add_argument("--chs", default="131072,262144,524288,1048576")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    B, L = args.B, args.L

    import jax
    import jax.numpy as jnp
    from spumoni_tpu.index.format import build_dense_index
    from spumoni_tpu.engine.layered import build_layered
    from spumoni_tpu.engine.scan_engine import (
        build_text_words, build_text_wide, extend_pointers_sweep,
        query_batch_kernel_v2)

    raw, text, rng = bench.get_index()
    dense = build_dense_index(raw, text=text, with_samples=True)
    arrays, meta, host = build_layered(dense)
    nt = int(arrays.text.shape[0])
    tw = build_text_words(arrays.text, nt)
    twide = build_text_wide(arrays.text, nt)

    reads = bench.make_reads(rng, text, B, L)
    rev = np.ascontiguousarray(reads[:, ::-1])
    alphabet = tuple(sorted(set(host.index_chars) | {0}))
    planes = host.planes_for_alphabet(alphabet)
    ptrs, _, _ = query_batch_kernel_v2(
        arrays, jax.device_put(jnp.asarray(host.rank_map(alphabet)[rev])),
        meta, "ms", False, planes)
    ptrs_fwd = jnp.asarray(np.asarray(ptrs)[:, ::-1])
    fwd_d = jax.device_put(jnp.asarray(reads))
    lens_d = jnp.asarray(np.full((B,), L, np.int64))
    _sync(ptrs_fwd)

    chs = [int(c) for c in args.chs.split(",")]
    fns, ref = {}, None
    for ch in chs:
        fns[ch] = jax.jit(lambda p, c=ch: extend_pointers_sweep(
            tw, fwd_d, lens_d, p, nt, twide, chunk_positions=c))
        out = np.asarray(fns[ch](ptrs_fwd))
        if ref is None:
            ref = out
        else:
            print(f"CH={ch}: exact={np.array_equal(out, ref)}", flush=True)
    times = {c: [] for c in chs}
    for _ in range(args.reps):
        for c, f in fns.items():
            t0 = time.perf_counter()
            _sync(f(ptrs_fwd))
            times[c].append(time.perf_counter() - t0)
    for c, ts in times.items():
        print(f"CH={c:8d}: {min(ts):6.3f} s  {B/min(ts):8.0f} reads/s",
              flush=True)


if __name__ == "__main__":
    main()
