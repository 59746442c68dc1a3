#!/usr/bin/env python
"""On-chip experiment: field-table GROUP width vs the >=2^18-row gather cliff.

The bench pangenome index has rp=4M field rows. G=16 leaves 262144 physical
rows (exactly at the cliff); G=32 -> 131072 (just under); G=64 -> 65536.
Times the full fused classify step (same path as bench.py) per G.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as B  # reuse cached index + read generator

import jax
import jax.numpy as jnp
from spumoni_tpu.index.format import build_dense_index
from spumoni_tpu.engine.layered import build_layered
from spumoni_tpu.parallel.mesh import fused_classify_kernel


def main():
    BB = int(os.environ.get("EXP_B", B.B))
    raw, text, rng = B.get_index()
    dense = build_dense_index(raw)
    reads = B.make_reads(rng, text, BB, B.L)
    rev_np = np.ascontiguousarray(reads[:, ::-1])
    lens = jnp.asarray(np.full((BB,), B.L, dtype=np.int64))

    # args: NODE:GROUP pairs, e.g. "512:16 1024:16" (GROUP optional)
    for spec in (sys.argv[1:] or ["64:16"]):
        node, _, g = spec.partition(":")
        node, G = int(node), int(g or 16)
        arrays, meta, host = build_layered(dense, group=G, node=node)
        alphabet = tuple(sorted(set(host.index_chars) | {0}))
        planes = host.planes_for_alphabet(alphabet)
        rev = jax.device_put(jnp.asarray(host.rank_map(alphabet)[rev_np]))
        rp = int(arrays.fields.shape[0]) * G
        jax.block_until_ready(arrays.fields)

        def step():
            return fused_classify_kernel(arrays, rev, lens, 7, meta, "pml",
                                         rp, 150, planes)

        found, *_ = step()
        found = np.asarray(found)
        assert found[::2].mean() > 0.95 and found[1::2].mean() < 0.05, \
            (G, found[::2].mean(), found[1::2].mean())
        t0 = time.time()
        for _ in range(3):
            out = step()
        np.asarray(out[0])
        dt = (time.time() - t0) / 3
        print(f"node={node:4d} depth={meta.depth} G={G:3d} "
              f"rows={arrays.fields.shape[0]:7d} "
              f"width={arrays.fields.shape[1]:4d} "
              f"{BB/dt:,.0f} reads/s  ({dt*1e3:.1f} ms/batch)", flush=True)


if __name__ == "__main__":
    main()
