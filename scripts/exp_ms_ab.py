#!/usr/bin/env python
"""Interleaved A/B of the MS extension kernels on the real chip (VERDICT #3).

Measures, on the 5 Mbp bench index at B=65536 L=1024 (the ms bench config):
  scan      MS pointer scan alone (engine v2)
  diag      extension v2.1 (extend_pointers_diag, 64/256 B compare windows)
  diag2     extension v3.1 (extend_pointers_diag2, end compaction + aligned
            read rows after a peeled first step)
  e2e       scan + winner, fused in one dispatch

Interleaved A/B/A/B in one process, minima over rounds (cross-process
timings vary up to 3x on axon — PERF_NOTES round 2).

Run: python scripts/exp_ms_ab.py [--B 65536] [--reps 3]
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
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    B, L = args.B, args.L

    import jax
    import jax.numpy as jnp
    from spumoni_tpu.index.format import build_dense_index
    from spumoni_tpu.engine.layered import build_layered
    from spumoni_tpu.engine.scan_engine import (
        build_text_words, build_text_wide, extend_pointers_diag,
        extend_pointers_diag2, extend_pointers_sweep, query_batch_kernel_v2)

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
    rev_d = jax.device_put(jnp.asarray(host.rank_map(alphabet)[rev]))
    fwd_d = jax.device_put(jnp.asarray(reads))
    lens_d = jax.device_put(jnp.asarray(np.full((B,), L, np.int64)))
    _sync(lens_d)

    scan = jax.jit(lambda: query_batch_kernel_v2(
        arrays, rev_d, meta, "ms", False, planes)[0])
    ptrs = scan()
    _sync(ptrs)
    ptrs_fwd = jnp.asarray(np.asarray(ptrs)[:, ::-1])
    _sync(ptrs_fwd)

    diag = jax.jit(lambda p: extend_pointers_diag(
        tw, fwd_d, lens_d, p, nt, text_wide=twide))
    diag2 = jax.jit(lambda p: extend_pointers_diag2(tw, fwd_d, lens_d, p, nt))
    sweep = jax.jit(lambda p: extend_pointers_sweep(
        tw, fwd_d, lens_d, p, nt, twide))

    # exactness cross-check first (diag is the tested production kernel)
    a = np.asarray(diag(ptrs_fwd))
    for name, fn in (("diag2", diag2), ("sweep", sweep)):
        b = np.asarray(fn(ptrs_fwd))
        ok = np.array_equal(a, b)
        print(f"{name} == diag: {ok}", flush=True)
        if not ok:
            bad = np.argwhere(a != b)
            print(f"  mismatches: {len(bad)} first={bad[:4].tolist()}",
                  flush=True)

    variants = {"scan": lambda: scan(),
                "diag": lambda: diag(ptrs_fwd),
                "diag2": lambda: diag2(ptrs_fwd),
                "sweep": lambda: sweep(ptrs_fwd)}
    times = {k: [] for k in variants}
    for rnd in range(args.reps):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            _sync(fn())
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        t = min(ts)
        print(f"{k:6s}: {t:7.3f} s  {B/t:9.0f} reads/s", flush=True)
    t_scan = min(times["scan"])
    for name in ("diag", "diag2", "sweep"):
        te = min(times[name])
        print(f"e2e scan+{name:6s}: {B/(t_scan+te):9.0f} reads/s", flush=True)


if __name__ == "__main__":
    main()
