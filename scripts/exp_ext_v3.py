#!/usr/bin/env python
"""MS extension v2 vs v3.1 on the real chip (bench index, B=64k, L=1024).

Run AFTER any code change to the extension kernels; keeps its own deadline
so it exits between RPCs instead of being SIGKILLed mid-RPC (which wedges
the axon tunnel for ~30 min — PERF_NOTES round 2)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

DEADLINE = time.time() + float(os.environ.get("EXP_BUDGET_S", "900"))

import bench
import jax, jax.numpy as jnp
from spumoni_tpu.index.format import build_dense_index
from spumoni_tpu.engine.layered import build_layered
from spumoni_tpu.engine.scan_engine import (build_text_words,
    extend_pointers_diag, extend_pointers_diag2, query_batch_kernel_v2)

raw, text, rng = bench.get_index()
B_ms, L = 65536, 1024
dense = build_dense_index(raw, text=text, with_samples=True)
arrays, meta, host = build_layered(dense)
nt = int(arrays.text.shape[0])
tw = build_text_words(arrays.text, nt)
reads = bench.make_reads(rng, text, B_ms, L)
rev = np.ascontiguousarray(reads[:, ::-1])
alphabet = tuple(sorted(set(host.index_chars) | {0}))
planes = host.planes_for_alphabet(alphabet)
rev_d = jax.device_put(jnp.asarray(host.rank_map(alphabet)[rev]))
fwd_d = jax.device_put(jnp.asarray(reads))
lens_d = jax.device_put(jnp.asarray(np.full((B_ms,), L, np.int32)))
print("setup done", flush=True)

ptrs, _, _ = query_batch_kernel_v2(arrays, rev_d, meta, "ms", False, planes)
ptrs_f = jnp.flip(ptrs, axis=1)
np.asarray(ptrs_f[:1])
print("scan done", flush=True)

def timeit(name, fn, reps=3):
    out = fn(); np.asarray(out[:1])
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    np.asarray(out[:1])
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1e3:.0f} ms  -> ext-only {B_ms/dt/1e3:.1f}k reads/s",
          flush=True)
    return out

a = timeit("v2  (chunk=16384)   ", lambda: extend_pointers_diag(
    tw, fwd_d, lens_d, ptrs_f, nt))
for seg, ch in ((131072, 16384), (131072, 32768), (262144, 32768)):
    if time.time() > DEADLINE - 200:
        print("budget exhausted, exiting cleanly", flush=True)
        break
    b = timeit(f"v3.1 seg={seg//1024}k ch={ch//1024}k", lambda: extend_pointers_diag2(
        tw, fwd_d, lens_d, ptrs_f, nt, seg_positions=seg, chunk_lanes=ch))
    print("  equal to v2:", bool(jnp.array_equal(a, b)), flush=True)

from spumoni_tpu.engine.scan_engine import build_text_wide
twide = jax.device_put(build_text_wide(arrays.text, nt))
h = timeit("v2h hybrid 64->256  ", lambda: extend_pointers_diag(
    tw, fwd_d, lens_d, ptrs_f, nt, text_wide=twide))
print("  equal to v2:", bool(jnp.array_equal(a, h)), flush=True)
for ch in (8192, 32768, 65536):
    if time.time() > DEADLINE - 200:
        break
    h2 = timeit(f"v2h hybrid ch={ch//1024}k  ", lambda: extend_pointers_diag(
        tw, fwd_d, lens_d, ptrs_f, nt, chunk_lanes=ch, text_wide=twide))
    print("  equal to v2:", bool(jnp.array_equal(a, h2)), flush=True)
