#!/usr/bin/env python
"""MS mode (-M, pointers + extended lengths) at human-genome scale.

The small-index ms config measures vs_baseline 0.74x because a 5 Mbp index
is cache-resident on the CPU; BASELINE.md pins targets to human-genome
indexes where every CPU rank probe and extension byte-compare misses
DRAM. This runs the full MS path (v2 layered scan + sweep extension with
the 64 B phase-B fallback — the 256 B text table would not fit HBM next to
the genome-scale index) on the 2.1 Gbp / r=1.9e8 scale index, plus the
32-thread-extrapolated CPU counterpart on the same index.

Prereq: scripts/build_scale.py cache (raw.npz + reads.npz).
Run:    python scripts/exp_ms_scale.py [--B 16384] [--skip-cpu]
"""
import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

CACHE = os.path.join(os.path.expanduser("~"), ".cache", "spumoni_tpu",
                     "bench", "scale")
STRAINS, MBP, DIV = 14, 150, 0.002
L = 1024


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _gen_text():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from build_scale import gen_text
    return gen_text(STRAINS, MBP * 1_000_000, DIV, np.random.default_rng(0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--skip-cpu", action="store_true")
    args = ap.parse_args()
    B = args.B

    import jax
    import jax.numpy as jnp
    import spumoni_tpu  # noqa: F401
    from spumoni_tpu.native import RawIndex
    from spumoni_tpu.index.format import build_dense_index
    from spumoni_tpu.engine.layered import build_layered
    from spumoni_tpu.engine.scan_engine import (
        extend_pointers_sweep, query_batch_kernel_v2)

    from spumoni_tpu.utils import device_put_chunked

    d = np.load(os.path.join(CACHE, "raw.npz"))
    raw = RawIndex(int(d["n"]), d["run_heads"], d["run_starts"],
                   d["thresholds"], d["samples_start"], d["samples_last"])
    log(f"raw loaded: n={raw.n} r={raw.r}")
    text = _gen_text()
    log("text regenerated")
    # dense WITHOUT text: the 2.1 Gbp text never goes to device — slice ops
    # on >= 2^31-element arrays fail XLA's x64 index rewrite, and only the
    # [rows, 17]-word text_words table (element count n*17/64 < 2^31) is
    # needed by the scan+sweep path
    dense = build_dense_index(raw, with_samples=True)
    log("dense built")
    t0 = time.time()
    arrays, meta, host = build_layered(dense)
    log(f"layered built + h2d ({time.time()-t0:.0f} s); fields "
        f"{arrays.fields.shape} ({arrays.fields.nbytes/1e9:.2f} GB)")

    # text_words assembled HOST-side (numpy views), uploaded chunked
    t0 = time.time()
    nt = int(raw.n)
    rows = -(-nt // 64)
    pad = rows * 64 + 136 - len(text)
    t_ = np.concatenate([text, np.zeros(max(pad, 0), np.uint8)])
    words = t_[:(len(t_) // 8) * 8].view(np.uint64)
    tw_host = np.concatenate(
        [words[:rows * 8].reshape(rows, 8),
         words[8:rows * 8 + 8].reshape(rows, 8),
         words[16::8][:rows, None]], axis=1)
    tw = device_put_chunked(tw_host)
    del tw_host
    log(f"text_words host-built + h2d: {tw.shape} "
        f"({tw.nbytes/1e9:.2f} GB, {time.time()-t0:.0f} s)")

    reads = np.load(os.path.join(CACHE, "reads.npz"))["reads"][:B]
    rev = np.ascontiguousarray(reads[:, ::-1])
    alphabet = tuple(sorted(set(host.index_chars) | {0}))
    planes = host.planes_for_alphabet(alphabet)
    rev_d = jax.device_put(jnp.asarray(host.rank_map(alphabet)[rev]))
    fwd_d = jax.device_put(jnp.asarray(reads))
    lens_d = jnp.asarray(np.full((B,), L, np.int64))
    np.asarray(lens_d[:1])

    scan = jax.jit(lambda: query_batch_kernel_v2(
        arrays, rev_d, meta, "ms", False, planes)[0])
    t0 = time.time()
    ptrs = scan()
    ptrs_np = np.asarray(ptrs)
    log(f"scan compiled+run ({time.time()-t0:.0f} s)")
    ptrs_fwd = jnp.asarray(ptrs_np[:, ::-1])
    ext = jax.jit(lambda p: extend_pointers_sweep(
        tw, fwd_d, lens_d, p, nt, None))       # 64 B phase-B fallback
    t0 = time.time()
    lens_mat = np.asarray(ext(ptrs_fwd))
    log(f"ext compiled+run ({time.time()-t0:.0f} s)")

    # exactness spot-check vs the native oracle on a few reads
    if not args.skip_cpu:
        from spumoni_tpu.native import NativeQueryEngine
        eng = NativeQueryEngine(raw.n, raw.run_heads, raw.run_starts,
                                raw.thresholds, raw.samples_start,
                                raw.samples_last, text=text)
        some = [0, 1, 2, 3, B // 2, B - 1]
        op, ol = eng.query_ms([reads[i].tobytes() for i in some])
        for j, i in enumerate(some):
            assert np.array_equal(ptrs_np[i][::-1], op[j]), f"ptrs {i}"
            assert np.array_equal(lens_mat[i], ol[j]), f"lens {i}"
        log("exactness OK vs native oracle")

    ts, te = [], []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        p = scan()
        np.asarray(p.reshape(-1)[:8])
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        lm = ext(ptrs_fwd)
        np.asarray(lm.reshape(-1)[:8])
        te.append(time.perf_counter() - t0)
    t_scan, t_ext = min(ts), min(te)
    log(f"scan {t_scan:.2f} s ({B/t_scan:.0f} r/s); "
        f"ext {t_ext:.2f} s ({B/t_ext:.0f} r/s); "
        f"MS e2e {B/(t_scan+t_ext):.0f} reads/s")

    if args.skip_cpu:
        return
    # CPU counterpart in a clean subprocess (no axon runtime)
    n_cpu = 32
    code = f"""
import os, sys, time
import numpy as np
sys.path.insert(0, {REPO!r})
sys.path.insert(0, {os.path.join(REPO, 'scripts')!r})
from build_scale import gen_text
from spumoni_tpu.native import NativeQueryEngine
d = np.load(os.path.join({CACHE!r}, "raw.npz"))
text = gen_text({STRAINS}, {MBP}*1_000_000, {DIV}, np.random.default_rng(0))
eng = NativeQueryEngine(int(d["n"]), d["run_heads"], d["run_starts"],
                        d["thresholds"], d["samples_start"],
                        d["samples_last"], text=text)
reads = [r.tobytes() for r in
         np.load(os.path.join({CACHE!r}, "reads.npz"))["reads"][:{n_cpu}]]
threads = os.cpu_count() or 1
eng.query_ms(reads[:2], threads=threads)
t0 = time.time()
eng.query_ms(reads, threads=threads)
print(len(reads) / (time.time() - t0) / threads)
"""
    out = subprocess.run([sys.executable, "-c", code], check=True,
                         capture_output=True, text=True,
                         env=dict(os.environ, JAX_PLATFORMS="cpu"))
    per_thread = float(out.stdout.strip().splitlines()[-1])
    cpu32 = per_thread * 32
    tpu = B / (t_scan + t_ext)
    log(f"CPU: {per_thread:.1f} r/s/thread -> 32-thread extrap "
        f"{cpu32:.0f} r/s; vs_baseline {tpu/cpu32:.3f}x")


if __name__ == "__main__":
    main()
