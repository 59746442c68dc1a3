#!/usr/bin/env python
"""Phase-level profile of the sweep extension (scripts/exp_ms_ab.py found
sweep = 3.05 s total at B=65536 L=1024): where does the time go, and does
replacing the read-side gather+butterfly with shifted SLICES (the phase-A
read window is contiguous: rpos0 = base*CH + iota) pay?

Variants (interleaved, minima):
  pA_gather   phase A as shipped (both sides gather+butterfly)
  pA_slide    phase A with read side = 64 shifted slices of the chunk bytes
  pA_textonly text-side gather+butterfly alone (floor)

Run: python scripts/exp_sweep_phase.py [--B 65536] [--CH 262144]
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
    ap.add_argument("--CH", type=int, default=262144)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    B, L, CH = args.B, args.L, args.CH

    import jax
    import jax.numpy as jnp
    from jax import lax
    from spumoni_tpu.index.format import build_dense_index
    from spumoni_tpu.engine.layered import build_layered
    from spumoni_tpu.engine.scan_engine import (
        _aligned_bytes64, _lcp_bytes, _rows17, build_text_words,
        query_batch_kernel_v2)

    raw, text, rng = bench.get_index()
    dense = build_dense_index(raw, text=text, with_samples=True)
    arrays, meta, host = build_layered(dense)
    nt = int(arrays.text.shape[0])
    tw = build_text_words(arrays.text, nt)

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

    dt = ptrs_fwd.dtype
    BL = B * L
    nch = BL // CH
    ROWS = (CH + L) // 64 + 3
    WS_WORDS = ROWS * 8 + 17
    i32 = jnp.int32

    def build_flat(reads_a, ptrs_a, lens_a):
        iota = jnp.arange(L, dtype=dt)[None, :]
        nxt = jnp.concatenate(
            [ptrs_a[:, 1:], jnp.full((B, 1), -(1 << 30), dt)], axis=1)
        in_read = iota < lens_a[:, None]
        ends = ((iota >= lens_a[:, None] - 1) | (nxt != ptrs_a + 1)
                | (ptrs_a <= 0)) & in_read
        gpad = (BL - CH) // 8 * 0 + WS_WORDS * 8
        rflat = jnp.concatenate(
            [reads_a.reshape(-1), jnp.zeros((gpad,), jnp.uint8)])
        gwords = lax.bitcast_convert_type(
            rflat[:(rflat.shape[0] // 8) * 8].reshape(-1, 8), jnp.uint64)
        return (rflat, gwords, ptrs_a.reshape(-1),
                (ends & (ptrs_a >= 0)).reshape(-1), lens_a.astype(dt))

    def phaseA(mode):
        def fn(reads_a, ptrs_a, lens_a):
            rflat, gwords, fp_all, fa_all, lens_i = build_flat(
                reads_a, ptrs_a, lens_a)

            def chunk_body(carry, xs):
                fp, fa, base = xs
                rpos0 = base * CH + jnp.arange(CH, dtype=dt)
                rrow = rpos0 // L
                limit = rrow * L + lens_i[jnp.clip(rrow, 0, B - 1)]
                kmax = jnp.minimum(jnp.minimum(limit - rpos0, nt - fp),
                                   64).astype(i32)
                if mode == "textonly":
                    tb = _aligned_bytes64(tw, fp)
                    k = jnp.clip(jnp.minimum(
                        _lcp_bytes(tb, tb), kmax), 0, 64)
                else:
                    tb = _aligned_bytes64(tw, fp)
                    if mode == "slide":
                        cb = lax.dynamic_slice(
                            rflat, ((base * CH).astype(i32),), (CH + 64,))
                        rb = jnp.stack(
                            [cb[j:j + CH] for j in range(64)], axis=1)
                    else:
                        ws = lax.dynamic_slice(
                            gwords, ((base * CH // 8).astype(i32),),
                            (WS_WORDS,))
                        rtab = _rows17(ws, ROWS)
                        rb = _aligned_bytes64(rtab, rpos0 - base * CH)
                    k = jnp.clip(jnp.minimum(
                        _lcp_bytes(tb, rb), kmax), 0, 64)
                l = jnp.where(fa, k, 0).astype(dt)
                surv = fa & (k == 64)
                return carry, (l, surv)

            _, (l_c, surv_c) = lax.scan(
                chunk_body, 0,
                (fp_all.reshape(nch, CH), fa_all.reshape(nch, CH),
                 jnp.arange(nch, dtype=dt)))
            return l_c.reshape(B, L), surv_c.reshape(B, L)
        return jax.jit(fn)

    fns = {"pA_gather": phaseA("gather"), "pA_slide": phaseA("slide"),
           "pA_textonly": phaseA("textonly")}
    outs = {}
    for k, f in fns.items():
        l, s = f(fwd_d, ptrs_fwd, lens_d)
        _sync(l)
        outs[k] = (np.asarray(l), np.asarray(s))
    print("slide == gather:",
          np.array_equal(outs["pA_gather"][0], outs["pA_slide"][0]),
          "surv:", np.array_equal(outs["pA_gather"][1], outs["pA_slide"][1]),
          "nsurv:", int(outs["pA_gather"][1].sum()), flush=True)

    times = {k: [] for k in fns}
    for _ in range(args.reps):
        for k, f in fns.items():
            t0 = time.perf_counter()
            l, s = f(fwd_d, ptrs_fwd, lens_d)
            _sync(l)
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        print(f"{k:12s}: {min(ts):6.3f} s", flush=True)


if __name__ == "__main__":
    main()
