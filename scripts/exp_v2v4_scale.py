#!/usr/bin/env python
"""Interleaved A/B of the FULL fused-classify kernels, engine v2 (layered)
vs engine v4 (block-bits), on the 2.1 Gbp / r~1.5e8 scale index.

Round-2 VERDICT (weak #7): the claim that over-cliff v4 still halves v2's
step rested on an isolated gather microbenchmark (exp_vmem_gather2.py), not
an interleaved A/B of the production kernels at genome scale. This measures
exactly that: same reads, same chip session, alternating reps.

HBM: v2 PML-only fields (r~1.5e8 x 4 slots x i32 ~ 2.4 GB) + levels
(~0.8 GB) + v4 rows (1.64 GB) coexist under 16 GB.

Run (needs the scale cache from scripts/build_scale.py):
    python scripts/exp_v2v4_scale.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (SCALE_CACHE, _device_put_chunked)


def main():
    import jax
    import jax.numpy as jnp
    import spumoni_tpu  # noqa: F401
    from spumoni_tpu.engine.blockbits import BitArrays, BitMeta
    from spumoni_tpu.engine.layered import build_layered
    from spumoni_tpu.engine.occblock import OccHost
    from spumoni_tpu.index.format import build_dense_index
    from spumoni_tpu.native import RawIndex
    from spumoni_tpu.parallel.mesh import fused_classify_kernel

    B, L = 131072, 1024
    bin_width, thr = 150, 7

    t0 = time.time()
    d = np.load(os.path.join(bench.SCALE_CACHE, "raw.npz"))
    raw = RawIndex(int(d["n"]), d["run_heads"], d["run_starts"],
                   d["thresholds"], d["samples_start"], d["samples_last"])
    dense = build_dense_index(raw)          # PML-only: no text, no samples
    print(f"dense built ({time.time()-t0:.0f} s)", flush=True)

    # --- v2 (layered) ---
    a2, m2, h2 = build_layered(dense)
    print(f"v2 layered resident ({time.time()-t0:.0f} s)", flush=True)

    # --- v4 (block-bits, prebuilt rows) ---
    bb = np.load(os.path.join(bench.SCALE_CACHE, "bb.npz"))
    P, width, sigma, pack, term_pos, term_code, F_term = (
        int(x) for x in bb["meta"])
    m4 = BitMeta(P=P, width=width, sigma=sigma, pack=pack, dtype="int32",
                 term_pos=term_pos, term_code=term_code, F_term=F_term)
    a4 = BitArrays(
        bblocks=bench._device_put_chunked(bb["bblocks"]),
        n=jnp.asarray(bb["n"]),
        last_run_sample=jnp.asarray(bb["last_run_sample"]),
        last_run_edoc=jnp.asarray(bb["last_run_edoc"]),
        first_run_sdoc=jnp.asarray(bb["first_run_sdoc"]))
    h4 = OccHost(F_all=bb["F_all"], cnt_all=bb["cnt_all"], rmap=bb["rmap"],
                 F_sigma=bb["F_sigma"], Fnext_sigma=bb["Fnext_sigma"],
                 index_chars=tuple(int(c) for c in bb["index_chars"]))
    print(f"v4 rows resident ({time.time()-t0:.0f} s)", flush=True)

    reads = np.load(os.path.join(bench.SCALE_CACHE, "reads.npz"))["reads"]
    rev = np.ascontiguousarray(reads[:, ::-1])
    lens = jax.device_put(jnp.asarray(np.full((B,), L, np.int64)))

    alpha2 = tuple(sorted(set(h2.index_chars) | {0, 65, 67, 71, 84}))
    pl2 = h2.planes_for_alphabet(alpha2)
    rev2 = jax.device_put(jnp.asarray(h2.rank_map(alpha2)[rev]))

    alpha4 = tuple(sorted({0, 65, 67, 71, 84}))
    pl4 = h4.planes_for_alphabet(alpha4)
    rev4 = jax.device_put(jnp.asarray(h4.rank_map(alpha4)[rev]))

    # shape only — np.asarray would d2h-copy the multi-GB fields table
    # through the tunnel (the exact hang utils.device_put_chunked guards
    # against). No * m2.group: production passes fields.shape[0]
    # (scan_engine.py) and the layered step ignores r anyway.
    rp2 = int(a2.fields.shape[0])
    rp4 = int(a4.bblocks.shape[0])

    def step2():
        return fused_classify_kernel(a2, rev2, lens, thr, m2, "pml",
                                     rp2, bin_width, pl2)

    def step4():
        return fused_classify_kernel(a4, rev4, lens.astype(jnp.int32), thr,
                                     m4, "pml", rp4, bin_width, pl4)

    f2 = np.asarray(step2()[0])
    print(f"v2 compiled+warm ({time.time()-t0:.0f} s)", flush=True)
    f4 = np.asarray(step4()[0])
    print(f"v4 compiled+warm ({time.time()-t0:.0f} s)", flush=True)
    assert (f2 == f4).all(), "v2/v4 verdicts disagree"
    assert f2[::2].mean() > 0.95 and f2[1::2].mean() < 0.05

    t_v2, t_v4 = [], []
    for rep in range(3):                     # interleaved
        t = time.time(); np.asarray(step2()[0]); t_v2.append(time.time() - t)
        t = time.time(); np.asarray(step4()[0]); t_v4.append(time.time() - t)
    b2, b4 = min(t_v2), min(t_v4)
    print(f"v2 layered : {b2:.3f} s -> {B/b2:,.0f} reads/s "
          f"({b2/L/B*1e9:.2f} ns/lane/step)")
    print(f"v4 blockbit: {b4:.3f} s -> {B/b4:,.0f} reads/s "
          f"({b4/L/B*1e9:.2f} ns/lane/step)")
    print(f"v4/v2 speedup: {b2/b4:.2f}x")


if __name__ == "__main__":
    main()
