#!/usr/bin/env python
"""n >= 2^31 on-chip proof (VERDICT r2 #2): run the 2.25 Gbp (15 x 150 Mbp)
index — n = 2,250,000,001 > 2^31 — through engine v4-wide: int64 lane
positions over int32 split-checkpoint rows (40-bit addressing, the
reference's SSABYTES=5 limit). Classified on device with the fused kernel;
separation asserted; reads/s + HBM footprint reported.

Prereq: scripts/build_scale.py --strains 15 --out ~/.cache/spumoni_tpu/bench/scale_wide
Run:    python scripts/run_wide_proof.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CACHE = os.path.join(os.path.expanduser("~"), ".cache", "spumoni_tpu",
                     "bench", "scale_wide")
B, L = 131072, 1024


def main():
    import jax
    import jax.numpy as jnp
    import spumoni_tpu  # noqa: F401
    from spumoni_tpu.engine.blockbits import BitArrays, BitMeta
    from spumoni_tpu.engine.occblock import OccHost
    from spumoni_tpu.parallel.mesh import fused_classify_kernel
    from spumoni_tpu.utils import device_put_chunked

    d = np.load(os.path.join(CACHE, "bb.npz"))
    P, width, sigma, pack, term_pos, term_code, F_term = (
        int(x) for x in d["meta"])
    n = int(d["n"])
    wide = n >= 2**31
    assert wide and n == 2_250_000_001, n
    meta = BitMeta(P=P, width=width, sigma=sigma, pack=pack,
                   dtype="int64" if wide else "int32", term_pos=term_pos,
                   term_code=term_code, F_term=F_term, wide=wide)
    print(f"n={n} (> 2^31 by {n - 2**31:,}) rows={d['bblocks'].shape} "
          f"P={P} width={width} wide={wide}", flush=True)
    t0 = time.time()
    arrays = BitArrays(
        bblocks=device_put_chunked(d["bblocks"]),
        n=jnp.asarray(np.int64(n)),
        last_run_sample=jnp.asarray(d["last_run_sample"].astype(np.int64)),
        last_run_edoc=jnp.asarray(d["last_run_edoc"].astype(np.int64)),
        first_run_sdoc=jnp.asarray(d["first_run_sdoc"].astype(np.int64)))
    hbm_gb = d["bblocks"].nbytes / 1e9
    print(f"h2d done: {hbm_gb:.2f} GB rows in {time.time()-t0:.0f} s",
          flush=True)
    host = OccHost(F_all=d["F_all"], cnt_all=d["cnt_all"], rmap=d["rmap"],
                   F_sigma=d["F_sigma"], Fnext_sigma=d["Fnext_sigma"],
                   index_chars=tuple(int(c) for c in d["index_chars"]))

    reads = np.load(os.path.join(CACHE, "reads.npz"))["reads"]
    rev = np.ascontiguousarray(reads[:, ::-1])
    alphabet = tuple(sorted({0} | set(int(x) for x in np.unique(rev))))
    planes = host.planes_for_alphabet(alphabet)
    print(f"planes: {len(planes)} (40-bit F/Fnext need 5)", flush=True)
    rev = host.rank_map(alphabet)[rev]
    lens = np.full((B,), L, dtype=np.int64)
    rp = int(arrays.bblocks.shape[0])

    def step(rev_d, lens_d):
        return fused_classify_kernel(arrays, rev_d, lens_d, 7, meta, "pml",
                                     rp, 150, planes)

    rev_d = device_put_chunked(rev)
    lens_d = jax.device_put(jnp.asarray(lens))
    np.asarray(lens_d[:1])
    t1 = time.time()
    found, above, below, _ = step(rev_d, lens_d)
    found = np.asarray(found)
    print(f"first step done ({time.time()-t1:.0f} s) "
          f"pos={found[::2].mean():.4f} neg={found[1::2].mean():.4f}",
          flush=True)
    assert found[::2].mean() > 0.95 and found[1::2].mean() < 0.05

    reps, t0 = 3, time.time()
    for _ in range(reps):
        found, above, below, _ = step(rev_d, lens_d)
    np.asarray(found)
    dt = (time.time() - t0) / reps
    print(f"WIDE PROOF OK: {B/dt:,.0f} reads/s (1024 bp PML classify, "
          f"n={n:,} > 2^31, {hbm_gb:.2f} GB HBM rows)", flush=True)


if __name__ == "__main__":
    main()
