#!/usr/bin/env python
"""Stage-by-stage profile of the report-only e2e path (VERDICT r3 missing #1:
file->report runs at ~13k reads/s while the classify kernel does ~258k).

Times each host stage of pipeline.run's hot loop in isolation on the 5 Mbp
bench workload (65536 x 1024 bp reads from a FASTA file):

  parse      iter_query_reads drain (Python FASTA reader)
  prep       per-read upper + list building (pipeline.prepare equivalent)
  digest     per-read minimizer digestion (the digested-mode prep)
  encode     encode_rows + present_chars + rank_map (host matrix prep)
  h2d        device_put of the [B, L] rank-mapped batch
  kernel     fused_classify_kernel steady state
  report     report_line formatting + file write for all reads

NOTE: run while the host is otherwise idle — absolute numbers matter.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    import jax
    import jax.numpy as jnp
    from spumoni_tpu.engine.blockbits import build_blockbits
    from spumoni_tpu.index.format import build_dense_index
    from spumoni_tpu.io.fasta import iter_query_reads
    from spumoni_tpu.io.minimizers import digest_promotion
    from spumoni_tpu.parallel.mesh import fused_classify_kernel
    from spumoni_tpu.utils import encode_rows, present_chars
    from spumoni_tpu.classify.report import report_header, report_line

    n_reads, L = 65536, 1024
    raw, text, rng = bench.get_index()
    reads_mat = bench.make_reads(rng, text, n_reads, L)
    reads_path = "/tmp/e2e_prof_reads.fa"
    if not os.path.exists(reads_path):
        with open(reads_path, "w") as f:
            for i in range(n_reads):
                f.write(f">r{i}\n{reads_mat[i].tobytes().decode()}\n")

    res = {}

    t0 = time.time()
    ids, reads = [], []
    for rid, seq in iter_query_reads(reads_path):
        ids.append(rid)
        reads.append(seq)
    res["parse"] = time.time() - t0

    t0 = time.time()
    out = []
    for s in reads:
        out.append(s.upper())
    res["prep(upper)"] = time.time() - t0

    t0 = time.time()
    dig = [digest_promotion(s) for s in reads[:8192]]
    res["digest(8k reads, x8 for full)"] = time.time() - t0

    t0 = time.time()
    dense = build_dense_index(raw)
    arrays, meta, host = build_blockbits(dense)
    print(f"[setup] index on device ({time.time()-t0:.1f} s)", flush=True)

    t0 = time.time()
    fwd, rev, lens = encode_rows(out, n_reads, L)
    res["encode_rows"] = time.time() - t0
    t0 = time.time()
    alphabet = tuple(sorted({0} | set(int(x) for x in present_chars(rev))))
    planes = host.planes_for_alphabet(alphabet)
    revm = host.rank_map(alphabet)[rev]
    res["rank_map"] = time.time() - t0

    t0 = time.time()
    rev_d = jax.device_put(jnp.asarray(revm))
    lens_d = jax.device_put(jnp.asarray(lens))
    np.asarray(rev_d[:1, :1]); np.asarray(lens_d[:1])
    res["h2d(64MB)"] = time.time() - t0

    bin_width, thr = 150, 7
    rp = int(arrays.bblocks.shape[0])

    def step(rd, ld):
        return fused_classify_kernel(arrays, rd, ld, thr, meta, "pml",
                                     rp, bin_width, planes)

    f, a, b, s = step(rev_d, lens_d)
    np.asarray(f)
    t0 = time.time()
    f, a, b, s = step(rev_d, lens_d)
    f, a, b, s = (np.asarray(f), np.asarray(a), np.asarray(b), np.asarray(s))
    res["kernel(B=65536)"] = time.time() - t0

    t0 = time.time()
    with open("/tmp/e2e_prof.report", "w") as fo:
        fo.write(report_header(thr))
        for i, rid in enumerate(ids):
            nbins = int(a[i] + b[i])
            status = "FOUND" if f[i] else "NOT_PRESENT"
            fo.write(report_line(rid, status, s[i] / max(nbins, 1),
                                 int(a[i]), int(b[i])))
    res["report_write"] = time.time() - t0

    print(f"\n{n_reads} reads x {L} bp:")
    for k, v in res.items():
        print(f"  {k:<34s} {v:8.3f} s   ({n_reads/max(v,1e-9):>12,.0f} reads/s)")


if __name__ == "__main__":
    main()
