#!/usr/bin/env python
"""Per-stage timing of the STAGED report-only path on the real chip:
parse -> upper -> stage(pack+rank+h2d) -> classify_staged -> write."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    from spumoni_tpu.engine.blockbits import build_blockbits
    from spumoni_tpu.engine.scan_engine import ScanEngine
    from spumoni_tpu.index.format import build_dense_index
    from spumoni_tpu.io.fastx_batch import iter_packed_batches, upper_packed

    n_reads, L = 65536, 1024
    raw, text, rng = bench.get_index()
    reads_path = "/tmp/e2e_prof_reads.fa"
    if not os.path.exists(reads_path):
        reads_mat = bench.make_reads(rng, text, n_reads, L)
        with open(reads_path, "w") as f:
            for i in range(n_reads):
                f.write(f">r{i}\n{reads_mat[i].tobytes().decode()}\n")

    dense = build_dense_index(raw)
    arrays, meta, host = build_blockbits(dense)
    eng = ScanEngine(arrays, meta, mode="pml", host=host)

    batch_bases = int(os.environ.get("BB", 16_000_000))
    t = {"parse": 0.0, "upper": 0.0, "stage": 0.0, "kernel": 0.0,
         "fetch": 0.0}
    for rep in range(2):          # rep 0 warms the compile cache
        for k in t:
            t[k] = 0.0
        t0 = time.time()
        it = iter_packed_batches(reads_path, batch_bases)
        while True:
            s = time.time()
            try:
                pk = next(it)
            except StopIteration:
                break
            t["parse"] += time.time() - s
            s = time.time()
            pk = upper_packed(pk)
            t["upper"] += time.time() - s
            s = time.time()
            staged = eng.stage(pk)
            t["stage"] += time.time() - s
            s = time.time()
            out = eng.classify_staged(staged, 150, 7)
            t["kernel"] += time.time() - s
        total = time.time() - t0
        print(f"rep {rep}: total {total:.2f}s -> "
              f"{n_reads / total:,.0f} reads/s")
        for k, v in t.items():
            print(f"  {k:<8s} {v:6.2f}s")


if __name__ == "__main__":
    main()
