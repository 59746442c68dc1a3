#!/usr/bin/env python
"""Product-path serving at 2.1 Gbp: build a product-form PML index from the
scale bench cache (dense npz + null DB), then measure pipeline.run
wall-including-setup twice — the first run materializes the dense index and
writes the engine-row cache; the second takes the FAST START (bbrows
manifest, no dense load). The VERDICT r4 #5 measurement at the scale the
cache supports (GRCh38's 23 GB dense npz is the extreme case; the 2.1 Gbp
index's is ~9 GB)."""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CACHE = os.path.join(os.path.expanduser("~"), ".cache", "spumoni_tpu",
                     "bench", "scale")
PROD = os.path.join(os.path.expanduser("~"), ".cache", "spumoni_tpu",
                    "bench", "scale_product")
N_READS = 16384


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def assets():
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from spumoni_tpu.native import RawIndex
    from spumoni_tpu.index.format import build_dense_index, save_dense_index
    from spumoni_tpu.index.null_db import EmpNullDatabase

    os.makedirs(PROD, exist_ok=True)
    prefix = os.path.join(PROD, "idx")
    index_path = prefix + ".fa.thrbv.spumoni"
    if not os.path.exists(index_path + ".npz"):
        t0 = time.time()
        d = np.load(os.path.join(CACHE, "raw.npz"))
        raw = RawIndex(int(d["n"]), d["run_heads"], d["run_starts"],
                       d["thresholds"], d["samples_start"],
                       d["samples_last"])
        dense = build_dense_index(raw)
        log(f"dense built ({time.time()-t0:.0f} s)")
        save_dense_index(dense, index_path)
        log(f"dense index saved ({time.time()-t0:.0f} s)")
        # empirical null DB: PML values of reversed random reads against
        # this index via the native engine (the real product recipe runs
        # through build(); here the nulls are equivalent random draws)
        from spumoni_tpu.native import NativeQueryEngine
        eng = NativeQueryEngine(raw.n, raw.run_heads, raw.run_starts,
                                raw.thresholds, raw.samples_start,
                                raw.samples_last)
        rng = np.random.default_rng(3)
        acgt = np.frombuffer(b"ACGT", np.uint8)
        nulls = [rng.choice(acgt, size=150).tobytes() for _ in range(100)]
        vals = eng.query_pml(nulls, threads=os.cpu_count() or 1)
        ndb = EmpNullDatabase(np.concatenate(vals))
        ndb.ks_stat_threshold = 0.1
        ndb.save(prefix + ".fa.pmlnulldb")
        log("null db saved")
    reads_fa = os.path.join(PROD, "reads.fa")
    if not os.path.exists(reads_fa):
        reads = np.load(os.path.join(CACHE, "reads.npz"))["reads"][:N_READS]
        with open(reads_fa, "w") as f:
            for i in range(len(reads)):
                f.write(f">r{i}\n{reads[i].tobytes().decode()}\n")
        log(f"{len(reads)} reads written")


def serve():
    import subprocess
    results = {}
    for label in ("cold_dense", "fast_start"):
        code = f"""
import os, sys, time
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import spumoni_tpu
from spumoni_tpu.pipeline import RunConfig, run, LAST_RUN_STATS
t0 = time.time()
n = run(RunConfig(ref_file={os.path.join(PROD, "idx")!r},
                  pattern_file={os.path.join(PROD, "reads.fa")!r},
                  pml_requested=True, min_digest=False, write_report=True,
                  report_only=True))
wall = time.time() - t0
import json
print(json.dumps({{"label": {label!r}, "wall_s": wall,
                   "wall_reads_per_s": n / wall,
                   "stream_reads_per_s": n / LAST_RUN_STATS["stream_s"]}}))
"""
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True)
        sys.stderr.write(out.stderr[-2000:])
        line = out.stdout.strip().splitlines()[-1]
        print(line, flush=True)
        results[label] = json.loads(line)
    with open(os.path.join(PROD, "serve_result.json"), "w") as f:
        json.dump(results, f)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["assets", "serve"])
    if ap.parse_args().cmd == "assets":
        assets()
    else:
        serve()
