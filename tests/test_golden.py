"""Golden regression outputs.

The reference binary cannot be built in this environment (its thirdparty
sources are fetched at configure time), so byte-level behavior is pinned
against committed golden files generated from a fixed-seed corpus: any
unintended change to null-read sampling (glibc rand), index construction,
the MS/PML recurrence, classification or report formatting shows up as a
golden diff.

Regenerate intentionally with:  python tests/test_golden.py --regen
"""

import json
import os
import shutil
import sys

import numpy as np

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

PINNED = [
    "reads.fa.pseudo_lengths",
    "reads.fa.lengths",
    "reads.fa.pointers",
    "reads.fa.report",
    "spumoni_null_reads.fa",
]


def _generate(workdir: str):
    from spumoni_tpu.pipeline import BuildConfig, RunConfig, build, run

    rng = np.random.default_rng(20260817)
    acgt = "ACGT"
    genome = "".join(acgt[i] for i in rng.integers(0, 4, size=25000))
    genome_path = os.path.join(workdir, "genome.fa")
    with open(genome_path, "w") as f:
        f.write(">chrG golden contig\n")
        for i in range(0, len(genome), 70):
            f.write(genome[i:i + 70] + "\n")
    reads_path = os.path.join(workdir, "reads.fa")
    with open(reads_path, "w") as f:
        for i in range(5):
            st = int(rng.integers(0, len(genome) - 400))
            rd = list(genome[st:st + 400])
            for k in range(len(rd)):
                if rng.random() < 0.08:
                    rd[k] = acgt[int(rng.integers(4))]
            f.write(f">pos_{i} simulated\n{''.join(rd)}\n")
        for i in range(5):
            rd = "".join(acgt[j] for j in rng.integers(0, 4, size=400))
            f.write(f">neg_{i}\n{rd}\n")
        f.write(">with_n\n" + "N" * 30 + genome[100:300] + "\n")

    prefix = os.path.join(workdir, "idx")
    build(BuildConfig(ref_file=genome_path, output_prefix=prefix,
                      pml_index=True, ms_index=True, use_minimizers=False))
    run(RunConfig(ref_file=prefix, pattern_file=reads_path,
                  pml_requested=True, min_digest=False, write_report=True,
                  device="cpu"))
    run(RunConfig(ref_file=prefix, pattern_file=reads_path,
                  ms_requested=True, min_digest=False, device="cpu"))
    return workdir


def test_golden_outputs(tmp_path):
    wd = _generate(str(tmp_path))
    for name in PINNED:
        got = open(os.path.join(wd, name), "rb").read()
        want = open(os.path.join(GOLDEN, name), "rb").read()
        assert got == want, f"golden mismatch: {name}"
    # null-db summary values
    with open(os.path.join(wd, "idx.fa.pmlnulldb.json")) as f:
        got_db = json.load(f)
    with open(os.path.join(GOLDEN, "idx.fa.pmlnulldb.json")) as f:
        want_db = json.load(f)
    assert got_db == want_db


if __name__ == "__main__" and "--regen" in sys.argv:
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.makedirs(GOLDEN, exist_ok=True)
    with tempfile.TemporaryDirectory() as wd:
        _generate(wd)
        for name in PINNED + ["idx.fa.pmlnulldb.json"]:
            shutil.copy(os.path.join(wd, name), os.path.join(GOLDEN, name))
    print(f"regenerated goldens in {GOLDEN}")
