"""CLI flag wiring + validation error behavior (mirrors the reference's
option validation, spumoni_main.hpp:161-230,267-329)."""

import numpy as np
import pytest

from spumoni_tpu.cli import main, _build_parser
from spumoni_tpu.pipeline import BuildConfig, RunConfig

from test_pipeline import _parse_values_file, _write_genome, _write_reads


def test_build_flags_parse():
    p = _build_parser()
    a = p.parse_args(["build", "-r", "x.fa", "-P", "-M", "-n", "-o", "pre",
                      "-d", "-w", "200", "-k"])
    assert a.pml_index and a.ms_index and not a.use_minimizers
    assert a.build_doc and a.bin_size == 200 and a.keep_files
    a = p.parse_args(["build", "-i", "list.txt", "-P", "-m", "-o", "pre",
                      "-K", "3", "-W", "9"])
    assert a.use_promotions and a.k == 3 and a.w == 9 and a.use_minimizers


def test_run_flags_parse():
    p = _build_parser()
    a = p.parse_args(["run", "-r", "pre", "-p", "reads.fa", "-P", "-c", "-n",
                      "-t", "4", "--device", "cpu"])
    assert a.pml_requested and a.write_report and not a.min_digest
    assert a.threads == 4 and a.device == "cpu"


@pytest.mark.parametrize("kwargs,msg", [
    (dict(pml_index=True), "output prefix"),
    (dict(output_prefix="x"), "index type"),
    (dict(output_prefix="x", pml_index=True), "minimizer type"),
    (dict(output_prefix="x", pml_index=True, use_promotions=True,
          use_dna_letters=True), "one minimizer type"),
    (dict(output_prefix="x", pml_index=True, use_minimizers=False,
          bin_size=20), "bin size"),
    (dict(output_prefix="x", pml_index=True, use_promotions=True, k=5),
     "small window"),
])
def test_build_validation_errors(tmp_path, kwargs, msg):
    ref = tmp_path / "g.fa"
    ref.write_text(">a\nACGT\n")
    cfg = BuildConfig(ref_file=str(ref), **kwargs)
    with pytest.raises((ValueError, FileNotFoundError)) as e:
        cfg.validate()
    assert msg in str(e.value)


def test_run_validation_errors(tmp_path):
    reads = tmp_path / "r.fa"
    reads.write_text(">a\nACGT\n")
    with pytest.raises(ValueError):
        RunConfig(ref_file="x", pattern_file=str(reads),
                  ms_requested=True, pml_requested=True).validate()
    with pytest.raises(ValueError):
        RunConfig(ref_file="x", pattern_file=str(reads)).validate()


def test_cli_end_to_end(tmp_path, rng):
    genome_path = str(tmp_path / "genome.fa")
    seqs = _write_genome(genome_path, rng, contigs=(("c1", 8000),))
    genome = "".join(seqs.values())
    reads_path = str(tmp_path / "reads.fa")
    _write_reads(reads_path, rng, genome, n_pos=3, n_neg=3, m=300)

    rc = main(["build", "-r", genome_path, "-P", "-n",
               "-o", str(tmp_path / "idx")])
    assert rc == 0
    rc = main(["run", "-r", str(tmp_path / "idx"), "-p", reads_path, "-P",
               "-n", "-c", "--device", "cpu"])
    assert rc == 0
    vals = _parse_values_file(reads_path + ".pseudo_lengths")
    assert len(vals) == 6
