"""IO-layer tests: FASTA/FASTQ parsing, gzip, read-id quirk, minimizers,
utils."""

import gzip

import numpy as np
import pytest

from spumoni_tpu.io.fasta import (batch_iter, batch_loader_id, iter_query_reads,
                                  read_fastx, write_fasta)
from spumoni_tpu.io import minimizers


def test_fasta_multiline_and_headers(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text(">seq1 a description here\nACGT\nACGT\n>seq2\nGGGG\n")
    recs = list(read_fastx(str(p)))
    assert [r.name for r in recs] == ["seq1", "seq2"]
    assert recs[0].seq == b"ACGTACGT"
    assert recs[0].header == "seq1 a description here"
    assert recs[1].seq == b"GGGG"


def test_fastq(tmp_path):
    p = tmp_path / "x.fq"
    p.write_text("@r1 desc\nACGTA\n+\nIIIII\n@r2\nTTTT\n+\n!!!!\n")
    recs = list(read_fastx(str(p)))
    assert [r.name for r in recs] == ["r1", "r2"]
    assert recs[0].seq == b"ACGTA"
    assert recs[0].qual == b"IIIII"
    assert recs[1].seq == b"TTTT"


def test_gzip_transparent(tmp_path):
    p = tmp_path / "x.fa.gz"
    with gzip.open(str(p), "wt") as f:
        f.write(">a\nACGT\n>b\nTTTT\n")
    recs = list(read_fastx(str(p)))
    assert [r.seq for r in recs] == [b"ACGT", b"TTTT"]


def test_batch_loader_id_quirk():
    # batch_loader.cpp:104-106 keeps the delimiter character in the id
    assert batch_loader_id("read_1 some desc") == "read_1 "
    assert batch_loader_id("read_1") == "read_1"
    assert batch_loader_id("r\textra") == "r\t"


def test_batch_iter_groups_by_bases():
    items = [("a", b"x" * 600), ("b", b"y" * 600), ("c", b"z" * 100)]
    batches = list(batch_iter(iter(items), batch_bases=1000))
    assert [len(b) for b in batches] == [2, 1]


def test_minimizer_digestion_properties():
    seq = b"ACGTACGTACGTACGTACGTTTTTGGGGCCCCAAAA" * 4
    d1 = minimizers.digest_promotion(seq, 4, 11)
    assert len(d1) > 0 and len(d1) < len(seq)
    assert all(b >= 3 for b in d1)          # 0,1,2 reserved (spumoni.cpp:311)
    assert all(d1[i] != d1[i + 1] for i in range(len(d1) - 1))  # hp-compressed
    # deterministic
    assert d1 == minimizers.digest_promotion(seq, 4, 11)

    d2 = minimizers.digest_dna(seq, 4, 11)
    assert len(d2) % 4 == 0 and len(d2) > 0
    assert set(d2) <= set(b"ACGT")
    assert d2 == minimizers.digest_dna(seq, 4, 11)

    # shorter than k
    assert minimizers.digest_promotion(b"AC", 4, 11) == b""
    # identical windows compress heavily
    rep = minimizers.digest_dna(b"A" * 100, 4, 11)
    assert len(rep) == 4


def test_utils_phase_and_footprint(capsys):
    import jax.numpy as jnp
    from spumoni_tpu import utils

    with utils.phase("test", "doing a thing"):
        pass
    timer = utils.PhaseTimer()
    with timer.track("a"):
        pass
    assert "a" in timer.durations
    assert "total" in timer.summary()

    fp = utils.device_array_footprint({"x": jnp.zeros(100, jnp.int32)})
    assert fp["__total__"] == 400
