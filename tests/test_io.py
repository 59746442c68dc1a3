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


def test_minimizer_lex_semantics_oracle():
    """DNA-letter scheme against a direct transliteration of bonsai
    Encoder<score::Lex>: window = span of w BASES (w-k+1 k-mers,
    Spacer(k, w)), per-position min over 2-bit codes, invalid k-mers
    score as BF and all-invalid windows emit nothing, then SPUMONI's
    hp-compression (spumoni.cpp:321-342)."""
    rng = np.random.default_rng(11)
    enc = {65: 0, 67: 1, 71: 2, 84: 3}

    def oracle(seq, k, w):
        kmers = []
        for i in range(len(seq) - k + 1):
            sub = seq[i:i + k]
            if all(b in enc for b in sub):
                v = 0
                for b in sub:
                    v = v * 4 + enc[b]
                kmers.append(v)
            else:
                kmers.append(None)   # BF
        per = w - k + 1
        if not kmers:
            return b""
        if len(kmers) <= per:
            wins = [kmers]
        else:
            wins = [kmers[i:i + per] for i in range(len(kmers) - per + 1)]
        out, prev = [], object()
        for win in wins:
            vals = [v for v in win if v is not None]
            if not vals:
                continue
            m = min(vals)
            if m != prev:
                out.append(m)
                prev = m
        s = b""
        for v in out:
            s += bytes(b"ACGT"[(v >> (2 * (k - 1 - j))) & 3]
                       for j in range(k))
        return s

    for trial in range(20):
        n = int(rng.integers(3, 120))
        seq = bytes(rng.choice(np.frombuffer(b"ACGTN", np.uint8),
                               p=[0.23, 0.23, 0.23, 0.23, 0.08],
                               size=n).astype(np.uint8))
        for (k, w) in [(4, 11), (3, 9), (2, 2), (4, 4), (5, 20)]:
            got = minimizers.digest_dna(seq, k, w)
            assert got == oracle(seq, k, w), (seq, k, w)


def test_minimizer_promotion_window_geometry():
    """Promotion scheme shares the window geometry: a window covers
    w - k + 1 k-mers, so two sequences differing only after the first
    window's span digest to streams with a common prefix."""
    k, w = 4, 11
    seq = b"ACGTTGCAACGTGGCATTCAGA"
    d_full = minimizers.digest_promotion(seq, k, w)
    # N invalidates overlapping k-mers but valid windows still emit
    seqn = seq[:8] + b"N" + seq[9:]
    dn = minimizers.digest_promotion(seqn, k, w)
    assert len(dn) > 0
    # all-N: nothing valid, nothing emitted
    assert minimizers.digest_promotion(b"N" * 50, k, w) == b""
    assert minimizers.digest_dna(b"N" * 50, k, w) == b""
    assert len(d_full) > 0


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


def test_mtrand_canonical_vectors():
    """Wagner MTRand == canonical MT19937 (init_genrand + tempering)."""
    from spumoni_tpu.io.mtrand import MTRand, character_hash_table

    m = MTRand(5489)
    assert [m.rand_int32() for _ in range(6)] == [
        3499211612, 581869302, 3890346734, 3586334585, 545404204, 4161255391]
    # CharacterHash(255): randInt(255) accepts every masked draw, so the
    # table is the first 256 tempered outputs & 0xFF
    t = character_hash_table(wordsize=8, seed=5489)
    assert t[0] == 3499211612 % 256 and t[1] == 581869302 % 256
    assert t.dtype.itemsize == 1 and len(t) == 256
