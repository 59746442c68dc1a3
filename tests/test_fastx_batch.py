"""Array-native batch reader (io/fastx_batch.py) vs the per-record reader
(io/fasta.py) — identical ids, sequences, and order on every format shape."""
import gzip
import os

import numpy as np
import pytest

from spumoni_tpu.io.fasta import batch_iter, iter_query_reads
from spumoni_tpu.io.fastx_batch import (PackedReads, iter_packed_batches,
                                        upper_packed)


def unpack(p: PackedReads):
    return [(p.ids[i], p.buf[p.offs[i]:p.offs[i + 1]].tobytes())
            for i in range(len(p))]


def roundtrip(path, batch_bases=1000, chunk_bytes=None):
    kw = {"chunk_bytes": chunk_bytes} if chunk_bytes else {}
    got = []
    for p in iter_packed_batches(path, batch_bases, **kw):
        got.extend(unpack(p))
    want = list(iter_query_reads(path))
    assert got == want


def test_fasta_two_line(tmp_path):
    path = str(tmp_path / "a.fa")
    rng = np.random.default_rng(0)
    with open(path, "w") as f:
        for i in range(257):
            n = int(rng.integers(1, 300))
            seq = rng.choice(list("ACGTacgtN"), size=n)
            f.write(f">read_{i} some description here\n{''.join(seq)}\n")
    roundtrip(path)
    roundtrip(path, batch_bases=10**9)      # single batch
    roundtrip(path, chunk_bytes=256)        # many chunk boundaries


def test_fasta_multiline_and_crlf(tmp_path):
    path = str(tmp_path / "m.fa")
    with open(path, "wb") as f:
        f.write(b">r1\r\nACGT\r\nGGTT\r\nA\r\n")
        f.write(b">r2\nTTTT\n\nCCCC\n")        # blank line inside a record
        f.write(b">r3 desc\tmore\nACacgtGT")   # no trailing newline
    roundtrip(path)
    roundtrip(path, chunk_bytes=7)


def test_fastq(tmp_path):
    path = str(tmp_path / "q.fq")
    rng = np.random.default_rng(1)
    with open(path, "w") as f:
        for i in range(101):
            n = int(rng.integers(1, 200))
            seq = "".join(rng.choice(list("ACGT"), size=n))
            f.write(f"@q{i} d\n{seq}\n+\n{'I' * n}\n")
    roundtrip(path)
    roundtrip(path, chunk_bytes=97)


def test_gzip(tmp_path):
    path = str(tmp_path / "g.fa.gz")
    with gzip.open(path, "wt") as f:
        for i in range(50):
            f.write(f">g{i}\n{'ACGT' * (i + 1)}\n")
    roundtrip(path)


def test_batch_sizing(tmp_path):
    path = str(tmp_path / "b.fa")
    with open(path, "w") as f:
        for i in range(100):
            f.write(f">b{i}\n{'A' * 100}\n")
    batches = list(iter_packed_batches(path, batch_bases=1000))
    assert sum(len(b) for b in batches) == 100
    # every batch but the last crosses the threshold with its final read
    for b in batches[:-1]:
        assert b.total_bases >= 1000
    lens = batches[0].lens
    assert (lens == 100).all()


def test_upper_packed(tmp_path):
    p = PackedReads(["x"], np.frombuffer(b"acGt\xffnN", np.uint8),
                    np.array([0, 7], np.int64))
    u = upper_packed(p)
    assert u.buf.tobytes() == b"ACGT\xffNN"


def test_fasta_degenerate_header_only_records(tmp_path):
    """2-byte '>\\n' records: up to n/2 records per chunk — the native
    extract's record-indexed outputs must be sized for that, not n/4
    (ADVICE r4 high: heap corruption on repeated '>\\n')."""
    path = str(tmp_path / "deg.fa")
    with open(path, "wb") as f:
        f.write(b">\n" * 5000)          # 5000 empty-header, empty-seq records
        f.write(b">last\nACGT\n")
    got = []
    for p in iter_packed_batches(path, batch_bases=10**9):
        got.extend(unpack(p))
    assert len(got) == 5001
    assert got[-1] == ("last", b"ACGT")
    assert all(s == b"" for _, s in got[:-1])


def test_fastq_blank_lines_across_chunk_cut(tmp_path):
    """Blank lines ('' and '\\r') between FASTQ records must not
    desynchronize the 4-line chunk-cut grouping (ADVICE r4 low)."""
    path = str(tmp_path / "bl.fq")
    with open(path, "wb") as f:
        for i in range(60):
            seq = b"ACGTACGTAC" * (i % 5 + 1)
            f.write(b"@r%d\n" % i + seq + b"\n+\n" + b"I" * len(seq) + b"\n")
            if i % 3 == 0:
                f.write(b"\n")          # blank line between records
            if i % 7 == 0:
                f.write(b"\r\n")        # CRLF blank line
    for cb in (64, 97, 128, 301):
        roundtrip(path, chunk_bytes=cb)


def test_empty_file(tmp_path):
    path = str(tmp_path / "e.fa")
    open(path, "w").close()
    assert list(iter_packed_batches(path)) == []


def test_not_fastx(tmp_path):
    path = str(tmp_path / "x.txt")
    open(path, "w").write("hello world\n")
    with pytest.raises(ValueError):
        list(iter_packed_batches(path))


# ---------------------------------------------------------------------------
# batched digestion vs per-read digestion
# ---------------------------------------------------------------------------

def _mk_packed(reads):
    buf = np.frombuffer(b"".join(reads), np.uint8)
    offs = np.zeros(len(reads) + 1, np.int64)
    np.cumsum([len(r) for r in reads], out=offs[1:])
    return PackedReads([f"r{i}" for i in range(len(reads))], buf, offs)


@pytest.mark.parametrize("scheme", ["promotion", "dna"])
@pytest.mark.parametrize("kw", [(4, 11), (3, 8), (4, 4)])
def test_digest_packed_matches_per_read(scheme, kw):
    from spumoni_tpu.io.minimizers import digest, digest_packed

    k, w = kw
    up, ud = scheme == "promotion", scheme == "dna"
    rng = np.random.default_rng(42)
    reads = []
    for i in range(200):
        n = int(rng.integers(1, 400))
        seq = rng.choice(np.frombuffer(b"ACGTACGTN", np.uint8), size=n)
        if i % 7 == 0:  # homopolymer stretches exercise hp-compression
            seq[: n // 2] = ord("A")
        reads.append(seq.tobytes())
    p = _mk_packed(reads)
    out = digest_packed(p, up, ud, k, w)
    for i, rd in enumerate(reads):
        want = digest(rd, up, ud, k, w)
        got = out.buf[out.offs[i]:out.offs[i + 1]].tobytes()
        assert got == want, (scheme, kw, i, got, want)


def test_digest_packed_no_short_reads_fastpath():
    from spumoni_tpu.io.minimizers import digest, digest_packed

    rng = np.random.default_rng(7)
    reads = [rng.choice(np.frombuffer(b"ACGT", np.uint8),
                        size=int(rng.integers(11, 300))).tobytes()
             for _ in range(100)]
    p = _mk_packed(reads)
    out = digest_packed(p, True, False)
    for i, rd in enumerate(reads):
        assert out.buf[out.offs[i]:out.offs[i + 1]].tobytes() == \
            digest(rd, True, False)


def test_digest_packed_zero_length_read():
    """A zero-length read shares its start offset with the next read; the
    start prefix-sum must count duplicate offsets (np.add.at) or the next
    read's minimizers get attributed to the empty read (ADVICE r4 medium)."""
    from spumoni_tpu.io.minimizers import digest, digest_packed

    rng = np.random.default_rng(3)
    long1 = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=50).tobytes()
    long2 = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=40).tobytes()
    for reads in ([b"ACGTACGTACGTACG", b"", b"ACGTGGTTCCAAGGT"],
                  [b"", long1, b"", b"", long2, b""],
                  [b""] * 3):
        p = _mk_packed(reads)
        for up, ud in ((True, False), (False, True)):
            out = digest_packed(p, up, ud)
            for i, rd in enumerate(reads):
                want = digest(rd, up, ud)
                got = out.buf[out.offs[i]:out.offs[i + 1]].tobytes()
                assert got == want, (up, ud, i, got, want)


def test_digest_packed_passthrough():
    from spumoni_tpu.io.minimizers import digest_packed

    p = _mk_packed([b"ACGT", b"GGTT"])
    out = digest_packed(p, False, False)
    assert out.buf.tobytes() == p.buf.tobytes()


def test_select_records_edges():
    """CSR subset helper (host-stride sharding): empty selection,
    single record, zero-length records, and full-identity selection."""
    from spumoni_tpu.io.fastx_batch import PackedReads, select_records

    pk = PackedReads(["a", "b", "c", "d"],
                     np.frombuffer(b"AAACCGT", np.uint8).copy(),
                     np.asarray([0, 3, 3, 5, 7], np.int64))
    sub = select_records(pk, np.asarray([1, 3]))
    assert sub.ids == ["b", "d"]
    assert sub.buf.tobytes() == b"GT" and list(sub.offs) == [0, 0, 2]

    empty = select_records(pk, np.asarray([], np.int64))
    assert len(empty) == 0 and empty.total_bases == 0

    one = select_records(pk, np.asarray([2]))
    assert one.ids == ["c"] and one.buf.tobytes() == b"CC"

    ident = select_records(pk, np.arange(4))
    assert ident.ids == pk.ids
    assert np.array_equal(ident.buf, pk.buf)
    assert np.array_equal(ident.offs, pk.offs)
