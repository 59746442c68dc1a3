"""Engine v4 (block-bits, one slim gather per PML step) must match the
native engine exactly — including the precomputed up/down threshold bits,
block-boundary offsets, forced jump-ups past the last c-run, absent
characters, and chunked long-read state carry."""

import numpy as np
import pytest

from spumoni_tpu.native import build_raw_index, NativeQueryEngine
from spumoni_tpu.index.format import build_dense_index
from spumoni_tpu.engine.blockbits import build_blockbits, eligible
from spumoni_tpu.engine.scan_engine import ScanEngine

from conftest import rand_dna


def _setup(rng, n):
    text = rand_dna(rng, n)
    tarr = np.frombuffer(text, np.uint8)
    raw = build_raw_index(tarr)
    dense = build_dense_index(raw, text=tarr, with_samples=True)
    native = NativeQueryEngine(raw.n, raw.run_heads, raw.run_starts,
                               raw.thresholds, raw.samples_start,
                               raw.samples_last, text=tarr)
    return text, dense, native


@pytest.mark.parametrize("P", [256, 512])
def test_blockbits_pml_matches_native(rng, make_reads, P):
    # P=256 is the under-cliff default; P=512 is the over-cliff
    # genome-scale production row width (pick_P over_cliff branch)
    for trial in range(3):
        text, dense, native = _setup(rng, int(rng.integers(2000, 9000)))
        assert eligible(dense)
        arrays, meta, host = build_blockbits(dense, P=P)
        reads = make_reads(rng, text, num=16, max_len=300)
        reads.append(b"N" * 64)        # cnt==0 (absent char) path
        reads.append(text[:130])       # exact prefix crossing a block edge
        reads.append(text[-100:])      # suffix: exercises terminator region

        pml = ScanEngine(arrays, meta, mode="pml", host=host).query(reads)
        for a, b in zip(pml["lengths"], native.query_pml(reads)):
            assert np.array_equal(a, b)


def test_blockbits_repetitive_text(rng, make_reads):
    """Highly repetitive text: long runs, thresholds far from run edges."""
    unit = rand_dna(rng, 400)
    text = unit * 12 + rand_dna(rng, 500) + unit * 3
    tarr = np.frombuffer(text, np.uint8)
    raw = build_raw_index(tarr)
    dense = build_dense_index(raw)
    native = NativeQueryEngine(raw.n, raw.run_heads, raw.run_starts,
                               raw.thresholds, raw.samples_start,
                               raw.samples_last)
    arrays, meta, host = build_blockbits(dense)
    reads = make_reads(rng, text, num=12, max_len=250)
    reads.append(unit * 2)
    pml = ScanEngine(arrays, meta, mode="pml", host=host).query(reads)
    for a, b in zip(pml["lengths"], native.query_pml(reads)):
        assert np.array_equal(a, b)


def test_blockbits_P_and_pack_variants(rng, make_reads):
    """Every supported (block size, packing) must agree — including the
    4-bit fallback on a DNA text (terminator as an ordinary code char)."""
    text, dense, native = _setup(rng, 4000)
    reads = make_reads(rng, text, num=10, max_len=200)
    ref = native.query_pml(reads)
    for P in (32, 64, 128, 256, 512):
        for pack in (2, 4):
            arrays, meta, host = build_blockbits(dense, P=P, pack=pack)
            eng = ScanEngine(arrays, meta, mode="pml", host=host)
            for a, b in zip(eng.query(reads)["lengths"], ref):
                assert np.array_equal(a, b), (P, pack)


def test_blockbits_wide_alphabet_pack4(rng, make_reads):
    """A 7-letter text needs the 4-bit packing; eligibility picks it."""
    from spumoni_tpu.engine.blockbits import _pack_of
    alpha = b"ACGTWXY"
    text = bytes(np.frombuffer(alpha, np.uint8)[
        rng.integers(0, len(alpha), size=6000)])
    tarr = np.frombuffer(text, np.uint8)
    from spumoni_tpu.native import build_raw_index, NativeQueryEngine
    raw = build_raw_index(tarr)
    dense = build_dense_index(raw)
    native = NativeQueryEngine(raw.n, raw.run_heads, raw.run_starts,
                               raw.thresholds, raw.samples_start,
                               raw.samples_last)
    assert _pack_of(dense) == 4 and eligible(dense)
    arrays, meta, host = build_blockbits(dense)
    assert meta.pack == 4
    reads = make_reads(rng, text, num=10, max_len=200)
    pml = ScanEngine(arrays, meta, mode="pml", host=host).query(reads)
    for a, b in zip(pml["lengths"], native.query_pml(reads)):
        assert np.array_equal(a, b)


def test_blockbits_chunked_long_reads(rng):
    """Chunk boundaries carry the (pos, length) recurrence state."""
    text, dense, native = _setup(rng, 20000)
    arrays, meta, host = build_blockbits(dense)
    reads = []
    for m in (900, 1500, 2300):
        st = int(rng.integers(0, len(text) - m))
        rd = bytearray(text[st:st + m])
        for k in range(0, len(rd), 37):
            rd[k] = ord("ACGT"[int(rng.integers(4))])
        reads.append(bytes(rd))
    reads.append(rand_dna(rng, 1700))

    eng = ScanEngine(arrays, meta, mode="pml", host=host, chunk=256)
    out = eng.query(reads)
    for a, b in zip(out["lengths"], native.query_pml(reads)):
        assert np.array_equal(a, b)


def test_blockbits_rows_cache_roundtrip(rng, make_reads, tmp_path):
    """The content-keyed rows cache must load to identical results, and a
    DIFFERENT index at the same path must miss (stale-cache safety)."""
    text, dense, native = _setup(rng, 5000)
    cache = str(tmp_path / "idx.bbrows.npz")
    reads = make_reads(rng, text, num=8, max_len=200)
    ref = native.query_pml(reads)

    arrays1, meta1, host1 = build_blockbits(dense, cache_path=cache)
    import os
    assert os.path.exists(cache)
    mtime = os.path.getmtime(cache)
    arrays2, meta2, host2 = build_blockbits(dense, cache_path=cache)
    assert os.path.getmtime(cache) == mtime      # hit: not rewritten
    assert meta1 == meta2
    assert np.array_equal(np.asarray(arrays1.bblocks),
                          np.asarray(arrays2.bblocks))
    pml = ScanEngine(arrays2, meta2, mode="pml", host=host2).query(reads)
    for a, b in zip(pml["lengths"], ref):
        assert np.array_equal(a, b)

    # different content at the same path -> rebuild, not a poisoned load
    text3, dense3, native3 = _setup(rng, 5200)
    arrays3, meta3, host3 = build_blockbits(dense3, cache_path=cache)
    reads3 = make_reads(rng, text3, num=6, max_len=150)
    pml3 = ScanEngine(arrays3, meta3, mode="pml", host=host3).query(reads3)
    for a, b in zip(pml3["lengths"], native3.query_pml(reads3)):
        assert np.array_equal(a, b)


def test_blockbits_rejects_ms_and_doc_without_tables(rng):
    """An index built WITHOUT want_ms/want_doc has no jump tables; asking
    for MS or doc tracking must fail loudly, not return garbage."""
    text, dense, native = _setup(rng, 2000)
    arrays, meta, host = build_blockbits(dense)
    with pytest.raises(ValueError):
        ScanEngine(arrays, meta, mode="ms", host=host)
    with pytest.raises(ValueError):
        ScanEngine(arrays, meta, mode="pml", use_doc=True, host=host)


# ---------------------------------------------------------------------------
# engine v4-MS: MS pointers + doc tracking on the block-bits engine
# (VERDICT r4 #1/#3 — run-rank msrows + post-scan jump-table reconstruction)
# ---------------------------------------------------------------------------

def _setup_msdoc(rng, doc_lens):
    from spumoni_tpu.index.format import build_doc_arrays

    parts = [np.frombuffer(rand_dna(rng, m), np.uint8) for m in doc_lens]
    tarr = np.concatenate(parts)
    raw = build_raw_index(tarr)
    ds, de = build_doc_arrays(raw, doc_lens)
    dense = build_dense_index(raw, text=tarr, with_samples=True,
                              doc_start=ds, doc_end=de)
    native = NativeQueryEngine(raw.n, raw.run_heads, raw.run_starts,
                               raw.thresholds, raw.samples_start,
                               raw.samples_last, start_doc=ds, end_doc=de,
                               text=tarr)
    return tarr.tobytes(), dense, native


@pytest.mark.parametrize("P", [64, 256])
def test_blockbits_ms_matches_native(rng, make_reads, P):
    """v4-MS pointers and extended lengths must match the native engine
    exactly — incl. absent-char resets (underflow pointers), block-edge
    jumps, and the terminator region."""
    text, dense, native = _setup_msdoc(rng, [4000, 3000])
    arrays, meta, host = build_blockbits(dense, P=P, want_ms=True)
    assert meta.has_ms and arrays.jump_t is not None
    reads = make_reads(rng, text, num=14, max_len=300)
    reads.append(b"N" * 64)
    reads.append(text[:130])
    reads.append(text[-100:])
    out = ScanEngine(arrays, meta, mode="ms", host=host).query(reads)
    wptr, wlen = native.query_ms(reads)
    for i in range(len(reads)):
        assert np.array_equal(out["pointers"][i], wptr[i]), (P, i)
        assert np.array_equal(out["lengths"][i], wlen[i]), (P, i)


@pytest.mark.parametrize("mode", ["ms", "pml"])
def test_blockbits_doc_tracking_matches_native(rng, make_reads, mode):
    """Doc ids ride the same jump-id emission: MS resets to run 0's start
    doc on absent chars (compute_ms_pml.cpp:639-643) while PML keeps the
    current doc (:303) — both must match the native engine exactly."""
    text, dense, native = _setup_msdoc(rng, [3000, 2500, 2000])
    arrays, meta, host = build_blockbits(dense, want_ms=True, want_doc=True)
    reads = make_reads(rng, text, num=12, max_len=250)
    reads.append(b"N" * 40 + text[100:200] + b"N" * 10)  # absent-char resets
    reads.append(text[:90])
    eng = ScanEngine(arrays, meta, mode=mode, use_doc=True, host=host)
    out = eng.query(reads)
    if mode == "ms":
        wptr, wlen, wdoc = native.query_ms(reads, with_docs=True)
        for i in range(len(reads)):
            assert np.array_equal(out["pointers"][i], wptr[i]), i
            assert np.array_equal(out["docs"][i], wdoc[i]), i
    else:
        wlen, wdoc = native.query_pml(reads, with_docs=True)
        for i in range(len(reads)):
            assert np.array_equal(out["lengths"][i], wlen[i]), i
            assert np.array_equal(out["docs"][i], wdoc[i]), i


def test_blockbits_ms_wide_matches_native(rng, make_reads):
    """v4-MS over the wide (n >= 2^31) layout: int64 positions/samples,
    int32 jump ids (forced wide=True on a small n)."""
    text, dense, native = _setup_msdoc(rng, [5000, 4000])
    arrays, meta, host = build_blockbits(dense, P=256, wide=True,
                                         want_ms=True, want_doc=True)
    assert meta.wide and arrays.jump_t.dtype == np.int64
    reads = make_reads(rng, text, num=10, max_len=300)
    reads.append(b"N" * 32)
    out = ScanEngine(arrays, meta, mode="ms", use_doc=True,
                     host=host).query(reads)
    wptr, wlen, wdoc = native.query_ms(reads, with_docs=True)
    for i in range(len(reads)):
        assert np.array_equal(out["pointers"][i], wptr[i]), i
        assert np.array_equal(out["lengths"][i], wlen[i]), i
        assert np.array_equal(out["docs"][i], wdoc[i]), i


def test_blockbits_ms_chunked_long_reads(rng):
    """Chunk boundaries carry (pos, jidx, d) across kernel invocations —
    a match streak crossing the boundary must keep decrementing the same
    jump sample."""
    text, dense, native = _setup_msdoc(rng, [12000, 8000])
    arrays, meta, host = build_blockbits(dense, want_ms=True, want_doc=True)
    reads = []
    for m in (900, 1500):
        st = int(rng.integers(0, len(text) - m))
        rd = bytearray(text[st:st + m])
        for k in range(0, len(rd), 41):
            rd[k] = ord("ACGT"[int(rng.integers(4))])
        reads.append(bytes(rd))
    reads.append(text[1000:2500])      # pure match streak across chunks
    reads.append(rand_dna(rng, 1100))
    for mode, use_doc in (("ms", False), ("ms", True), ("pml", True)):
        eng = ScanEngine(arrays, meta, mode=mode, use_doc=use_doc,
                         host=host, chunk=256)
        out = eng.query(reads)
        if mode == "ms":
            res = native.query_ms(reads, with_docs=use_doc)
            wptr, wlen = res[0], res[1]
            for i in range(len(reads)):
                assert np.array_equal(out["pointers"][i], wptr[i]), (mode, i)
                assert np.array_equal(out["lengths"][i], wlen[i]), (mode, i)
                if use_doc:
                    assert np.array_equal(out["docs"][i], res[2][i]), i
        else:
            wlen, wdoc = native.query_pml(reads, with_docs=True)
            for i in range(len(reads)):
                assert np.array_equal(out["lengths"][i], wlen[i]), i
                assert np.array_equal(out["docs"][i], wdoc[i]), i


def test_blockbits_ms_staged_path(rng, make_reads):
    """The staged (device-resident) path — stage() -> query_staged /
    classify_staged — through v4-MS must match the per-read query path."""
    from spumoni_tpu.io.fastx_batch import PackedReads
    from spumoni_tpu.classify import binmax

    text, dense, native = _setup_msdoc(rng, [6000, 5000])
    arrays, meta, host = build_blockbits(dense, want_ms=True)
    reads = make_reads(rng, text, num=20, max_len=400)
    buf = np.frombuffer(b"".join(reads), np.uint8)
    offs = np.zeros(len(reads) + 1, np.int64)
    np.cumsum([len(r) for r in reads], out=offs[1:])
    pk = PackedReads([f"r{i}" for i in range(len(reads))], buf, offs)

    eng = ScanEngine(arrays, meta, mode="ms", host=host)
    staged = eng.stage(pk)
    out = eng.query_staged(staged)
    wptr, wlen = native.query_ms(reads)
    for i in range(len(reads)):
        assert np.array_equal(out["pointers"][i], wptr[i]), i
        assert np.array_equal(out["lengths"][i], wlen[i]), i

    res = eng.classify_staged(staged, bin_width=150, max_value_thr=18)
    for i in range(len(reads)):
        want = binmax.classify(wlen[i], 150, 18)
        assert bool(res["found"][i]) == (want.status == "FOUND"), i
        assert res["above"][i] == want.bins_above, i


def test_blockbits_msrows_cache_roundtrip(rng, make_reads, tmp_path):
    """The msrows cache must load to identical rows and miss on content
    change, like the main rows cache."""
    import os

    text, dense, native = _setup_msdoc(rng, [3000, 2500])
    cache = str(tmp_path / "i.bbrows.npz")
    ms_cache = str(tmp_path / "i.bbms.npz")
    a1, m1, h1 = build_blockbits(dense, cache_path=cache, want_ms=True,
                                 ms_cache_path=ms_cache)
    assert os.path.exists(ms_cache)
    mt = os.path.getmtime(ms_cache)
    a2, m2, h2 = build_blockbits(dense, cache_path=cache, want_ms=True,
                                 ms_cache_path=ms_cache)
    assert os.path.getmtime(ms_cache) == mt
    assert np.array_equal(np.asarray(a1.msrows), np.asarray(a2.msrows))
    reads = make_reads(rng, text, num=6, max_len=150)
    out = ScanEngine(a2, m2, mode="ms", host=h2).query(reads)
    wptr, _ = native.query_ms(reads)
    for i in range(len(reads)):
        assert np.array_equal(out["pointers"][i], wptr[i]), i


def test_blockbits_fused_classify_matches_host(rng, make_reads):
    """The fused scan+binmax kernel over v4 must agree with querying values
    and classifying on the host."""
    import jax
    from spumoni_tpu.classify import binmax
    from spumoni_tpu.parallel.mesh import (ShardedPmlClassifier,
                                           make_data_mesh)

    text, dense, native = _setup(rng, 6000)
    arrays, meta, host = build_blockbits(dense)
    mesh = make_data_mesh(jax.devices("cpu")[:4])
    clf = ShardedPmlClassifier(arrays, meta, mesh, bin_width=150,
                               max_value_thr=5, host=host)
    reads = make_reads(rng, text, num=9, max_len=400)
    out = clf.classify(reads, want_values=False)
    lengths = native.query_pml(reads)
    for i, rd in enumerate(reads):
        res = binmax.classify(lengths[i], 150, 5)
        assert out["above"][i] == res.bins_above, i
        assert out["below"][i] == res.bins_below, i
        assert bool(out["found"][i]) == (res.status == "FOUND"), i


def test_pick_P_over_cliff_selection():
    """Past the gather row-count cliff (n > 512 * 2^17) there is no
    under-cliff P; the over-cliff fallback must take the widest row (P=512,
    400 B — measured 4.7x cheaper per lane than 208 B rows at human-genome
    row counts, PERF_NOTES.md round 2)."""
    from spumoni_tpu.engine.blockbits import pick_P

    small, huge = 5_000_000, 2_100_000_001
    assert pick_P(small, 2) == 256          # under-cliff optimum unchanged
    assert pick_P(small, 2, over_cliff=True) == 256
    assert pick_P(huge, 2) is None
    assert pick_P(huge, 2, over_cliff=True) == 512


def test_eligible_any_position_bound(rng):
    """eligible() stays the under-cliff fast-zone predicate; eligible_any()
    admits over-cliff sizes and (via the wide layout) positions up to the
    40-bit SSABYTES=5 addressing limit, but no further."""
    from spumoni_tpu.engine.blockbits import eligible_any

    _, dense, _ = _setup(rng, 3000)
    assert eligible(dense) and eligible_any(dense)

    class FakeN:
        def __init__(self, base, n):
            self.cnt = base.cnt
            self.n = n

    over_cliff = FakeN(dense, 2_100_000_001)
    assert not eligible(over_cliff) and eligible_any(over_cliff)
    past_int32 = FakeN(dense, 2**31)
    assert eligible_any(past_int32)        # wide layout covers it
    past_40bit = FakeN(dense, 2**40)
    assert not eligible_any(past_40bit)


@pytest.mark.parametrize("P", [256, 512])
def test_blockbits_wide_matches_native(rng, make_reads, P):
    """The wide (n >= 2^31) layout — split u32/high-byte checkpoints, int64
    lane positions — must be value-identical to the int32 layout and the
    native engine on the same index (forced wide=True on a small n so the
    layout itself is what's exercised; the hi bytes are all zero here but
    every reassembly path runs)."""
    for trial in range(2):
        text, dense, native = _setup(rng, int(rng.integers(2000, 9000)))
        arrays, meta, host = build_blockbits(dense, P=P, wide=True)
        assert meta.wide and meta.dtype == "int64"
        assert arrays.n.dtype == np.int64
        reads = make_reads(rng, text, num=12, max_len=300)
        reads.append(b"N" * 64)
        reads.append(text[:130])
        reads.append(text[-100:])
        pml = ScanEngine(arrays, meta, mode="pml", host=host).query(reads)
        for a, b in zip(pml["lengths"], native.query_pml(reads)):
            assert np.array_equal(a, b)


def test_blockbits_wide_checkpoint_split():
    """The split checkpoint encode/decode round-trips values past 2^31
    (unit-level: build-side packing vs the kernel's reassembly arithmetic,
    since building a real n >= 2^31 index is a bench-scale job)."""
    vals = np.asarray([0, 1, 2**31 - 1, 2**31, 2**32 - 1, 2**32,
                       3 * 10**9, 2**39 - 1], dtype=np.int64)
    lo = (vals & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    hi = (vals >> 32).astype(np.int64)
    rebuilt = (hi << 32) | (lo.astype(np.int64) & 0xFFFFFFFF)
    assert np.array_equal(rebuilt, vals)


def test_blockbits_wide_fused_classify(rng, make_reads):
    """Fused on-device classification over the wide layout (the n >= 2^31
    production path for report-only runs)."""
    import jax
    from spumoni_tpu.classify import binmax
    from spumoni_tpu.parallel.mesh import (ShardedPmlClassifier,
                                           make_data_mesh)

    text, dense, native = _setup(rng, 6000)
    arrays, meta, host = build_blockbits(dense, wide=True)
    mesh = make_data_mesh(jax.devices("cpu")[:4])
    clf = ShardedPmlClassifier(arrays, meta, mesh, bin_width=150,
                               max_value_thr=5, host=host)
    reads = make_reads(rng, text, num=9, max_len=400)
    out = clf.classify(reads, want_values=False)
    lengths = native.query_pml(reads)
    for i, rd in enumerate(reads):
        res = binmax.classify(lengths[i], 150, 5)
        assert out["above"][i] == res.bins_above, i
        assert out["below"][i] == res.bins_below, i
        assert bool(out["found"][i]) == (res.status == "FOUND"), i


def test_load_cached_guards(tmp_path, rng):
    """Fast-start loader returns None (never a wrong engine) for: missing
    cache, pre-manifest cache, stale source stat, and a rows table past
    max_bytes."""
    import os

    from spumoni_tpu.engine import blockbits
    from spumoni_tpu.index.format import build_dense_index

    text = np.frombuffer(rand_dna(rng, 4000), np.uint8)
    raw = build_raw_index(text)
    dense = build_dense_index(raw)
    src = str(tmp_path / "idx.npz")
    np.savez(src, dummy=np.zeros(1))
    cache = str(tmp_path / "idx.bbrows.npz")

    assert blockbits.load_cached(cache, src) is None          # missing

    blockbits.build_blockbits(dense, cache_path=cache, src_path=src)
    got = blockbits.load_cached(cache, src)
    assert got is not None and got[3] == dense.n and got[4] == dense.r

    assert blockbits.load_cached(cache, src, max_bytes=16) is None  # budget

    os.utime(src)                                             # stale stat
    assert blockbits.load_cached(cache, src) is None

    # pre-manifest cache (no m_stat): rejected, then upgraded in place by
    # the next dense-path build
    d = dict(np.load(cache))
    np.savez(cache, key=d["key"], rows=d["rows"])
    assert blockbits.load_cached(cache, src) is None
    blockbits.build_blockbits(dense, cache_path=cache, src_path=src)
    assert blockbits.load_cached(cache, src) is not None
