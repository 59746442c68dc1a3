"""Prefix-free parsing + PFP-based index construction (the native
newscan.x / pfp_thresholds equivalents, SURVEY.md §2.3)."""

import numpy as np
import pytest

from spumoni_tpu.native import build_raw_index, pfp_parse

from conftest import rand_dna


def _assert_same_index(a, b):
    assert a.n == b.n and a.r == b.r
    assert np.array_equal(a.run_heads, b.run_heads)
    assert np.array_equal(a.run_starts, b.run_starts)
    assert np.array_equal(a.thresholds, b.thresholds)
    assert np.array_equal(a.samples_start, b.samples_start)
    assert np.array_equal(a.samples_last, b.samples_last)


def test_pfp_build_matches_sais_random(rng):
    for n in (50, 333, 2048, 20000):
        for mod in (20, 100):
            text = np.frombuffer(rand_dna(rng, n), np.uint8)
            sais = build_raw_index(text, method="sais")
            pfp = build_raw_index(text, method="pfp", w=10, mod=mod)
            _assert_same_index(sais, pfp)


def test_pfp_build_matches_sais_repetitive(rng):
    # highly repetitive text: many multi-member alpha classes, long runs,
    # full-phrase suffixes with varying preceding characters
    base = np.frombuffer(rand_dna(rng, 4000), np.uint8)
    copies = [base]
    for _ in range(4):
        c = base.copy()
        mut = rng.random(len(c)) < 0.01
        c[mut] = np.frombuffer(b"ACGT", np.uint8)[
            rng.integers(0, 4, int(mut.sum()))]
        copies.append(c)
    text = np.concatenate(copies)
    _assert_same_index(build_raw_index(text, method="sais"),
                       build_raw_index(text, method="pfp"))
    # pure tandem repeat (equal bodies after different triggers)
    text2 = np.tile(np.frombuffer(rand_dna(rng, 500), np.uint8), 30)
    _assert_same_index(build_raw_index(text2, method="sais"),
                       build_raw_index(text2, method="pfp"))


def test_pfp_build_small_windows(rng):
    # small w stresses trigger-overlap edge cases (phrases of length w+1)
    for w in (2, 4):
        for n in (40, 1000):
            text = np.frombuffer(rand_dna(rng, n), np.uint8)
            _assert_same_index(
                build_raw_index(text, method="sais"),
                build_raw_index(text, method="pfp", w=w, mod=7))


def test_pfp_build_rejects_special_bytes():
    with pytest.raises(ValueError):
        build_raw_index(np.full(100, 2, np.uint8), method="pfp")


def test_pfp_roundtrip_and_invariants(rng):
    for n in (200, 5000, 60000):
        text = np.frombuffer(rand_dna(rng, n), np.uint8)
        p = pfp_parse(text, w=10, mod=100)

        # reconstruction: Dollar ++ text ++ Dollar^w
        rec = np.frombuffer(p.reconstruct(), np.uint8)
        assert rec[0] == 2 and np.all(rec[-p.w:] == 2)
        assert np.array_equal(rec[1:-p.w], text)

        # dictionary is lex-sorted and deduplicated
        phrases = [p.phrase(i) for i in range(p.num_phrases)]
        assert phrases == sorted(phrases)
        assert len(set(phrases)) == len(phrases)

        # consecutive phrases overlap by exactly the w-char trigger window
        prev = p.phrase(p.parse[0] - 1)
        for pid in p.parse[1:]:
            cur = p.phrase(int(pid) - 1)
            assert prev[-p.w:] == cur[:p.w]
            assert len(cur) > p.w
            prev = cur

        # occurrence counts match the parse
        counts = np.bincount(p.parse - 1, minlength=p.num_phrases)
        assert np.array_equal(counts, p.occ)

        # .dict format: EndOfWord=1 separators, EndOfDict=0 terminator
        # (common.hpp:54-56)
        assert p.dict_concat[-1] == 0
        seps = np.nonzero(p.dict_concat == 1)[0]
        assert len(seps) == p.num_phrases


def test_pfp_parse_is_much_shorter_than_text(rng):
    text = np.frombuffer(rand_dna(rng, 200_000), np.uint8)
    p = pfp_parse(text, w=10, mod=100)
    # expected phrase length ~ mod; parse should compress the scan ~50-200x
    assert len(p.parse) < len(text) // 20
    # identical halves share dictionary phrases
    text2 = np.concatenate([text, text])
    p2 = pfp_parse(text2, w=10, mod=100)
    assert p2.num_phrases < 2 * p.num_phrases


def test_pfp_save_formats(rng, tmp_path):
    text = np.frombuffer(rand_dna(rng, 3000), np.uint8)
    p = pfp_parse(text)
    prefix = str(tmp_path / "ref.fa")
    p.save(prefix)
    parse = np.fromfile(prefix + ".parse", dtype=np.int32)
    assert np.array_equal(parse, p.parse)
    assert parse.min() >= 1 and parse.max() <= p.num_phrases
    d = np.fromfile(prefix + ".dict", dtype=np.uint8)
    assert np.array_equal(d, p.dict_concat)


def test_save_dicz_normal(tmp_path, rng):
    """compress_dictionary equivalence: .dicz holds each lex-ordered phrase
    minus its w-char trigger suffix; .dicz.len the 4-byte lengths."""
    text = np.frombuffer(rand_dna(rng, 3000), np.uint8)
    pfp = pfp_parse(text, w=10, mod=20)
    prefix = str(tmp_path / "t")
    pfp.save(prefix)
    pfp.save_dicz(prefix)
    lens = np.fromfile(prefix + ".dicz.len", dtype="<i4")
    dicz = np.fromfile(prefix + ".dicz", dtype=np.uint8)
    start = 1 if int(pfp.dict_len[0]) == pfp.w else 0
    assert len(lens) == pfp.num_phrases - start
    assert lens.sum() == len(dicz)
    off = 0
    for i in range(start, pfp.num_phrases):
        ph = pfp.phrase(i)
        want = ph[:-pfp.w]
        assert lens[i - start] == len(want)
        assert dicz[off:off + len(want)].tobytes() == want
        off += len(want)


def test_save_dicz_empty_first_phrase(tmp_path):
    """The empty-first-phrase rewrite (compress_dictionary.cpp:129-167):
    phrase 1 is exactly one trigger string -> skipped, and .parse is
    rewritten with all ids shifted down (old file kept)."""
    import os
    from spumoni_tpu.native import PfpParse

    w = 3
    # dict: ["abc" (pure trigger), "abcxyzabc", "abczabc"] lex-ordered-ish
    phrases = [b"abc", b"abcxyzabc", b"abczabc"]
    concat = b"".join(p + b"\x01" for p in phrases) + b"\x00"
    off, ln, pos = [], [], 0
    for p in phrases:
        off.append(pos)
        ln.append(len(p))
        pos += len(p) + 1
    pfp = PfpParse(np.frombuffer(concat, np.uint8), np.array(off),
                   np.array(ln), np.array([1, 2, 1]),
                   np.array([1, 2, 3, 2], dtype=np.int32), w, 20)
    prefix = str(tmp_path / "e")
    pfp.save(prefix)
    pfp.save_dicz(prefix)
    lens = np.fromfile(prefix + ".dicz.len", dtype="<i4")
    assert lens.tolist() == [6, 4]          # trigger stripped, phrase 0 gone
    dicz = np.fromfile(prefix + ".dicz", dtype=np.uint8).tobytes()
    assert dicz == b"abcxyz" + b"abcz"
    new_parse = np.fromfile(prefix + ".parse", dtype="<i4")
    assert new_parse.tolist() == [1, 2, 1]  # dropped leading 1, shifted down
    assert os.path.exists(prefix + ".parse_with_empty_phrase")
    old = np.fromfile(prefix + ".parse_with_empty_phrase", dtype="<i4")
    assert old.tolist() == [1, 2, 3, 2]


def test_pfp_threaded_sweep_identical(rng):
    """The segmented (threaded) sweep with seam stitching must be
    byte-identical to the sequential path at every segment count — on
    random and highly repetitive texts (cross-seam run merges, threshold
    windows spanning seams, empty classes at seams)."""
    import os

    texts = []
    texts.append(np.frombuffer(rand_dna(rng, 6000), np.uint8))
    base = np.frombuffer(rand_dna(rng, 1500), np.uint8)
    copies = [base]
    for _ in range(4):
        c = base.copy()
        m = rng.random(len(c)) < 0.01
        c[m] = np.frombuffer(b"ACGT", np.uint8)[
            rng.integers(0, 4, int(m.sum()))]
        copies.append(c)
    texts.append(np.concatenate(copies))
    texts.append(np.tile(np.frombuffer(rand_dna(rng, 300), np.uint8), 25))

    for text in texts:
        seq = build_raw_index(text, method="pfp", threads=1)
        for segs in (1, 2, 3, 7, 16):
            os.environ["SPN_SWEEP_SEGMENTS"] = str(segs)
            try:
                par = build_raw_index(text, method="pfp", threads=2)
            finally:
                del os.environ["SPN_SWEEP_SEGMENTS"]
            _assert_same_index(seq, par)
