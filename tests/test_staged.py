"""Staged (array-native) engine path vs the per-read bytes path — identical
outputs for classify and query, PML and MS, across engines and read shapes."""
import numpy as np
import pytest

from spumoni_tpu.native import build_raw_index
from spumoni_tpu.index.format import build_dense_index
from spumoni_tpu.io.fastx_batch import PackedReads


def _mk_packed(reads):
    buf = np.frombuffer(b"".join(reads), np.uint8)
    offs = np.zeros(len(reads) + 1, np.int64)
    np.cumsum([len(r) for r in reads], out=offs[1:])
    return PackedReads([f"r{i}" for i in range(len(reads))], buf, offs)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    text = rng.choice(acgt, size=60_000)
    raw = build_raw_index(text)
    dense = build_dense_index(raw, text=text, with_samples=True)
    reads = []
    for i in range(37):
        n = int(rng.integers(16, 700))
        if i % 2 == 0:
            st = int(rng.integers(0, len(text) - n))
            rd = text[st:st + n].copy()
            mut = rng.random(n) < 0.05
            rd[mut] = rng.choice(acgt, size=int(mut.sum()))
        else:
            rd = rng.choice(acgt, size=n)
        if i % 9 == 0:  # reads with N exercise alphabet extension
            rd[: n // 4] = ord("N")
        reads.append(rd.tobytes())
    return dense, reads


def _engine(dense, mode, engine_kind, use_doc=False):
    from spumoni_tpu.engine.scan_engine import ScanEngine

    if engine_kind == "layered":
        from spumoni_tpu.engine.layered import build_layered
        arrays, meta, host = build_layered(dense)
    elif engine_kind == "bits":
        from spumoni_tpu.engine.blockbits import build_blockbits
        arrays, meta, host = build_blockbits(dense)
    else:
        from spumoni_tpu.engine.occblock import build_occblock
        arrays, meta, host = build_occblock(dense)
    return ScanEngine(arrays, meta, mode=mode, use_doc=use_doc, host=host)


@pytest.mark.parametrize("mode,engine_kind", [
    ("pml", "layered"), ("pml", "bits"), ("pml", "occ"),
    ("ms", "layered"), ("ms", "occ"),
])
def test_staged_query_matches_bytes(setup, mode, engine_kind):
    dense, reads = setup
    eng = _engine(dense, mode, engine_kind)
    want = eng.query(reads)
    staged = eng.stage(_mk_packed(reads))
    got = eng.query_staged(staged)
    assert set(got) == set(want)
    for f in want:
        for i in range(len(reads)):
            assert (np.asarray(got[f][i]) == np.asarray(want[f][i])).all(), \
                (mode, engine_kind, f, i)


@pytest.mark.parametrize("mode,engine_kind", [
    ("pml", "layered"), ("pml", "bits"), ("ms", "layered"),
])
def test_staged_classify_matches_bytes(setup, mode, engine_kind):
    dense, reads = setup
    eng = _engine(dense, mode, engine_kind)
    want = eng.classify(reads, 150, 5)
    staged = eng.stage(_mk_packed(reads))
    got = eng.classify_staged(staged, 150, 5)
    for f in ("found", "above", "below", "sum_maxes"):
        assert (got[f] == want[f]).all(), (mode, engine_kind, f)


def test_staged_small_lane_groups(setup):
    """max_lanes smaller than the batch: multiple groups per bucket."""
    dense, reads = setup
    eng = _engine(dense, "pml", "bits")
    want = eng.classify(reads, 150, 5)
    staged = eng.stage(_mk_packed(reads), max_lanes=8)
    got = eng.classify_staged(staged, 150, 5)
    for f in ("found", "above", "below", "sum_maxes"):
        assert (got[f] == want[f]).all()


def test_staged_long_reads_fallback(setup):
    """Reads longer than the chunked-state width route through the bytes
    path inside the staged API and still agree."""
    dense, _ = setup
    rng = np.random.default_rng(5)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    reads = [rng.choice(acgt, size=n).tobytes()
             for n in (100, 5000, 9000, 64)]
    eng = _engine(dense, "pml", "layered")
    eng.chunk = 4096
    want = eng.query(reads)
    got = eng.query_staged(eng.stage(_mk_packed(reads)))
    for i in range(len(reads)):
        assert (np.asarray(got["lengths"][i])
                == np.asarray(want["lengths"][i])).all()


def test_staged_empty_read_raises(setup):
    dense, _ = setup
    eng = _engine(dense, "pml", "layered")
    p = PackedReads(["a", "b"], np.frombuffer(b"ACGT", np.uint8),
                    np.array([0, 4, 4], np.int64))
    with pytest.raises(ValueError, match="empty after digestion"):
        eng.stage(p)


def test_seg_expand_matches_repeat():
    """_seg_expand (the np.repeat replacement — this numpy's repeat is ~50x
    slow past 1e7 elements) must match np.repeat exactly, including
    zero-length segments at the start/middle/end."""
    from spumoni_tpu.engine.scan_engine import _seg_expand

    rng = np.random.default_rng(0)
    for _ in range(20):
        n = int(rng.integers(1, 40))
        lens = rng.integers(0, 6, size=n)
        vals = rng.integers(-50, 50, size=n)
        total = int(lens.sum())
        got = _seg_expand(vals, lens, total)
        assert np.array_equal(got, np.repeat(vals, lens)), (vals, lens)
    assert _seg_expand(np.array([3, 7]), np.array([0, 0]), 0).size == 0
