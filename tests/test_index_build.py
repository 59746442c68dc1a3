"""Native index builder vs brute-force oracles (SA, BWT runs, thresholds,
SA samples)."""

import numpy as np

from spumoni_tpu.native import build_raw_index, suffix_array
from spumoni_tpu.engine.oracle import NaiveRLBWT, naive_suffix_array

from conftest import rand_dna


def test_suffix_array_matches_naive(rng):
    for _ in range(15):
        n = int(rng.integers(2, 150))
        text = rand_dna(rng, n)
        sa = suffix_array(np.frombuffer(text, np.uint8))
        assert list(sa) == naive_suffix_array(text)


def test_suffix_array_general_bytes(rng):
    # arbitrary bytes >= 2 (general-text mode)
    for _ in range(10):
        n = int(rng.integers(2, 120))
        text = rng.integers(2, 256, size=n).astype(np.uint8)
        sa = suffix_array(text)
        assert list(sa) == naive_suffix_array(text.tobytes())


def test_raw_index_matches_naive(rng):
    for _ in range(15):
        n = int(rng.integers(2, 150))
        text = rand_dna(rng, n)
        raw = build_raw_index(np.frombuffer(text, np.uint8))
        nv = NaiveRLBWT(text)
        assert raw.n == nv.n
        assert list(raw.run_starts) == nv.run_starts
        assert np.array_equal(raw.thresholds, nv.thresholds)
        conv = lambda v: np.where(v > 0, v - 1, raw.n - 1)
        assert np.array_equal(conv(raw.samples_start), nv.samples_start)
        assert np.array_equal(conv(raw.samples_last), nv.samples_last)
        # run heads should be the coerced BWT at run starts
        assert bytes(raw.run_heads) == bytes(
            nv.bwt[s] for s in nv.run_starts)


def test_rejects_reserved_bytes():
    import pytest
    with pytest.raises(ValueError):
        build_raw_index(np.array([65, 0, 65], dtype=np.uint8))
    with pytest.raises(ValueError):
        build_raw_index(np.array([65, 1, 65], dtype=np.uint8))
