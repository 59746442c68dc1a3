"""Minimizer digestion schemes.

Re-implements the two digestion modes of /root/reference/src/spumoni.cpp:294-342:

  * promotion scheme (`-m`): each window's minimizer k-mer is hashed to one
    byte, consecutive duplicate minimizer values are collapsed
    (homopolymer compression), and values 0-2 are remapped +3 to reserve the
    BWT/PFP special symbols (spumoni.cpp:311);
  * DNA-letter scheme (`-a`): the lexicographically smallest k-mer
    (bonsai score::Lex) of each window is re-expanded to its ACGT text, with
    consecutive duplicates collapsed (spumoni.cpp:321-342).

Deviation note: the reference delegates hashing to the bonsai library's
RollingHasher (a third-party dependency fetched at configure time). We use our
own deterministic k-mer hash (64-bit splitmix over the 2-bit encoding) —
digested *values* therefore differ from bonsai's, but the scheme, alphabet
handling and compression semantics match, and build/run use the identical
digestion so indexes are self-consistent.
"""

from __future__ import annotations

import numpy as np

_ENC = np.full(256, 0, dtype=np.uint64)
for i, b in enumerate(b"ACGT"):
    _ENC[b] = i
_ENC_VALID = np.zeros(256, dtype=bool)
for b in b"ACGT":
    _ENC_VALID[b] = True

_DEC = np.frombuffer(b"ACGT", dtype=np.uint8)


def _kmer_codes(seq: np.ndarray, k: int) -> np.ndarray:
    """2-bit packed codes of all k-mers (non-ACGT bases encode as A)."""
    n = len(seq)
    if n < k:
        return np.zeros(0, dtype=np.uint64)
    codes = _ENC[seq]
    out = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        out |= codes[j:n - k + 1 + j] << np.uint64(2 * (k - 1 - j))
    return out


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) \
        & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) \
        & np.uint64(0xFFFFFFFFFFFFFFFF)
    return x ^ (x >> np.uint64(31))


def _window_min(values: np.ndarray, w: int) -> np.ndarray:
    """Per-window minimum over sliding windows of w values (leftmost min)."""
    nw = len(values) - w + 1
    if nw <= 0:
        return np.zeros(0, dtype=values.dtype)
    mat = np.lib.stride_tricks.sliding_window_view(values, w)
    return mat.min(axis=1)


def _hp_compress(vals: np.ndarray) -> np.ndarray:
    """Drops consecutive duplicates (spumoni.cpp:306,334)."""
    if len(vals) == 0:
        return vals
    keep = np.ones(len(vals), dtype=bool)
    keep[1:] = vals[1:] != vals[:-1]
    return vals[keep]


def digest_promotion(seq: bytes, k: int = 4, w: int = 11) -> bytes:
    """Alphabet-promotion digestion: one byte per (compressed) window minimizer."""
    arr = np.frombuffer(bytes(seq), dtype=np.uint8)
    codes = _kmer_codes(arr, k)
    if len(codes) == 0:
        return b""
    hashes = (_splitmix64(codes) & np.uint64(0xFF)).astype(np.uint8)
    mins = _window_min(hashes, w) if len(hashes) >= w else hashes[:0]
    if len(hashes) and len(hashes) < w:
        # window larger than sequence: single window over what exists
        mins = np.array([hashes.min()], dtype=np.uint8)
    mins = _hp_compress(mins)
    # reserve 0,1,2 for the PFP/BWT specials (spumoni.cpp:311)
    out = np.where(mins > 2, mins, mins + 3).astype(np.uint8)
    return out.tobytes()


def digest_dna(seq: bytes, k: int = 4, w: int = 11) -> bytes:
    """DNA-letter digestion: lexicographically smallest k-mer per window,
    expanded back to ACGT text."""
    arr = np.frombuffer(bytes(seq), dtype=np.uint8)
    codes = _kmer_codes(arr, k)
    if len(codes) == 0:
        return b""
    if len(codes) >= w:
        mins = _window_min(codes, w)
    else:
        mins = np.array([codes.min()], dtype=np.uint64)
    mins = _hp_compress(mins)
    if len(mins) == 0:
        return b""
    # expand each code back to its k-mer string
    out = np.zeros((len(mins), k), dtype=np.uint8)
    for j in range(k):
        out[:, j] = _DEC[((mins >> np.uint64(2 * (k - 1 - j))) & np.uint64(3)).astype(np.int64)]
    return out.reshape(-1).tobytes()


def digest(seq: bytes, use_promotions: bool, use_dna_letters: bool,
           k: int = 4, w: int = 11) -> bytes:
    if use_promotions:
        return digest_promotion(seq, k, w)
    if use_dna_letters:
        return digest_dna(seq, k, w)
    return bytes(seq)
