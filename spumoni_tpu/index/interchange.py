"""Reference-format index interchange.

The reference's query structures are constructed from five intermediate
files written by pfp_thresholds (SURVEY.md §2.3) and read with fixed binary
layouts:

  <ref>.bwt.heads   one raw byte per BWT run (the run's character);
                    chars <= 1 are coerced to TERMINATOR=1 at LOAD time
                    (/root/reference/include/ms_rle_string.hpp:63-68)
  <ref>.bwt.len     one 5-byte little-endian unsigned run length per run
                    (ms_rle_string.hpp:55-63)
  <ref>.thr_pos     one 5-byte LE absolute threshold position per run
                    (/root/reference/include/thresholds_ds.hpp:393-420)
  <ref>.ssa         per run: (5-byte LE position, 5-byte LE SA[run start]);
  <ref>.esa         per run: (5-byte LE position, 5-byte LE SA[run end]).
                    The reader consumes only the second value of each pair
                    and maps 0 -> n-1, v -> v-1
                    (/root/reference/src/compute_ms_pml.cpp:404-439)

Exporting these lets a reference `spumoni build` resume from our build
products; importing lets a reference-built index run on this framework and
is the byte-level parity bridge (the reference binary itself cannot be
compiled in this environment). See FORMATS.md.
"""

from __future__ import annotations

import os

import numpy as np

from ..native import RawIndex

_B5 = (1 << 40) - 1


def _write_u40(f, values: np.ndarray) -> None:
    """5-byte little-endian unsigned ints (THRBYTES/SSABYTES = 5,
    /root/reference/include/common.hpp:59-60)."""
    v = np.asarray(values, dtype=np.uint64)
    assert (v <= _B5).all(), "value exceeds 5-byte range"
    raw = v.astype("<u8").view(np.uint8).reshape(-1, 8)[:, :5]
    f.write(np.ascontiguousarray(raw).tobytes())


def _read_u40(path: str) -> np.ndarray:
    raw = np.fromfile(path, dtype=np.uint8)
    if raw.size % 5:
        raise ValueError(f"{path}: size {raw.size} not a multiple of 5 "
                         f"(SSABYTES/THRBYTES)")
    raw = raw.reshape(-1, 5)
    out = np.zeros((raw.shape[0], 8), dtype=np.uint8)
    out[:, :5] = raw
    return out.view("<u8").reshape(-1).astype(np.int64)


def export_reference_index(raw: RawIndex, prefix: str) -> list[str]:
    """Writes <prefix>.bwt.heads/.bwt.len/.thr_pos/.ssa/.esa from a built
    RawIndex. The .ssa/.esa left values are the run start/end BWT positions
    (informational — the reference reader skips them). Returns the paths."""
    n, r = raw.n, raw.r
    heads = np.asarray(raw.run_heads, dtype=np.uint8)
    starts = np.asarray(raw.run_starts, dtype=np.int64)
    ends = np.concatenate([starts[1:], [n]]) - 1
    paths = []

    p = prefix + ".bwt.heads"
    with open(p, "wb") as f:
        f.write(heads.tobytes())
    paths.append(p)

    p = prefix + ".bwt.len"
    with open(p, "wb") as f:
        _write_u40(f, np.diff(np.concatenate([starts, [n]])))
    paths.append(p)

    p = prefix + ".thr_pos"
    with open(p, "wb") as f:
        _write_u40(f, np.asarray(raw.thresholds, dtype=np.int64))
    paths.append(p)

    for ext, pos, samp in (
            (".ssa", starts, np.asarray(raw.samples_start, np.int64)),
            (".esa", ends, np.asarray(raw.samples_last, np.int64))):
        p = prefix + ext
        pairs = np.empty((r, 2), dtype=np.int64)
        pairs[:, 0] = pos
        pairs[:, 1] = samp
        with open(p, "wb") as f:
            _write_u40(f, pairs.reshape(-1))
        paths.append(p)
    return paths


def import_reference_index(prefix: str, with_samples: bool = True) -> RawIndex:
    """Reads the reference's five intermediate files into a RawIndex
    (raw SA sample values: the v -> v-1 / 0 -> n-1 convention of
    compute_ms_pml.cpp:431-434 is applied downstream by
    index.format.build_dense_index, exactly like the reference loader)."""
    heads = np.fromfile(prefix + ".bwt.heads", dtype=np.uint8)
    # terminator coercion happens at load in the reference
    # (ms_rle_string.hpp:66-68)
    heads = np.where(heads <= 1, 1, heads).astype(np.uint8)
    lens = _read_u40(prefix + ".bwt.len")
    if len(lens) != len(heads):
        raise ValueError(f"{prefix}: .bwt.heads has {len(heads)} runs but "
                         f".bwt.len has {len(lens)}")
    n = int(lens.sum())
    r = len(heads)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    thr = _read_u40(prefix + ".thr_pos")
    if len(thr) != r:
        raise ValueError(f"{prefix}.thr_pos holds {len(thr)} thresholds "
                         f"for {r} runs")
    ss = sl = np.zeros(r, dtype=np.int64)
    if with_samples and os.path.exists(prefix + ".ssa"):
        ssa = _read_u40(prefix + ".ssa").reshape(-1, 2)
        esa = _read_u40(prefix + ".esa").reshape(-1, 2)
        if len(ssa) != r or len(esa) != r:
            raise ValueError(f"{prefix}.ssa/.esa do not hold {r} pairs")
        ss, sl = ssa[:, 1].copy(), esa[:, 1].copy()
    return RawIndex(n, heads, starts, thr, ss, sl)
