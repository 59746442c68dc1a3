"""Device-resident index arrays for the lockstep query kernels.

The arrays are a pytree (NamedTuple) so query functions can take them as jit
arguments and be sharded with pjit/shard_map. Position/rank arithmetic uses
int32 when the BWT length fits (n < 2^31), int64 otherwise (human-genome scale
with reverse complement needs 64-bit — see SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class IndexArrays(NamedTuple):
    F: jnp.ndarray          # [256]
    cnt: jnp.ndarray        # [256]
    char_off: jnp.ndarray   # [257]
    c_start: jnp.ndarray    # [r]
    c_len: jnp.ndarray      # [r]
    c_cum: jnp.ndarray      # [r]
    c_thr: jnp.ndarray      # [r]
    c_ssamp: Optional[jnp.ndarray]   # [r] or None (PML-only index)
    c_esamp: Optional[jnp.ndarray]
    c_sdoc: Optional[jnp.ndarray]
    c_edoc: Optional[jnp.ndarray]
    text: Optional[jnp.ndarray]      # [n-1] u8
    n: jnp.ndarray                   # scalar
    last_run_sample: jnp.ndarray     # scalar, raw SA[n-1]
    last_run_edoc: jnp.ndarray       # scalar
    first_run_sdoc: jnp.ndarray      # scalar


class IndexMeta(NamedTuple):
    """Static (hashable) companion config for jit."""
    bsearch_iters: int
    dtype: str            # 'int32' | 'int64'
    has_samples: bool
    has_doc: bool
    has_text: bool


def to_device_arrays(idx, want_samples: bool | None = None,
                     want_doc: bool | None = None,
                     want_text: bool | None = None):
    """DenseIndex (numpy) -> (IndexArrays on device, IndexMeta)."""
    if want_samples is None:
        want_samples = idx.c_ssamp is not None
    if want_doc is None:
        want_doc = idx.c_sdoc is not None
    if want_text is None:
        want_text = idx.text is not None

    dtype = np.int32 if idx.n < 2**31 - 2 else np.int64
    runs_per_char = np.diff(np.asarray(idx.char_off))
    max_runs = int(runs_per_char.max()) if idx.r else 1
    iters = max(1, math.ceil(math.log2(max_runs + 1)))

    # Pad the run tables to a power-of-two length so differently-sized
    # indexes share compiled kernels (array shapes are part of the jit key).
    # Padded entries sit past char_off[256] and are never selected by the
    # binary search; c_start pads with n so a clipped gather can never
    # produce a false `pos >= start` hit.
    rp = max(1, 1 << (int(idx.r) - 1).bit_length())

    def cast(a, pad_value=0):
        a = np.asarray(a).astype(dtype)
        if a.ndim == 1 and a.shape[0] == idx.r and rp != idx.r:
            a = np.concatenate(
                [a, np.full(rp - idx.r, pad_value, dtype=dtype)])
        return jnp.asarray(a)

    text = None
    if want_text and idx.text is not None:
        t = np.asarray(idx.text, dtype=np.uint8)
        tp = max(1, 1 << (len(t) - 1).bit_length())
        if tp != len(t):
            t = np.concatenate([t, np.zeros(tp - len(t), dtype=np.uint8)])
        text = jnp.asarray(t)

    arrays = IndexArrays(
        F=cast(idx.F), cnt=cast(idx.cnt), char_off=cast(idx.char_off),
        c_start=cast(idx.c_start, pad_value=idx.n),
        c_len=cast(idx.c_len), c_cum=cast(idx.c_cum),
        c_thr=cast(idx.c_thr),
        c_ssamp=cast(idx.c_ssamp) if want_samples else None,
        c_esamp=cast(idx.c_esamp) if want_samples else None,
        c_sdoc=cast(idx.c_sdoc) if want_doc else None,
        c_edoc=cast(idx.c_edoc) if want_doc else None,
        text=text,
        n=jnp.asarray(np.asarray(idx.n).astype(dtype)),
        last_run_sample=jnp.asarray(np.asarray(idx.last_run_sample).astype(dtype)),
        last_run_edoc=jnp.asarray(np.asarray(idx.last_run_edoc).astype(dtype)),
        first_run_sdoc=jnp.asarray(np.asarray(idx.first_run_sdoc).astype(dtype)),
    )
    meta = IndexMeta(bsearch_iters=iters, dtype=np.dtype(dtype).name,
                     has_samples=want_samples, has_doc=want_doc,
                     has_text=want_text and idx.text is not None)
    return arrays, meta
