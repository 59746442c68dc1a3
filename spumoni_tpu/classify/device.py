"""Device-side bin-max classification.

The host classifier (binmax.py) is the oracle; this kernel computes the same
windowed maxima for a whole [B, L] batch on device so classification verdicts
can be merged across a mesh with collectives instead of shipping every MS/PML
value to the host. Must produce bit-identical (status, above, below, sum)
per read — tested against binmax.classify.

Window rule (compute_ms_pml.cpp:975-991): fixed bin_width windows; the final
window absorbs a short tail; a read shorter than bin_width is one window.
=> nbins = max(1, m // bin_width), window j covers [j*bw, (j+1)*bw) except the
last which covers [(nbins-1)*bw, m).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("bin_width", "max_bins"))
def classify_batch_kernel(vals: jnp.ndarray, lens: jnp.ndarray,
                          max_value_thr, bin_width: int, max_bins: int):
    """vals: [B, L] MS/PML values in natural order (padding anywhere past
    lens is ignored); lens: [B]. Returns (found [B] bool, above [B],
    below [B], sum_maxes [B])."""
    B, L = vals.shape
    p = jnp.arange(L)
    nbins = jnp.maximum(lens // bin_width, 1)               # [B]
    binid = jnp.minimum(p[None, :] // bin_width, nbins[:, None] - 1)  # [B, L]
    valid = p[None, :] < lens[:, None]

    neg = jnp.full_like(vals, -1)
    above = jnp.zeros((B,), dtype=jnp.int32)
    sum_maxes = jnp.zeros((B,), dtype=vals.dtype)
    for j in range(max_bins):
        sel = jnp.where(valid & (binid == j), vals, neg)
        mx = jnp.max(sel, axis=1)                            # [B]
        has = mx >= 0
        above = above + ((mx >= max_value_thr) & has).astype(jnp.int32)
        sum_maxes = sum_maxes + jnp.where(has, mx, 0)
    below = nbins.astype(jnp.int32) - above
    found = above > below  # above/(above+below) > 0.5 with integer counts
    return found, above, below, sum_maxes


def classify_batch(vals, lens, max_value_thr: int, bin_width: int):
    """Host wrapper; vals [B, L] natural order numpy, lens [B]."""
    import numpy as np
    L = vals.shape[1]
    max_bins = max(1, L // bin_width + (1 if L % bin_width else 0))
    found, above, below, sums = classify_batch_kernel(
        jnp.asarray(vals), jnp.asarray(lens), int(max_value_thr),
        int(bin_width), int(max_bins))
    return (np.asarray(found), np.asarray(above), np.asarray(below),
            np.asarray(sums))
