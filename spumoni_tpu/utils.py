"""Tracing / profiling / observability utilities.

The TPU-era counterpart of the reference's STATUS_LOG/DONE_LOG/TIME_LOG timer
macros (spumoni_main.hpp:46-54), malloc_count heap hooks, and the
*.{ms,pml}_index_stats.txt size accounting (compute_ms_pml.cpp:204-209):

  * phase timers with the same "[tag] msg ... done. (x.xxx sec)" shape
  * an optional JAX profiler trace around any phase (xplane dumps)
  * HBM footprint reporting for device-resident index arrays
"""

from __future__ import annotations

import contextlib
import sys
import time


VERBOSE = True


def log(tag: str, msg: str) -> None:
    if VERBOSE:
        print(f"[{tag}] {msg}", file=sys.stderr, flush=True)


@contextlib.contextmanager
def phase(tag: str, msg: str):
    """STATUS_LOG/DONE_LOG pair (spumoni_main.hpp:46-49)."""
    if VERBOSE:
        print(f"[{tag}] {msg} ... ", file=sys.stderr, end="", flush=True)
    t0 = time.time()
    try:
        yield
    finally:
        if VERBOSE:
            print(f"done.  ({time.time() - t0:.3f} sec)", file=sys.stderr,
                  flush=True)


class PhaseTimer:
    """Accumulates named phase durations; summary() mirrors the reference's
    per-phase build timing output."""

    def __init__(self):
        self.durations: dict[str, float] = {}

    @contextlib.contextmanager
    def track(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.durations[name] = self.durations.get(name, 0.0) + (
                time.time() - t0)

    def summary(self) -> str:
        total = sum(self.durations.values())
        lines = [f"  {name:<30s} {dur:8.3f}s ({100 * dur / max(total, 1e-9):.1f}%)"
                 for name, dur in self.durations.items()]
        lines.append(f"  {'total':<30s} {total:8.3f}s")
        return "\n".join(lines)


@contextlib.contextmanager
def jax_trace(trace_dir: str | None):
    """Wraps a phase in a JAX profiler trace (xplane) when trace_dir is set."""
    if not trace_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def present_chars(a):
    """Distinct byte values present in `a`, as a small int array.

    Replaces np.unique on read batches: np.unique SORTS its input (~2.8 s
    on a 67 MB [B, L] batch — measured as THE e2e host bottleneck), while a
    histogram is O(n) (~50 ms)."""
    import numpy as np
    return np.nonzero(np.bincount(a.reshape(-1), minlength=256))[0]


def encode_rows(reads, B: int, L: int, want_fwd: bool = True):
    """(fwd, rev, lens): [B, L] u8 lockstep rows from byte-string reads.

    fwd[i] = read bytes left-aligned, rev[i] = reversed bytes left-aligned,
    lens[i] = read length; rows past len(reads) stay zero (padding lanes).
    Uniform-length batches — the overwhelmingly common case, since callers
    bucket reads by padded length — take one C-speed join + reshape instead
    of a per-read Python loop (~10x on a 65536x1024 batch)."""
    import numpy as np
    nr = len(reads)
    lens = np.zeros((B,), dtype=np.int64)
    if nr:
        lens[:nr] = np.fromiter((len(r) for r in reads), np.int64, nr)
    fwd = np.zeros((B, L), dtype=np.uint8) if want_fwd else None
    rev = np.zeros((B, L), dtype=np.uint8)
    if nr and lens[0] and (lens[:nr] == lens[0]).all():
        l0 = int(lens[0])
        rows = np.frombuffer(b"".join(bytes(r) for r in reads),
                             np.uint8).reshape(nr, l0)
        if want_fwd:
            fwd[:nr, :l0] = rows
        rev[:nr, :l0] = rows[:, ::-1]
    else:
        for i, rd in enumerate(reads):
            a = np.frombuffer(bytes(rd), dtype=np.uint8)
            lens[i] = len(a)  # byte count, not element count: a non-uint8
            #                   array input must record its BYTE length so
            #                   lens stays consistent with the written rows
            if want_fwd:
                fwd[i, :len(a)] = a
            rev[i, :len(a)] = a[::-1]
    return fwd, rev, lens


def device_put_chunked(a, max_mb: int = 128):
    """device_put in <=max_mb row slices, assembled on device.

    A single >1 GB device_put message hangs the axon TPU tunnel for ~30 min
    (PERF_NOTES.md round 2); h2d was only validated up to ~100 MB messages.
    Each slice is fenced with a tiny d2h read so at most one transfer is in
    flight (block_until_ready does not sync through the tunnel).

    Assembly writes each slice into a DONATED zeros buffer with
    dynamic_update_slice instead of concatenating the parts: concatenate
    holds all parts plus the result (2x the array at peak — an OOM at
    genome scale where a 4.7 GB fields table must coexist with the rest of
    the index), while donation keeps the peak at full + one slice."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    a = np.ascontiguousarray(a)
    row_bytes = max(1, a.nbytes // max(1, a.shape[0]))
    step = max(1, (max_mb << 20) // row_bytes)
    if a.shape[0] <= step:
        out = jax.device_put(jnp.asarray(a))
        np.asarray(out.reshape(-1)[:1])
        return out

    zeros_tail = tuple(np.int32(0) for _ in range(a.ndim - 1))
    upd = jax.jit(
        lambda b, p, i: lax.dynamic_update_slice(b, p, (i,) + zeros_tail),
        donate_argnums=(0,))

    can_fence = a.ndim >= 2 or a.shape[0] < 2**31

    def fence(x):
        # force execution so superseded buffers deallocate before the next
        # transfer (dispatch is async; unfenced updates can stack several
        # full-size live buffers). 1-element d2h; skipped for 1-D arrays of
        # >= 2^31 elements, where ANY slice op fails XLA's x64 index rewrite
        if can_fence:
            np.asarray(x[:1].reshape(-1)[:1])

    buf = jax.device_put(jnp.zeros(a.shape, a.dtype))
    i = 0
    while i < a.shape[0]:
        j = min(i + step, a.shape[0])
        part = jax.device_put(np.ascontiguousarray(a[i:j]))
        np.asarray(part.reshape(-1)[:1])      # fence: one transfer in flight
        buf = upd(buf, part, np.int32(i))
        fence(buf)
        i = j
    return buf


def device_array_footprint(arrays) -> dict[str, int]:
    """Bytes of every device array in a pytree — the HBM analog of the
    index stats files."""
    import jax

    out = {}
    flat, _ = jax.tree_util.tree_flatten_with_path(arrays)
    for path, leaf in flat:
        if hasattr(leaf, "nbytes"):
            out[jax.tree_util.keystr(path)] = int(leaf.nbytes)
    out["__total__"] = sum(v for k, v in out.items() if k != "__total__")
    return out


def hbm_usage() -> dict:
    """Live/peak device memory from the backend, when available."""
    import jax

    try:
        stats = jax.devices()[0].memory_stats()
        return {k: stats[k] for k in
                ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
                if k in stats}
    except Exception:
        return {}
