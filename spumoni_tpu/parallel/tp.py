"""ICI-sharded index ("tensor parallel") querying — SURVEY §2.2.

The reference's index always fits host RAM (sdsl structures, loaded whole in
`pml_t`/`ms_t`, compute_ms_pml.cpp:694-838). On TPU the packed `fields` table
of a human-pangenome index (r ≈ 1e8 runs × 8 slots × 8 B ≈ 6.4 GB, plus text
for MS mode) can exceed one chip's HBM — the TPU-native answer is to shard
the dominant table by rows over an ICI mesh axis and turn each probe into an
owner-masked local gather + `psum` (the all-to-all row exchange pattern).

Implemented with `shard_map` rather than pjit sharding constraints so the
per-device memory is GUARANTEED to be the shard (XLA's SPMD partitioner may
lower a gather into a row-sharded table as a full all-gather of the operand,
which silently reinstates the replicated footprint).

Mesh layout: 2-D ("data", "model") — read lanes shard over "data", the
`fields` table shards over "model", and every lane's scan carry stays
replicated along "model" (the psum keeps all model shards in lockstep).
Bandwidth cost: one [B_local, G·W] psum per scan step over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import inspect

try:  # JAX >= 0.4.35
    from jax import shard_map
except ImportError:  # pragma: no cover - older JAX
    from jax.experimental.shard_map import shard_map

# Older shard_map spells the replication-check kwarg `check_rep`.
_SM_CHECK_KW = ("check_vma"
                if "check_vma" in inspect.signature(shard_map).parameters
                else "check_rep")

from ..engine.layered import F_START, LayeredArrays, LayeredMeta
from .mesh import _fused_classify_core, replicate_index
from ..utils import encode_rows, present_chars


def make_tp_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_model, (len(devices), n_data, n_model)
    if devices is not None and len(devices) != n_data * n_model:
        devices = devices[:n_data * n_model]
    try:
        # Physical placement: the per-step [B_local, G*W] psum rides the
        # `model` axis every scan step, so that axis must map to
        # ICI-adjacent chips. create_device_mesh solves the assignment from
        # the device coordinates; a naive reshape of jax.devices() does not.
        from jax.experimental import mesh_utils
        grid = mesh_utils.create_device_mesh((n_data, n_model),
                                             devices=devices)
    except Exception:  # virtual/CPU devices without coords
        grid = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def shard_index_tp(arrays: LayeredArrays, meta: LayeredMeta, mesh: Mesh,
                   model_axis: str = "model"):
    """Places the index on a 2-D mesh with `fields` row-sharded over
    `model_axis` (rows padded to a multiple of the axis size) and every other
    array replicated. Returns (arrays, meta with tp_axis set)."""
    S = mesh.shape[model_axis]
    f = np.asarray(arrays.fields)
    rows = f.shape[0]
    if rows % S:
        pad = -(-rows // S) * S - rows
        # Pad with the same sentinel pattern as build_layered (layered.py):
        # every padded run slot gets F_START = n (an unreachable start), rest
        # zero.  The probe row is always <= r < original rp so pad rows are
        # never gathered today; the sentinel keeps them inert even if that
        # invariant ever loosens (a zero START would parse as a valid run
        # at position 0).
        padblock = np.zeros((pad, f.shape[1]), f.dtype)
        width = meta.width
        padblock[:, F_START::width] = int(np.asarray(arrays.n))
        f = np.concatenate([f, padblock], axis=0)
    fields = jax.device_put(
        jnp.asarray(f), NamedSharding(mesh, P(model_axis, None)))
    rest = replicate_index(arrays._replace(fields=None), mesh)
    return (rest._replace(fields=fields),
            meta._replace(tp_axis=model_axis))


def shard_index_tp_bits(arrays, meta, mesh: Mesh, model_axis: str = "model"):
    """Block-bits (engine v4) variant: `bblocks` row-sharded over
    `model_axis` (zero-padded to a multiple of the axis size — pad rows map
    to positions >= n and are never gathered), everything else replicated.
    One [B, W] psum per step reassembles the single gathered row — v4's
    one-probe step makes this the cheap TP path (VERDICT r3 #4)."""
    S = mesh.shape[model_axis]
    bb = np.asarray(arrays.bblocks)
    rows = bb.shape[0]
    if rows % S:
        pad = -(-rows // S) * S - rows
        bb = np.concatenate(
            [bb, np.zeros((pad, bb.shape[1]), bb.dtype)], axis=0)
    bblocks = jax.device_put(
        jnp.asarray(bb), NamedSharding(mesh, P(model_axis, None)))
    rest = replicate_index(arrays._replace(bblocks=None), mesh)
    return (rest._replace(bblocks=bblocks),
            meta._replace(tp_axis=model_axis))


class TpPmlClassifier:
    """PML classification with the index sharded over ICI (layered or
    block-bits engine).

    Same classify-only contract as ShardedPmlClassifier(want_values=False):
    per-read (found, above, below, sum_maxes) summaries leave the mesh."""

    def __init__(self, arrays, meta, mesh: Mesh,
                 bin_width: int, max_value_thr: int, host=None,
                 data_axis: str = "data", model_axis: str = "model"):
        self.bits = hasattr(arrays, "bblocks")
        assert self.bits or hasattr(arrays, "fields"), \
            "ICI index sharding: layered or block-bits engines only"
        self.mesh = mesh
        self.data_axis, self.model_axis = data_axis, model_axis
        self.host = host
        self.bin_width = bin_width
        self.max_value_thr = max_value_thr
        if self.bits:
            self.arrays, self.meta = shard_index_tp_bits(arrays, meta, mesh,
                                                         model_axis)
            self.n_slots = int(self.arrays.bblocks.shape[0])
        else:
            self.arrays, self.meta = shard_index_tp(arrays, meta, mesh,
                                                    model_axis)
            # Total run SLOTS including shard-pad rows (not the logical run
            # count r) — used only to size probe clamping in the step fn;
            # pad slots carry the inert F_START=n sentinel.
            self.n_slots = int(self.arrays.fields.shape[0]) * self.meta.group
        self.n_data = mesh.shape[data_axis]
        self._fn_cache = {}

    def _classify_fn(self, planes_present: bool):
        key = planes_present
        if key in self._fn_cache:
            return self._fn_cache[key]
        meta, r, bw = self.meta, self.n_slots, self.bin_width
        da, ma = self.data_axis, self.model_axis

        def inner(ix, rev, lens, thr, planes):
            return _fused_classify_core(ix, rev, lens, thr, meta, "pml",
                                        r, bw, planes)

        ix_specs = jax.tree_util.tree_map(lambda _: P(), self.arrays)
        if self.bits:
            ix_specs = ix_specs._replace(bblocks=P(ma, None))
        else:
            ix_specs = ix_specs._replace(fields=P(ma, None))
        fn = jax.jit(shard_map(
            inner, mesh=self.mesh,
            in_specs=(ix_specs, P(da, None), P(da), P(), P()),
            out_specs=(P(da), P(da), P(da), P(da)),
            **{_SM_CHECK_KW: False}))
        self._fn_cache[key] = fn
        return fn

    def classify(self, reads, pad_to: int = 128):
        nreads = len(reads)
        maxm = max((len(r) for r in reads), default=1)
        L = pad_to
        while L < maxm:
            L *= 2
        B = max(self.n_data, 1 << max(0, (nreads - 1)).bit_length())
        if B % self.n_data:
            B = ((B // self.n_data) + 1) * self.n_data
        _, rev, lens = encode_rows(reads, B, L, want_fwd=False)

        planes = None
        if self.host is not None:
            alphabet = tuple(sorted(
                set(self.host.index_chars)
                | set(int(x) for x in present_chars(rev)) | {0}))
            rev = self.host.rank_map(alphabet)[rev]
            planes = replicate_index(
                self.host.planes_for_alphabet(alphabet), self.mesh)

        rev_d = jax.device_put(
            jnp.asarray(rev), NamedSharding(self.mesh, P(self.data_axis, None)))
        lens_d = jax.device_put(
            jnp.asarray(lens), NamedSharding(self.mesh, P(self.data_axis)))
        thr = jnp.asarray(self.max_value_thr)
        found, above, below, sums = self._classify_fn(planes is not None)(
            self.arrays, rev_d, lens_d, thr, planes)
        found = np.asarray(found)[:nreads]
        return {
            "found": found,
            "above": np.asarray(above)[:nreads],
            "below": np.asarray(below)[:nreads],
            "sum_maxes": np.asarray(sums)[:nreads],
            "total_found": int(found.sum()),
        }
