#!/usr/bin/env python
"""Ablation harness for the layered PML step on the real chip.

Replicates the fused-classify scan structure with toggles:
  ablate=root|levels|fields   remove a probe (semantics broken, timing valid)
  grouped=1                   fields as [rp/G, G*W] wide rows + in-row select
Usage: python scripts/exp_step.py [B=65536] [ablate=...] [grouped=1]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    cfg = dict(B=65536, L=1024, reps=3, ablate="", grouped=0, G=8)
    for a in sys.argv[1:]:
        k, v = a.split("=")
        cfg[k] = type(cfg[k])(v)
    B, L, G = cfg["B"], cfg["L"], cfg["G"]

    raw, text, rng = bench.get_index()

    import jax
    import jax.numpy as jnp
    from spumoni_tpu.index.format import build_dense_index
    from spumoni_tpu.engine import layered

    dense = build_dense_index(raw)
    arrays, meta, host = layered.build_layered(dense)
    D, NODE = meta.depth, meta.node
    W = meta.width

    reads = bench.make_reads(rng, text, B, L)
    rev = np.ascontiguousarray(reads[:, ::-1])
    alphabet = tuple(sorted(set(host.index_chars) | {0}))
    planes = host.planes_for_alphabet(alphabet)
    rev = host.rank_map(alphabet)[rev]

    fields_g = None
    if cfg["grouped"]:
        f = np.asarray(arrays.fields)          # [rp, W]
        rp = f.shape[0]
        fields_g = jnp.asarray(f.reshape(rp // G, G * W))

    ab = cfg["ablate"]

    @jax.jit
    def run(rev_d, fields, fields_grp):
        dt = jnp.int32
        pos0 = jnp.full((B,), arrays.n - 1, dtype=dt)
        len0 = jnp.zeros((B,), dtype=dt)
        acc0 = jnp.zeros((B,), dtype=dt)

        def step(carry, ch):
            pos, length, acc = carry
            c = ch.astype(dt)
            mats = planes
            sigma = mats[0].shape[0]
            if ab == "root":
                cm = jnp.zeros((B, 16 + NODE), dtype=dt) + c[:, None]
            else:
                onehot = (c[:, None] == jnp.arange(sigma, dtype=dt)[None, :]
                          ).astype(jnp.float32)
                accm = jnp.zeros((B, mats[0].shape[1]), dtype=dt)
                for p, plane in enumerate(mats):
                    part = jnp.dot(onehot, plane,
                                   preferred_element_type=jnp.float32)
                    accm = accm + (part.astype(dt) << (8 * p))
                cm = accm
            root_row = cm[:, 16:]
            Fc, cntc, lo0, hi0 = cm[:, 0], cm[:, 1], cm[:, 2], cm[:, 3]

            m = jnp.sum(root_row <= pos[:, None], axis=1).astype(dt)
            dead = m == 0
            rank = jnp.maximum(m - 1, 0)
            if ab != "levels":
                for t in range(D - 2, -1, -1):
                    rows = arrays.levels[t][cm[:, 4 + t] + rank]
                    m = jnp.sum(rows <= pos[:, None], axis=1).astype(dt)
                    rank = rank * NODE + jnp.maximum(m - 1, 0)
            else:
                rank = rank * (NODE ** (D - 1)) + (pos & (NODE ** (D - 1) - 1))
            valid_k = ~dead
            k = lo0 + rank

            rp = fields.shape[0] if fields_grp is None else fields_grp.shape[0] * G
            probe = jnp.clip(jnp.where(valid_k, k + 1, lo0), 0, rp - 1)
            if ab == "fields":
                row = jnp.zeros((B, W), dtype=dt) + probe[:, None]
            elif fields_grp is not None:
                grow = fields_grp[probe // G]          # [B, G*W]
                sub = probe % G
                grow = grow.reshape(B, G, W)
                sel = (jnp.arange(G, dtype=dt)[None, :] == sub[:, None])
                row = jnp.sum(jnp.where(sel[:, :, None], grow, 0),
                              axis=1).astype(dt)
            else:
                row = fields[probe]

            start_k, len_k, cum_k = row[:, 0], row[:, 1], row[:, 2]
            is_match = valid_k & (pos < start_k + len_k)
            rnk = jnp.where(valid_k,
                            cum_k + jnp.minimum(pos - start_k, len_k), 0)
            has_next = jnp.where(valid_k, (rank + 1) < (hi0 - lo0), cntc > 0)
            thr = row[:, 3]
            jump_down = (~is_match) & has_next & (pos >= thr)
            empty = cntc == 0
            new_length = jnp.where(is_match, length + 1, 0)
            new_pos = jnp.where(empty, Fc,
                      jnp.where(is_match | jump_down, Fc + rnk, Fc + rnk - 1))
            new_pos = jnp.clip(new_pos, 0, arrays.n - 1)
            return (new_pos, new_length,
                    jnp.maximum(acc, new_length)), ()

        (pos, length, acc), _ = jax.lax.scan(
            step, (pos0, len0, acc0), rev_d.T)
        return acc[:64]

    rev_d = jax.device_put(jnp.asarray(rev))
    t0 = time.time()
    out = np.asarray(run(rev_d, arrays.fields, fields_g))
    print(f"compile+run {time.time()-t0:.1f}s", flush=True)
    if not ab:
        # sanity: positives (even lanes) should have big maxima
        print("maxPML even/odd:", out[::2].mean(), out[1::2].mean(), flush=True)

    t0 = time.time()
    for _ in range(cfg["reps"]):
        out = run(rev_d, arrays.fields, fields_g)
    np.asarray(out)
    dt = (time.time() - t0) / cfg["reps"]
    print(f"RESULT ablate={ab or 'none'} grouped={cfg['grouped']} B={B}: "
          f"{dt/L*1e6:.0f} us/step  {B/dt:,.0f} reads/s", flush=True)


if __name__ == "__main__":
    main()
