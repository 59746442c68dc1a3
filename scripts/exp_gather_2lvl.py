#!/usr/bin/env python
"""Attack the >=2^18-row gather cliff with two-level addressing (PERF lever 7).

Round-1/2 facts (exp_gather*.py): a dependent-chain row gather from a table
with >= 2^18 ROWS costs ~13.6 ns/lane/step on v5e vs ~4 ns under the cliff,
independent of row bytes (<=256 B) and of index locality — it looks like an
XLA gather-lowering artifact keyed on the operand's ROW COUNT, not HBM
physics. Hypothesis: reshaping the same bytes to [R/S, S, W] (or
[R/S, S*W]) and addressing with TWO index components (hi = idx >> logS,
lo = idx & (S-1)) keeps the operand's major dimension under the cliff and
buys back the fast path while gathering the exact same W-word row.

Variants (same bytes, same dependent chase):
  base1d   jnp.take(table[R, W], idx)                      — the cliff victim
  ds2d     vmap(dynamic_slice)(table[R/S, S*W], (hi, lo*W), (1, W))
  g3d      vmap(table[R/S, S, W].__getitem__)((hi, lo))     — 2-dim gather

Run:  python scripts/exp_gather_2lvl.py [R W B] [--variants base1d,ds2d,g3d]
                                        [--S 64] [--small]
"""
import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

L = 64  # chase length (steps)


def _sync(x):
    np.asarray(x.reshape(-1)[:8])  # forced d2h (block_until_ready no-op on axon)


def device_put_chunked(a, max_mb=128):
    step = max(1, (max_mb << 20) // max(1, a.nbytes // max(1, a.shape[0])))
    if a.shape[0] <= step:
        out = jax.device_put(jnp.asarray(a))
        _sync(out)
        return out
    parts = []
    for i in range(0, a.shape[0], step):
        parts.append(jax.device_put(np.ascontiguousarray(a[i:i + step])))
        _sync(parts[-1])
    out = jnp.concatenate(parts, axis=0)
    _sync(out)
    return out


def make_chase_base1d(R, W):
    def chase(table, idx0):
        def body(t, idx):
            g = jnp.take(table, idx, axis=0)            # (B, W)
            nxt = g.sum(axis=1).astype(jnp.int32) + t
            return jax.lax.rem(jnp.abs(nxt), R).astype(jnp.int32)
        return jax.lax.fori_loop(0, L, body, idx0)
    return jax.jit(chase)


def make_chase_ds2d(R, W, S):
    Rhi = R // S
    logS = int(np.log2(S))

    def one(tab2, hi, lo):
        return jax.lax.dynamic_slice(tab2, (hi, lo * W), (1, W))[0]

    def chase(tab2, idx0):
        def body(t, idx):
            hi, lo = idx >> logS, idx & (S - 1)
            g = jax.vmap(one, in_axes=(None, 0, 0))(tab2, hi, lo)
            nxt = g.sum(axis=1).astype(jnp.int32) + t
            return jax.lax.rem(jnp.abs(nxt), R).astype(jnp.int32)
        return jax.lax.fori_loop(0, L, body, idx0)
    return jax.jit(chase)


def make_chase_g3d(R, W, S):
    logS = int(np.log2(S))

    def chase(tab3, idx0):
        def body(t, idx):
            hi, lo = idx >> logS, idx & (S - 1)
            g = tab3[hi, lo]                            # (B, W) 2-dim gather
            nxt = g.sum(axis=1).astype(jnp.int32) + t
            return jax.lax.rem(jnp.abs(nxt), R).astype(jnp.int32)
        return jax.lax.fori_loop(0, L, body, idx0)
    return jax.jit(chase)


def bench(fn, *args, reps=5):
    _sync(fn(*args))            # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        _sync(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--R", type=int, default=4_194_304)   # scale-config rows
    ap.add_argument("--W", type=int, default=100)         # P=512 pack=2 width
    ap.add_argument("--B", type=int, default=131072)
    ap.add_argument("--S", type=int, default=64)
    ap.add_argument("--variants", default="base1d,ds2d,g3d")
    args = ap.parse_args()
    R, W, B, S = args.R, args.W, args.B, args.S
    assert R % S == 0

    rng = np.random.default_rng(0)
    table_h = rng.integers(0, 2**31, size=(R, W)).astype(np.uint32)
    idx0 = jax.device_put(jnp.asarray(
        rng.integers(0, R, size=(B,)).astype(np.int32)))
    print(f"R={R} W={W} B={B} S={S} table={R*W*4/1e9:.2f} GB", flush=True)

    t0 = time.time()
    table = device_put_chunked(table_h)
    print(f"h2d done ({time.time()-t0:.0f} s)", flush=True)

    for v in args.variants.split(","):
        if v == "base1d":
            f, tab = make_chase_base1d(R, W), table
        elif v == "ds2d":
            f, tab = make_chase_ds2d(R, W, S), table.reshape(R // S, S * W)
        elif v == "g3d":
            f, tab = make_chase_g3d(R, W, S), table.reshape(R // S, S, W)
        else:
            raise SystemExit(f"unknown variant {v}")
        t = bench(f, tab, idx0)
        ns = t / L / B * 1e9
        print(f"{v:8s} S={S:4d}: {t/L*1e6:8.1f} us/step  "
              f"{ns:6.2f} ns/lane/step", flush=True)


if __name__ == "__main__":
    main()
