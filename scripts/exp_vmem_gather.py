#!/usr/bin/env python
"""Microbench: Mosaic tpu.dynamic_gather (VMEM-resident table) vs XLA HBM gather.

Question: can a Pallas kernel with the v4 block-bits table resident in VMEM
beat the XLA row-gather wall (~3.9 ns/lane/step at B=131k)?

Mosaic's lax.gather support is take_along_axis-shaped: operand (R, W),
indices (R, W), out[i, j] = operand[idx[i, j], j]. So one gather call
serves R lanes (each lane's index broadcast across the W columns).
"""
import sys, time, functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, W = 9728, 128          # physical table: 9728 rows x 128 u32 = 4.98 MB
L = 64                    # dependent steps per kernel call


def chase_kernel(table_ref, idx0_ref, out_ref):
    table = table_ref[...]                        # (R, W) u32, VMEM
    idx = idx0_ref[...]                           # (R, W) i32

    def body(t, idx):
        g = jnp.take_along_axis(table, idx, axis=0)          # dynamic gather
        nxt = jnp.bitwise_xor(g.astype(jnp.int32), idx)
        return jax.lax.rem(jnp.abs(nxt), R).astype(jnp.int32)

    out_ref[...] = jax.lax.fori_loop(0, L, body, idx)


def run_pallas(table, idx0):
    f = pl.pallas_call(
        chase_kernel,
        out_shape=jax.ShapeDtypeStruct((R, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return jax.jit(f)(table, idx0)


def xla_chase(table, idx0):
    # Same dependent chain, XLA gather from HBM, 9728 lanes, 128-u32 rows.
    def body(t, idx):
        g = jnp.take(table, idx[:, 0], axis=0)               # (R, W) rows
        nxt = jnp.bitwise_xor(g.astype(jnp.int32), idx)
        return jax.lax.rem(jnp.abs(nxt), R).astype(jnp.int32)
    return jax.lax.fori_loop(0, L, body, idx0)


def bench(fn, *args, reps=8):
    r = fn(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts), r


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 2**31, size=(R, W), dtype=np.int64).astype(np.uint32))
    idx0 = jnp.asarray(
        np.broadcast_to(rng.integers(0, R, size=(R, 1), dtype=np.int64).astype(np.int32), (R, W))).copy()

    try:
        t_p, r_p = bench(run_pallas, table, idx0)
        per_step = t_p / L
        print(f"pallas VMEM dynamic_gather chase: {t_p*1e3:.3f} ms for L={L}, "
              f"{per_step*1e6:.1f} us/step, {per_step/R*1e9:.2f} ns/lane/step")
    except Exception as e:
        print("PALLAS FAILED:", type(e).__name__, str(e)[:2000])
        r_p = None

    f_x = jax.jit(xla_chase)
    t_x, r_x = bench(f_x, table, idx0)
    print(f"XLA HBM gather chase:            {t_x*1e3:.3f} ms for L={L}, "
          f"{t_x/L*1e6:.1f} us/step, {t_x/L/R*1e9:.2f} ns/lane/step")
    if r_p is not None:
        print("results equal:", bool(jnp.array_equal(r_p, r_x)))


if __name__ == "__main__":
    main()
