#!/usr/bin/env python
"""Dependent ELEMENT-gather chase cost vs flat-table size.

Motivation: the whole PML step is a pure function of (char, pos) —
tabulating it as newpos[c*n + pos] (u32, match bit in bit 31) turns each
scan step into ONE element gather. Cost question: ns/lane/step for a
dependent element chase on tables of 2^20..2^26 u32 entries, B=131072.
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

L = 64
B = 131072


def make_chase(E):
    def chase(table, idx0):
        def body(t, idx):
            v = jnp.take(table, idx)                 # [B] element gather
            nxt = v.astype(jnp.int32) + t
            return jax.lax.rem(jnp.abs(nxt), E).astype(jnp.int32)
        return jax.lax.fori_loop(0, L, body, idx0)
    return jax.jit(chase)


def bench(fn, *args, reps=6):
    np.asarray(fn(*args)[:8])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(r[:8])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    sizes = [1 << 17, 1 << 20, 1 << 22, 5_000_000 * 4, 1 << 26]
    if len(sys.argv) > 1:
        sizes = [int(x) for x in sys.argv[1].split(",")]
    for E in sizes:
        table = jnp.asarray(rng.integers(0, E, size=E).astype(np.uint32))
        idx0 = jnp.asarray(rng.integers(0, E, size=B).astype(np.int32))
        f = make_chase(E)
        t = bench(f, table, idx0)
        ns = t / L / B * 1e9
        print(f"E={E:>11,} ({E*4/1e6:7.1f} MB): {t/L*1e6:8.1f} us/step  "
              f"{ns:6.2f} ns/lane/step", flush=True)


if __name__ == "__main__":
    main()
