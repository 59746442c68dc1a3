#!/usr/bin/env python
"""Map the XLA dependent-gather cost surface: lanes x table-rows x row-width.

Round-2 finding to validate: a (9728-lane, 9728x128-u32-table) dependent
chase ran at 0.14 ns/lane/step — 25x faster than the production v4 kernel's
3.9 ns/lane/step. Find which parameter buys the fast path.
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

L = 64


def make_chase(R, W, B):
    def chase(table, idx0):
        def body(t, idx):
            g = jnp.take(table, idx, axis=0)          # (B, W)
            # consume the WHOLE row so XLA cannot narrow the gather
            nxt = g.sum(axis=1).astype(jnp.int32) + t
            return jax.lax.rem(jnp.abs(nxt), R).astype(jnp.int32)
        return jax.lax.fori_loop(0, L, body, idx0)
    return jax.jit(chase)


def bench(fn, *args, reps=6):
    np.asarray(fn(*args)[:8])       # warm + compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(r[:8])           # forced d2h sync (block_until_ready no-op)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    cases = []
    import ast
    cases = (ast.literal_eval(sys.argv[1]) if len(sys.argv) > 1 else [
        (19456, 52, 131072),     # production v4 geometry (P=256 pack=2)
        (19456, 64, 131072),
        (9728, 128, 131072),
        (4864, 256, 131072),
    ])
    for R, W, B in cases:
        table = jnp.asarray(rng.integers(0, 2**31, size=(R, W)).astype(np.uint32))
        idx0 = jnp.asarray(rng.integers(0, R, size=(B,)).astype(np.int32))
        f = make_chase(R, W, B)
        t = bench(f, table, idx0)
        ns = t / L / B * 1e9
        us = t / L * 1e6
        mb = R * W * 4 / 1e6
        print(f"R={R:7d} W={W:4d} ({mb:6.1f} MB) B={B:7d}: "
              f"{us:8.1f} us/step  {ns:6.2f} ns/lane/step", flush=True)


if __name__ == "__main__":
    main()
