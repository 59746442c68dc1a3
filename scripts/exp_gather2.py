#!/usr/bin/env python
"""Validate gather microbench: check linearity in STEPS and full-row use."""
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 65536


def bench(rows, width, steps, full_row):
    rng = np.random.default_rng(0)
    table = rng.integers(0, rows, size=(rows, width)).astype(np.int32)
    table_d = jax.device_put(jnp.asarray(table))
    idx0 = jnp.asarray(rng.integers(0, rows, size=B).astype(np.int32))

    @jax.jit
    def run(table, idx):
        def step(carry, _):
            row = table[carry]
            if full_row:
                nxt = jnp.sum(row, axis=1)
            else:
                nxt = row[:, 0] ^ row[:, -1]
            return jnp.abs(nxt) % rows, ()
        out, _ = jax.lax.scan(step, idx, None, length=steps)
        return out

    out = run(table_d, idx0)
    jax.block_until_ready(out)
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out = run(table_d, idx0)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"rows={rows:>9,} w={width:>3} steps={steps:>5} full={int(full_row)}:"
          f" total {dt*1e3:8.2f} ms  {dt/steps*1e6:7.2f} us/gather", flush=True)


for steps in (256, 1024):
    bench(1_048_576, 8, steps, False)
    bench(1_048_576, 8, steps, True)
bench(16_384, 64, 1024, True)
bench(40_000, 16, 1024, True)
