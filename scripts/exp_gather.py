#!/usr/bin/env python
"""Microbench: dependent random row-gather cost vs table size/width on TPU.

Chains gathers through a lax.scan carry (mimicking the per-step dependency of
the lockstep MS/PML recurrence) so successive gathers cannot overlap.

NOTE: on the axon platform `jax.block_until_ready` does NOT actually wait —
timings must be closed with a (tiny) device->host transfer, which this script
does via np.asarray on a small slice (see exp_gather2.py for the validation
that exposed this).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 65536
STEPS = 256


def bench_gather(rows, width, dtype=np.int32):
    rng = np.random.default_rng(0)
    table = rng.integers(0, rows, size=(rows, width)).astype(dtype)
    table_d = jax.device_put(jnp.asarray(table))
    idx0 = jnp.asarray(rng.integers(0, rows, size=B).astype(dtype))

    @jax.jit
    def run(table, idx):
        def step(carry, _):
            row = table[carry]               # [B, width]
            nxt = row[:, 0] ^ row[:, -1]
            return jnp.clip(nxt % rows, 0, rows - 1), ()
        out, _ = jax.lax.scan(step, idx, None, length=STEPS)
        return out

    np.asarray(run(table_d, idx0)[:8])
    t0 = time.time()
    out = run(table_d, idx0)
    np.asarray(out[:8])   # forced d2h sync (block_until_ready is a no-op here)
    dt = time.time() - t0
    mb = rows * width * np.dtype(dtype).itemsize / 1e6
    print(f"rows={rows:>9,} width={width:>3} ({mb:8.1f} MB): "
          f"{dt/STEPS*1e6:7.1f} us/gather  "
          f"({dt/STEPS/B*1e9:5.2f} ns/row)", flush=True)


def main():
    configs = [
        (40_000, 16),     # occ-block table, 128-pos blocks, 5M text (2.5MB)
        (40_000, 12),     # 48B rows
        (156_250, 16),    # 32-pos blocks (10MB)
        (625_000, 8),     # thr_occ rows of 8 (20MB)
        (625_000, 16),    # thr+ssamp+esamp packed (40MB)
        (1_250_000, 8),   # thr_occ rows of 4... (40MB)
        (16_384, 64),     # current level-1-ish
        (1_048_576, 8),   # current fields (33MB)
        (2_000_000, 4),   # scalar-ish 16B rows from 32MB
        (5_000_000, 1),   # pure scalar gather from 20MB
    ]
    for rows, width in configs:
        bench_gather(rows, width)


if __name__ == "__main__":
    main()
