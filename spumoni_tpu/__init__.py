"""spumoni_tpu — a TPU-native matching-statistics engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of oma219/spumoni
(v2.0.9): r-index-style MS/PML computation and read classification, built
TPU-first:

  * the compressed index (RLBWT runs, thresholds, SA samples) is laid out as
    dense HBM-resident per-character run tables,
  * the streaming MS/PML recurrence runs as a batched lockstep kernel over
    thousands of reads (`lax.scan`; rank/select = binary-searched gathers),
  * scale-out is a `jax.sharding.Mesh` with read batches sharded data-parallel
    and the index replicated (collectives merge classification results),
  * index construction is an in-process native (C++) library instead of the
    reference's popen'd helper binaries.

64-bit index arithmetic is required for genome-scale references
(n > 2^31 once the reverse complement is included), so x64 mode is enabled at
package import.
"""

import jax

jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
