"""Profile v4-MS scan components: v4-PML scan vs v4-MS scan vs
reconstruction-only, same index/batch as verify_v4ms_chip."""
import sys
sys.path.insert(0, '/root/repo')
import time, functools
import jax
import jax.numpy as jnp
import numpy as np
import spumoni_tpu  # noqa: F401

from spumoni_tpu.native import build_raw_index
from spumoni_tpu.index.format import build_dense_index
from spumoni_tpu.engine import blockbits
from spumoni_tpu.engine.scan_engine import (
    query_batch_kernel_v4, query_batch_kernel_v4ms)
from spumoni_tpu.engine.blockbits import (
    make_blockbits_ms_step_fn, ms_initial_state)

rng = np.random.default_rng(5)
text = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=2_000_000)
raw = build_raw_index(text)
dense = build_dense_index(raw, text=text, with_samples=True)
arrays, meta, host = blockbits.build_blockbits(dense, want_ms=True)
print("r", dense.r, "P", meta.P, flush=True)

B, L = 32768, 1024
mat = np.zeros((B, L), np.uint8)
for b in range(B):
    o = (b * 977) % (len(text) - L - 1)
    mat[b] = text[o:o + L]
rev = mat[:, ::-1]
alpha = tuple(sorted({0} | set(int(x) for x in np.unique(rev))))
rev_b = jnp.asarray(host.rank_map(alpha)[rev])
planes = host.planes_for_alphabet(alpha)

def sync(x): np.asarray(x[:4, :4] if x.ndim == 2 else x[:4])

# scan-only kernel (no reconstruction): emit jidx/d, return them raw
@functools.partial(jax.jit, static_argnames=("meta",))
def scan_only(ix, reads_rev, meta, planes):
    step = make_blockbits_ms_step_fn(meta, "ms", False)
    state = ms_initial_state(ix, meta, reads_rev.shape[0], "ms")
    state, (j, d) = jax.lax.scan(
        lambda c, ch: step(ix, c, ch, planes), state, reads_rev.T)
    return j.T, d.T

@functools.partial(jax.jit, static_argnames=())
def recon(jt, j, d):
    return jt[j] - d.astype(jt.dtype)

def t(f, n=4):
    best = 1e9
    for _ in range(n):
        t0 = time.time(); f(); best = min(best, time.time() - t0)
    return best

f_pml = lambda: sync(query_batch_kernel_v4(arrays, rev_b, meta, planes)[0])
f_ms  = lambda: sync(query_batch_kernel_v4ms(arrays, rev_b, meta, "ms", False, planes)[0])
f_scan = lambda: sync(scan_only(arrays, rev_b, meta, planes)[0])
f_pml(); f_ms(); f_scan()
jmat, dmat = scan_only(arrays, rev_b, meta, planes)
jmat = jax.block_until_ready(jmat); dmat = jax.block_until_ready(dmat)
f_rec = lambda: sync(recon(arrays.jump_t, jmat, dmat))
f_rec()
print(f"v4-PML scan      : {t(f_pml):.3f}s", flush=True)
print(f"v4-MS scan-only  : {t(f_scan):.3f}s", flush=True)
print(f"reconstruction   : {t(f_rec):.3f}s", flush=True)
print(f"v4-MS full       : {t(f_ms):.3f}s", flush=True)
