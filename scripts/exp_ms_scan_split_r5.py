"""Split the 2.1 Gbp v4-MS 'scan' time into scan-proper vs jump-table
reconstruction, plus the v4-PML scan as the one-gather floor."""
import sys
sys.path.insert(0, '/root/repo')
import os, time, functools
import numpy as np
import spumoni_tpu  # noqa
import jax, jax.numpy as jnp

SCALE = os.path.join(os.path.expanduser("~"), ".cache", "spumoni_tpu",
                     "bench", "scale")
from spumoni_tpu.native import RawIndex
from spumoni_tpu.index.format import build_dense_index
from spumoni_tpu.engine.blockbits import (_assemble_blockbits, _build_msrows,
                                          make_blockbits_ms_step_fn,
                                          ms_initial_state)
from spumoni_tpu.engine.scan_engine import (query_batch_kernel_v4,
                                            query_batch_kernel_v4ms)
from spumoni_tpu.utils import device_put_chunked

B = 65536
t0 = time.time()
d = np.load(os.path.join(SCALE, "raw.npz"))
raw = RawIndex(int(d["n"]), d["run_heads"], d["run_starts"],
               d["thresholds"], d["samples_start"], d["samples_last"])
dense = build_dense_index(raw, with_samples=True)
bb = np.load(os.path.join(SCALE, "bb.npz"))
P, _, _, pack = (int(x) for x in bb["meta"][:4])
msrows = _build_msrows(dense, P, pack)
arrays, meta, host = _assemble_blockbits(dense, bb["bblocks"], P, pack,
                                         False, msrows=msrows, want_ms=True)
reads = np.load(os.path.join(SCALE, "reads.npz"))["reads"][:B]
rev = np.ascontiguousarray(reads[:, ::-1])
alpha = tuple(sorted({0} | set(int(x) for x in np.unique(rev))))
planes = host.planes_for_alphabet(alpha)
rev_d = device_put_chunked(host.rank_map(alpha)[rev])
print(f"setup done ({time.time()-t0:.0f} s)", flush=True)

@functools.partial(jax.jit, static_argnames=("meta",))
def scan_only(ix, rr, meta, planes):
    step = make_blockbits_ms_step_fn(meta, "ms", False)
    state = ms_initial_state(ix, meta, rr.shape[0], "ms")
    state, (j, dd) = jax.lax.scan(
        lambda c, ch: step(ix, c, ch, planes), state, rr.T)
    return j.T, dd.T

@jax.jit
def recon(jt, j, dd):
    return jt[j] - dd.astype(jt.dtype)

def t(f, n=3):
    best = 1e9
    for _ in range(n):
        t1 = time.time(); jax.block_until_ready(f())
        best = min(best, time.time() - t1)
    return best

f_pml = lambda: query_batch_kernel_v4(arrays, rev_d, meta, planes)[0]
f_scan = lambda: scan_only(arrays, rev_d, meta, planes)[0]
f_ms = lambda: query_batch_kernel_v4ms(arrays, rev_d, meta, "ms", False,
                                       planes)[0]
f_pml(); f_scan(); f_ms()
jm, dm = scan_only(arrays, rev_d, meta, planes)
jm = jax.block_until_ready(jm); dm = jax.block_until_ready(dm)
f_rec = lambda: recon(arrays.jump_t, jm, dm)
f_rec()
print(f"v4-PML scan (floor): {t(f_pml):.3f} s", flush=True)
print(f"v4-MS scan-only    : {t(f_scan):.3f} s", flush=True)
print(f"reconstruction     : {t(f_rec):.3f} s", flush=True)
print(f"v4-MS full         : {t(f_ms):.3f} s", flush=True)
