"""v4-MS at 2.1 Gbp scale: interleaved A/B of the MS pointer scan —
v2 layered (5 probes, samples in-scan) vs v4-MS (1 row + 1 msrow gather,
post-pass jump-table reconstruction). Reuses the scale-config caches."""
import sys
sys.path.insert(0, '/root/repo')
import os, time
import numpy as np
import spumoni_tpu  # noqa: F401
import jax
import jax.numpy as jnp

SCALE = os.path.join(os.path.expanduser("~"), ".cache", "spumoni_tpu",
                     "bench", "scale")
from spumoni_tpu.native import RawIndex
from spumoni_tpu.index.format import build_dense_index
from spumoni_tpu.engine import blockbits
from spumoni_tpu.engine.blockbits import _assemble_blockbits, _build_msrows
from spumoni_tpu.engine.layered import build_layered
from spumoni_tpu.engine.scan_engine import (
    query_batch_kernel_v2, query_batch_kernel_v4ms)
from spumoni_tpu.utils import device_put_chunked

t0 = time.time()
d = np.load(os.path.join(SCALE, "raw.npz"))
raw = RawIndex(int(d["n"]), d["run_heads"], d["run_starts"],
               d["thresholds"], d["samples_start"], d["samples_last"])
dense = build_dense_index(raw, with_samples=True)
print(f"dense ready n={dense.n} r={dense.r} ({time.time()-t0:.0f}s)",
      flush=True)

bb = np.load(os.path.join(SCALE, "bb.npz"))
P, width, sigma, pack = (int(x) for x in bb["meta"][:4])
print("P", P, "pack", pack, flush=True)
t1 = time.time()
msrows = _build_msrows(dense, P, pack)
print(f"msrows built {msrows.shape} ({time.time()-t1:.0f}s)", flush=True)
# hack: give dense a text=None MS assembly (no extension here — scan A/B)
arrays, meta, host = _assemble_blockbits(dense, bb["bblocks"], P, pack,
                                         False, msrows=msrows, want_ms=True)
print(f"v4 resident ({time.time()-t0:.0f}s)", flush=True)

la, lm, lh = build_layered(dense, want_text=False)
print(f"layered resident ({time.time()-t0:.0f}s)", flush=True)

B = 65536
reads = np.load(os.path.join(SCALE, "reads.npz"))["reads"][:B]
rev = np.ascontiguousarray(reads[:, ::-1])
alpha_l = tuple(sorted(set(lh.index_chars) | {0}))
rev_l = device_put_chunked(lh.rank_map(alpha_l)[rev])
planes_l = lh.planes_for_alphabet(alpha_l)
alpha_b = tuple(sorted({0} | set(int(x) for x in np.unique(rev))))
rev_b = device_put_chunked(host.rank_map(alpha_b)[rev])
planes_b = host.planes_for_alphabet(alpha_b)
print(f"reads resident ({time.time()-t0:.0f}s)", flush=True)

def sync(x): np.asarray(x[:4, :4])

def run_v2():
    v = query_batch_kernel_v2(la, rev_l, lm, "ms", False, planes_l)[0]
    sync(v); return v

def run_v4():
    v = query_batch_kernel_v4ms(arrays, rev_b, meta, "ms", False,
                                planes_b)[0]
    sync(v); return v

print("compiling v2...", flush=True)
t1 = time.time(); v2v = run_v2(); print(f"  {time.time()-t1:.0f}s", flush=True)
print("compiling v4ms...", flush=True)
t1 = time.time(); v4v = run_v4(); print(f"  {time.time()-t1:.0f}s", flush=True)
a, b = np.asarray(v2v), np.asarray(v4v)
assert np.array_equal(a, b), f"mismatch {np.nonzero(a != b)[0][:5]}"
print("outputs IDENTICAL at scale", flush=True)

t2s, t4s = [], []
for it in range(3):
    t1 = time.time(); run_v2(); t2s.append(time.time() - t1)
    t1 = time.time(); run_v4(); t4s.append(time.time() - t1)
t2, t4 = min(t2s), min(t4s)
print(f"v2 layered MS scan: {t2:.3f}s ({B/t2:.0f} reads/s)", flush=True)
print(f"v4-MS scan+recon:   {t4:.3f}s ({B/t4:.0f} reads/s) "
      f"speedup {t2/t4:.2f}x", flush=True)
