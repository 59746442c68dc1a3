"""Chip verify + A/B for engine v4-MS (round 5): exactness vs the native
oracle through the production ScanEngine paths, then an interleaved scan
benchmark v2-layered vs v4-MS on the same index."""
import sys
sys.path.insert(0, '/root/repo')
import time
import jax
import jax.numpy as jnp
import numpy as np
import spumoni_tpu  # noqa: F401

print("devices:", jax.devices(), flush=True)

from spumoni_tpu.native import build_raw_index, NativeQueryEngine
from spumoni_tpu.index.format import (build_dense_index, build_doc_arrays)
from spumoni_tpu.engine import blockbits
from spumoni_tpu.engine.layered import build_layered
from spumoni_tpu.engine.scan_engine import (
    ScanEngine, query_batch_kernel_v2, query_batch_kernel_v4ms)

rng = np.random.default_rng(5)
doc_lens = [1_200_000, 800_000]
parts = [rng.choice(np.frombuffer(b"ACGT", np.uint8), size=m)
         for m in doc_lens]
text = np.concatenate(parts)
raw = build_raw_index(text)
ds, de = build_doc_arrays(raw, doc_lens)
dense = build_dense_index(raw, text=text, with_samples=True,
                          doc_start=ds, doc_end=de)
print("n", dense.n, "r", dense.r, flush=True)
native = NativeQueryEngine(raw.n, raw.run_heads, raw.run_starts,
                           raw.thresholds, raw.samples_start,
                           raw.samples_last, start_doc=ds, end_doc=de,
                           text=text)

arrays, meta, host = blockbits.build_blockbits(dense, want_ms=True,
                                               want_doc=True)
print("v4 meta:", meta.P, meta.pack, "ms_width", meta.ms_width, flush=True)

reads = []
for _ in range(48):
    o = int(rng.integers(0, len(text) - 1200))
    rd = text[o:o + 1024].copy()
    mut = rng.random(1024) < 0.05
    rd[mut] = rng.choice(np.frombuffer(b"ACGT", np.uint8),
                         size=int(mut.sum()))
    reads.append(rd.tobytes())
for _ in range(12):
    reads.append(rng.choice(np.frombuffer(b"ACGT", np.uint8),
                            size=1024).tobytes())
for _ in range(4):
    rd = bytearray(reads[0])
    for j in rng.integers(0, 1024, size=20):
        rd[j] = ord("N")
    reads.append(bytes(rd))

# exactness: ms + doc through the production engine
eng = ScanEngine(arrays, meta, mode="ms", use_doc=True, host=host)
out = eng.query(reads)
wptr, wlen, wdoc = native.query_ms(reads, with_docs=True, threads=2)
for i in range(len(reads)):
    assert np.array_equal(out["pointers"][i], wptr[i]), ("ptr", i)
    assert np.array_equal(out["lengths"][i], wlen[i]), ("len", i)
    assert np.array_equal(out["docs"][i], wdoc[i]), ("doc", i)
print("v4-MS chip exactness OK (ptr+len+doc, incl. N reads)", flush=True)

# pml+doc
eng2 = ScanEngine(arrays, meta, mode="pml", use_doc=True, host=host)
out2 = eng2.query(reads)
wplen, wpdoc = native.query_pml(reads, with_docs=True, threads=2)
for i in range(len(reads)):
    assert np.array_equal(out2["lengths"][i], wplen[i]), ("plen", i)
    assert np.array_equal(out2["docs"][i], wpdoc[i]), ("pdoc", i)
print("v4-PML+doc chip exactness OK", flush=True)

# ---- interleaved scan A/B: v2 layered vs v4ms, B=32768, L=1024 ----
B, L = 32768, 1024
mat = np.zeros((B, L), np.uint8)
for b in range(B):
    o = (b * 977) % (len(text) - L - 1)
    mat[b] = text[o:o + L]
rev = mat[:, ::-1]

la, lm, lh = build_layered(dense)
alpha_l = tuple(sorted(set(lh.index_chars) | {0} |
                       set(int(x) for x in np.unique(rev))))
rev_l = jnp.asarray(lh.rank_map(alpha_l)[rev])
planes_l = lh.planes_for_alphabet(alpha_l)

alpha_b = tuple(sorted({0} | set(int(x) for x in np.unique(rev))))
rev_b = jnp.asarray(host.rank_map(alpha_b)[rev])
planes_b = host.planes_for_alphabet(alpha_b)

def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0][:8])

def run_v2():
    v = query_batch_kernel_v2(la, rev_l, lm, "ms", False, planes_l)[0]
    sync(v); return v

def run_v4():
    v = query_batch_kernel_v4ms(arrays, rev_b, meta, "ms", False,
                                planes_b)[0]
    sync(v); return v

v2v = np.asarray(run_v2()); v4v = np.asarray(run_v4())
assert np.array_equal(v2v, v4v), "v2 vs v4ms disagree on chip"
print("A/B outputs identical; timing (interleaved, 4 rounds):", flush=True)
t2s, t4s = [], []
for it in range(4):
    t0 = time.time(); run_v2(); t2s.append(time.time() - t0)
    t0 = time.time(); run_v4(); t4s.append(time.time() - t0)
t2, t4 = min(t2s), min(t4s)
print(f"v2 layered MS scan: {t2:.3f}s  ({B/t2:.0f} reads/s)", flush=True)
print(f"v4-MS scan:        {t4:.3f}s  ({B/t4:.0f} reads/s)  "
      f"speedup {t2/t4:.2f}x", flush=True)
print("VERIFY V4MS OK", flush=True)
