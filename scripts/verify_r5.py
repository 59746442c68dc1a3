"""Round-5 verify drive: MS production path (rows512 two-gather) + PML on the
real TPU chip, cross-checked exactly vs NativeQueryEngine."""
import sys
sys.path.insert(0, '/root/repo')
import time
import jax
import numpy as np
import spumoni_tpu  # noqa: F401  (enables x64)

print("devices:", jax.devices(), flush=True)

from spumoni_tpu.native import build_raw_index, NativeQueryEngine
from spumoni_tpu.index.format import build_dense_index
from spumoni_tpu.engine.arrays import to_device_arrays
from spumoni_tpu.engine.scan_engine import ScanEngine

rng = np.random.default_rng(1234)
text = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=2_000_000)
raw = build_raw_index(text)
dense = build_dense_index(raw, text=text, with_samples=True)
arrays, meta = to_device_arrays(dense)
print("index r =", raw.r, flush=True)

# reads: mutated substrings + random + N-containing
reads = []
for _ in range(96):
    o = int(rng.integers(0, len(text) - 1200))
    rd = text[o:o + 1024].copy()
    mut = rng.random(1024) < 0.05
    rd[mut] = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=int(mut.sum()))
    reads.append(rd.tobytes())
for _ in range(24):
    reads.append(rng.choice(np.frombuffer(b"ACGT", np.uint8),
                            size=1024).tobytes())
for _ in range(8):
    rd = bytearray(reads[rng.integers(0, 96)])
    for j in rng.integers(0, 1024, size=20):
        rd[j] = ord("N")
    reads.append(bytes(rd))
exact = text[500_000:508_000].tobytes()  # 8kb exact substring

native = NativeQueryEngine(raw.n, raw.run_heads, raw.run_starts,
                           raw.thresholds, raw.samples_start,
                           raw.samples_last, text=text)

for mode in ("pml", "ms"):
    eng = ScanEngine(arrays, meta, mode=mode)
    t0 = time.time()
    out = eng.query(reads)
    print(f"{mode} query wall {time.time()-t0:.1f}s", flush=True)
    if mode == "pml":
        want = native.query_pml(reads, threads=2)
        for i in range(len(reads)):
            assert np.array_equal(out["lengths"][i], want[i]), f"pml read {i}"
        mut_mean = np.mean([out["lengths"][i].mean() for i in range(96)])
        rnd_mean = np.mean([out["lengths"][i].mean() for i in range(96, 120)])
        print(f"pml exact-parity OK; mutated mean {mut_mean:.2f} "
              f"vs random {rnd_mean:.2f}", flush=True)
        assert mut_mean > 5 * rnd_mean
    else:
        wptr, wlen = native.query_ms(reads, threads=2)
        for i in range(len(reads)):
            assert np.array_equal(out["pointers"][i], wptr[i]), f"ptr read {i}"
            assert np.array_equal(out["lengths"][i], wlen[i]), f"len read {i}"
        ex = eng.query([exact])
        assert int(ex["lengths"][0].max()) == 8000, ex["lengths"][0].max()
        print("ms exact-parity OK (incl. N reads); 8kb exact max MS == 8000",
              flush=True)
    assert eng._text_two_gather or mode == "pml"

# staged MS classify path (_classify_ms_dev) — the other rows512 consumer
from spumoni_tpu.io.fastx_batch import PackedReads
bufs = b"".join(reads)
offs = np.zeros(len(reads) + 1, np.int64)
np.cumsum([len(r) for r in reads], out=offs[1:])
p = PackedReads([f"r{i}" for i in range(len(reads))],
                np.frombuffer(bufs, np.uint8), offs)
eng = ScanEngine(arrays, meta, mode="ms")
staged = eng.stage(p)
res = eng.classify_staged(staged, bin_width=150, max_value_thr=18)
found = res["found"]
print("staged MS classify: pos found %.3f neg found %.3f" %
      (found[:96].mean(), found[96:120].mean()), flush=True)
assert found[:96].mean() > 0.95 and found[96:120].mean() < 0.05
print("VERIFY OK", flush=True)
