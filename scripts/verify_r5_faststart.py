"""Round-5 on-chip verification: fast serving start (bbrows manifest path).
Drives the PRODUCT path on the real TPU: pipeline.build -> pipeline.run
(dense first run, fast-start second run) -> byte-compare outputs, then
cross-check values against the native CPU engine run."""
import sys
sys.path.insert(0, '/root/repo')
import os, time, tempfile
import numpy as np
import spumoni_tpu  # noqa: F401
import jax
print("devices:", jax.devices())
assert "TPU" in str(jax.devices()[0]).upper() or "tpu" in jax.devices()[0].platform

from spumoni_tpu.pipeline import BuildConfig, RunConfig, build, run
import spumoni_tpu.pipeline as pl

rng = np.random.default_rng(7)
ACGT = np.frombuffer(b"ACGT", np.uint8)
d = tempfile.mkdtemp(prefix="spn_r5_fast_")
genome = rng.choice(ACGT, size=2_000_000)
gp = os.path.join(d, "g.fa")
with open(gp, "w") as f:
    f.write(">chr1\n" + genome.tobytes().decode() + "\n")
reads = []
rp = os.path.join(d, "reads.fa")
with open(rp, "w") as f:
    for i in range(64):
        if i % 2 == 0:
            st = int(rng.integers(0, len(genome) - 800))
            rd = genome[st:st+800].copy()
            mut = rng.random(800) < 0.08
            rd[mut] = rng.choice(ACGT, size=int(mut.sum()))
        else:
            rd = rng.choice(ACGT, size=800)
        f.write(f">r{i}\n{rd.tobytes().decode()}\n")

prefix = os.path.join(d, "idx")
build(BuildConfig(ref_file=gp, output_prefix=prefix, pml_index=True,
                  use_minimizers=False))
cfg = dict(ref_file=prefix, pattern_file=rp, pml_requested=True,
           min_digest=False, write_report=True)

t0 = time.time(); run(RunConfig(**cfg)); t_first = time.time() - t0
v1 = open(rp + ".pseudo_lengths", "rb").read()
r1 = open(rp + ".report").read()
assert os.path.exists(prefix + ".fa.thrbv.spumoni.bbrows.npz")

def poisoned(path):
    raise AssertionError("dense loaded on fast path")
pl.load_dense_index, orig = poisoned, pl.load_dense_index
t0 = time.time(); run(RunConfig(**cfg)); t_fast = time.time() - t0
pl.load_dense_index = orig
v2 = open(rp + ".pseudo_lengths", "rb").read()
r2 = open(rp + ".report").read()
assert v1 == v2 and r1 == r2, "fast-start outputs differ"
print(f"fast-start byte-identical; first {t_first:.1f}s fast {t_fast:.1f}s")

run(RunConfig(**cfg, device="cpu"))
v3 = open(rp + ".pseudo_lengths", "rb").read()
r3 = open(rp + ".report").read()
assert v1 == v3 and r1 == r3, "TPU vs native CPU mismatch"
print("TPU (fast start) == native CPU engine, byte-identical. PASS")
