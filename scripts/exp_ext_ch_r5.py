"""Extension sweep chunk-size A/B at 2.1 Gbp (phase A scan granularity)."""
import sys
sys.path.insert(0, '/root/repo')
import os, time
import numpy as np
import spumoni_tpu  # noqa
import jax, jax.numpy as jnp

SCALE = os.path.join(os.path.expanduser("~"), ".cache", "spumoni_tpu",
                     "bench", "scale")
import bench
from spumoni_tpu.native import RawIndex
from spumoni_tpu.index.format import build_dense_index
from spumoni_tpu.engine.blockbits import _assemble_blockbits, _build_msrows
from spumoni_tpu.engine.scan_engine import (extend_pointers_sweep,
                                            query_batch_kernel_v4ms)
from spumoni_tpu.utils import device_put_chunked

B, L = 65536, 1024
t0 = time.time()
text = bench._scale_text()
d = np.load(os.path.join(SCALE, "raw.npz"))
raw = RawIndex(int(d["n"]), d["run_heads"], d["run_starts"],
               d["thresholds"], d["samples_start"], d["samples_last"])
dense = build_dense_index(raw, with_samples=True)
bb = np.load(os.path.join(SCALE, "bb.npz"))
P, _, _, pack = (int(x) for x in bb["meta"][:4])
msrows = _build_msrows(dense, P, pack)
arrays, meta, host = _assemble_blockbits(dense, bb["bblocks"], P, pack,
                                         False, msrows=msrows, want_ms=True)
nt = len(text)
rows = -(-nt // 512) + 1
t_ = np.concatenate([text, np.zeros(rows * 512 - nt, np.uint8)])
tw = device_put_chunked(np.ascontiguousarray(
    t_.view(np.uint32).reshape(rows, 128)))
del t_
reads = np.load(os.path.join(SCALE, "reads.npz"))["reads"][:B]
rev = np.ascontiguousarray(reads[:, ::-1])
alpha = tuple(sorted({0} | set(int(x) for x in np.unique(rev))))
planes = host.planes_for_alphabet(alpha)
rev_d = device_put_chunked(host.rank_map(alpha)[rev])
fwd_d = jax.device_put(jnp.asarray(reads))
lens_d = jax.device_put(jnp.asarray(np.full((B,), L, np.int32)))
print(f"setup done ({time.time()-t0:.0f} s)", flush=True)
ptrs = query_batch_kernel_v4ms(arrays, rev_d, meta, "ms", False, planes)[0]
pf = jax.block_until_ready(ptrs[:, ::-1])

ref = None
for ch in (65536, 131072, 262144, 524288):
    for tc in ((16384,) if ch != 131072 else (16384, 65536)):
        def ext():
            o = extend_pointers_sweep(tw, fwd_d, lens_d, pf, nt, None,
                                      chunk_positions=ch, tail_chunk=tc,
                                      text_two_gather=True)
            return jax.block_until_ready(o)
        o = ext()
        if ref is None:
            ref = np.asarray(o)
        else:
            assert np.array_equal(ref, np.asarray(o)), (ch, tc)
        best = 1e9
        for _ in range(2):
            t1 = time.time(); ext(); best = min(best, time.time() - t1)
        print(f"CH={ch:7d} TC={tc:6d}: {best:.3f} s", flush=True)
