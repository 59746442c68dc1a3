"""ICI-sharded index (TP) path: a 2x4 (data x model) virtual CPU mesh with
the `fields` table row-sharded must (a) agree bit-for-bit with the replicated
data-parallel path and the native CPU engine, and (b) actually hold only a
1/4 row-shard of `fields` on each device."""

import jax
import numpy as np

from spumoni_tpu.native import build_raw_index, NativeQueryEngine
from spumoni_tpu.index.format import build_dense_index
from spumoni_tpu.engine.layered import build_layered
from spumoni_tpu.classify import binmax
from spumoni_tpu.parallel.mesh import ShardedPmlClassifier, make_data_mesh
from spumoni_tpu.parallel.tp import TpPmlClassifier, make_tp_mesh

from conftest import rand_dna, mutated_substring


def _setup(rng, n_text=6000):
    text = rand_dna(rng, n_text)
    raw = build_raw_index(np.frombuffer(text, np.uint8))
    dense = build_dense_index(raw)
    arrays, meta, host = build_layered(dense)
    native = NativeQueryEngine(raw.n, raw.run_heads, raw.run_starts,
                               raw.thresholds, raw.samples_start,
                               raw.samples_last)
    return text, arrays, meta, host, native


def test_tp_classifier_matches_native(rng, make_reads):
    text, arrays, meta, host, native = _setup(rng)
    mesh = make_tp_mesh(2, 4)
    clf = TpPmlClassifier(arrays, meta, mesh, bin_width=150, max_value_thr=5,
                          host=host)
    reads = [mutated_substring(rng, text, 300, err=0.05) for _ in range(9)]
    reads += [rand_dna(rng, 300) for _ in range(8)]
    out = clf.classify(reads)

    ref_lengths = native.query_pml(reads)
    for i in range(len(reads)):
        ref = binmax.classify(ref_lengths[i], 150, 5)
        assert (ref.status == "FOUND") == bool(out["found"][i]), i
        assert ref.bins_above == out["above"][i], i
        assert ref.bins_below == out["below"][i], i
        assert ref.bin_maxes.sum() == out["sum_maxes"][i], i


def test_tp_matches_replicated_path(rng):
    text, arrays, meta, host, _ = _setup(rng, n_text=3000)
    reads = [mutated_substring(rng, text, 220, err=0.08) for _ in range(16)]

    repl = ShardedPmlClassifier(arrays, meta, make_data_mesh(),
                                bin_width=100, max_value_thr=4, host=host)
    out_repl = repl.classify(reads, want_values=False)

    tp = TpPmlClassifier(arrays, meta, make_tp_mesh(2, 4),
                         bin_width=100, max_value_thr=4, host=host)
    out_tp = tp.classify(reads)
    for k in ("found", "above", "below", "sum_maxes"):
        assert np.array_equal(out_repl[k], out_tp[k]), k
    assert out_repl["total_found"] == out_tp["total_found"]


def test_tp_fields_memory_is_sharded(rng):
    _, arrays, meta, host, _ = _setup(rng, n_text=3000)
    mesh = make_tp_mesh(2, 4)
    clf = TpPmlClassifier(arrays, meta, mesh, bin_width=150,
                          max_value_thr=5, host=host)
    total_rows = clf.arrays.fields.shape[0]
    for shard in clf.arrays.fields.addressable_shards:
        assert shard.data.shape[0] == total_rows // 4


def test_tp_uneven_row_padding(rng):
    """Mesh size that does NOT divide the row count: rows must be padded.

    build_layered always yields a power-of-two row count, so a 3-wide model
    axis (power of two mod 3 is never 0) is guaranteed to take the padding
    branch in shard_index_tp — unlike an 8-wide axis, which divides every
    power-of-two table and leaves the branch dead."""
    text, arrays, meta, host, native = _setup(rng, n_text=2500)
    rows_before = int(arrays.fields.shape[0])
    assert rows_before % 3 != 0  # precondition: padding branch will fire
    mesh = make_tp_mesh(1, 3)
    clf = TpPmlClassifier(arrays, meta, mesh, bin_width=150,
                          max_value_thr=5, host=host)
    rows_after = int(clf.arrays.fields.shape[0])
    assert rows_after % 3 == 0 and rows_after > rows_before
    # pad rows carry the same F_START=n sentinel pattern as build_layered
    from spumoni_tpu.engine.layered import F_START
    tail = np.asarray(jax.device_get(clf.arrays.fields))[rows_before:]
    n = int(np.asarray(arrays.n))
    assert (tail[:, F_START::meta.width] == n).all()
    reads = [mutated_substring(rng, text, 180, err=0.05) for _ in range(5)]
    out = clf.classify(reads)
    ref_lengths = native.query_pml(reads)
    for i in range(len(reads)):
        ref = binmax.classify(ref_lengths[i], 150, 5)
        assert (ref.status == "FOUND") == bool(out["found"][i]), i


def test_tp_beyond_single_device_budget(rng):
    """The >HBM story end to end (VERDICT stretch): a fields table larger
    than a simulated per-device budget must classify correctly while every
    device holds ONLY its 1/8 row-shard (per-device bytes stay under the
    budget that the full table would bust). 300 kbp -> fields table whose
    replicated per-device footprint would exceed the 1 MB 'budget'."""
    text, arrays, meta, host, native = _setup(rng, n_text=300_000)
    full_bytes = int(np.asarray(arrays.fields).nbytes)
    budget = full_bytes // 2           # full table would NOT fit
    mesh = make_tp_mesh(1, 8)
    clf = TpPmlClassifier(arrays, meta, mesh, bin_width=150,
                          max_value_thr=5, host=host)
    shards = clf.arrays.fields.addressable_shards
    assert len(shards) == 8
    per_dev = max(int(np.prod(s.data.shape)) * s.data.dtype.itemsize
                  for s in shards)
    assert per_dev <= budget, (per_dev, budget)
    assert per_dev * 8 >= full_bytes   # shards jointly cover the table

    reads = [mutated_substring(rng, text, 400, err=0.05) for _ in range(6)]
    reads += [rand_dna(rng, 400) for _ in range(6)]
    out = clf.classify(reads)
    ref_lengths = native.query_pml(reads)
    for i in range(len(reads)):
        ref = binmax.classify(ref_lengths[i], 150, 5)
        assert (ref.status == "FOUND") == bool(out["found"][i]), i
        assert ref.bins_above == out["above"][i], i


def test_tp_blockbits_matches_native(rng, make_reads):
    """Block-bits (engine v4) TP: bblocks row-sharded over a 2x4 mesh, one
    [B, W] psum per step — verdicts must match the native oracle and every
    device must hold only its row shard (VERDICT r3 #4: the cheap TP
    variant for the >HBM escape hatch)."""
    from spumoni_tpu.engine.blockbits import build_blockbits

    text = rand_dna(rng, 6000)
    raw = build_raw_index(np.frombuffer(text, np.uint8))
    dense = build_dense_index(raw)
    arrays, meta, host = build_blockbits(dense)
    native = NativeQueryEngine(raw.n, raw.run_heads, raw.run_starts,
                               raw.thresholds, raw.samples_start,
                               raw.samples_last)
    clf = TpPmlClassifier(arrays, meta, make_tp_mesh(2, 4), bin_width=150,
                          max_value_thr=5, host=host)
    total_rows = clf.arrays.bblocks.shape[0]
    for shard in clf.arrays.bblocks.addressable_shards:
        assert shard.data.shape[0] == total_rows // 4
    reads = [mutated_substring(rng, text, 300, err=0.05) for _ in range(9)]
    reads += [rand_dna(rng, 300) for _ in range(8)]
    out = clf.classify(reads)
    ref_lengths = native.query_pml(reads)
    for i in range(len(reads)):
        ref = binmax.classify(ref_lengths[i], 150, 5)
        assert (ref.status == "FOUND") == bool(out["found"][i]), i
        assert ref.bins_above == out["above"][i], i
        assert ref.bins_below == out["below"][i], i


def test_tp_cli_reachable(tmp_path, rng):
    """--tp-devices through pipeline.run (CLI surface): the TP report must
    be byte-identical to the replicated-path report, for BOTH the forced
    block-bits and layered engines, and auto-TP must engage when the HBM
    budget is exceeded (VERDICT r3 #4: TP as a product path, not a library
    artifact)."""
    import os

    from spumoni_tpu.pipeline import BuildConfig, RunConfig, build, run

    genome_path = str(tmp_path / "g.fa")
    with open(genome_path, "w") as f:
        f.write(">chr\n" + rand_dna(rng, 20000).decode() + "\n")
    reads_path = str(tmp_path / "reads.fa")
    with open(reads_path, "w") as f:
        text = open(genome_path).readlines()[1].strip().encode()
        for i in range(6):
            f.write(f">pos{i}\n"
                    f"{mutated_substring(rng, text, 300, 0.05).decode()}\n")
            f.write(f">neg{i}\n{rand_dna(rng, 300).decode()}\n")
    build(BuildConfig(ref_file=genome_path, output_prefix=str(tmp_path / "i"),
                      pml_index=True, use_minimizers=False))
    base = dict(ref_file=str(tmp_path / "i"), pattern_file=reads_path,
                pml_requested=True, min_digest=False, write_report=True,
                report_only=True)
    run(RunConfig(**base))
    repl_report = open(reads_path + ".report", "rb").read()
    for engine in ("bits", "layered"):
        run(RunConfig(tp_devices=4, engine=engine, **base))
        assert open(reads_path + ".report", "rb").read() == repl_report, \
            engine
    # auto-TP: a tiny budget forces the sharded path
    os.environ["SPN_HBM_BUDGET_GB"] = "0.000001"
    try:
        run(RunConfig(**base))
    finally:
        del os.environ["SPN_HBM_BUDGET_GB"]
    assert open(reads_path + ".report", "rb").read() == repl_report


def test_tp_validation(tmp_path):
    from spumoni_tpu.pipeline import RunConfig
    import pytest

    pat = str(tmp_path / "p.fa")
    open(pat, "w").write(">r\nACGT\n")
    with pytest.raises(ValueError, match="classify-only"):
        RunConfig(ref_file="x", pattern_file=pat, pml_requested=True,
                  min_digest=False, tp_devices=4).validate()
    with pytest.raises(ValueError, match="classify-only"):
        RunConfig(ref_file="x", pattern_file=pat, ms_requested=True,
                  min_digest=False, write_report=True, report_only=True,
                  tp_devices=4).validate()


def test_tp_ms_matches_native(rng, make_reads):
    """TP for MS mode (VERDICT r4 #7): v4-MS rows + msrows + jump tables +
    rows512 text ALL row-sharded over a 2x4 mesh; pointers and extended
    lengths must match the native oracle bit-for-bit and every device must
    hold only its shard of each table."""
    from spumoni_tpu.engine.blockbits import build_blockbits
    from spumoni_tpu.engine.scan_engine import ScanEngine
    from spumoni_tpu.parallel.tp import TpMsQuery

    text = rand_dna(rng, 6000)
    tarr = np.frombuffer(text, np.uint8)
    raw = build_raw_index(tarr)
    dense = build_dense_index(raw, text=tarr, with_samples=True)
    arrays, meta, host = build_blockbits(dense, want_ms=True)
    native = NativeQueryEngine(raw.n, raw.run_heads, raw.run_starts,
                               raw.thresholds, raw.samples_start,
                               raw.samples_last, text=tarr)

    tp = TpMsQuery(arrays, meta, make_tp_mesh(2, 4), host)
    for name in ("bblocks", "msrows", "jump_t"):
        arr = getattr(tp.arrays, name)
        for shard in arr.addressable_shards:
            assert shard.data.shape[0] == arr.shape[0] // 4, name
    for shard in tp.t512.addressable_shards:
        assert shard.data.shape[0] == tp.t512.shape[0] // 4

    reads = [mutated_substring(rng, text, 300, err=0.05) for _ in range(6)]
    reads += [rand_dna(rng, 300) for _ in range(5)]
    reads.append(text[1000:1250])          # exact substring
    out = tp.query(reads)
    nat_ptrs, nat_lens = native.query_ms([bytes(r) for r in reads])[:2]
    for i in range(len(reads)):
        assert np.array_equal(out["pointers"][i], nat_ptrs[i]), i
        assert np.array_equal(out["lengths"][i], nat_lens[i]), i

    # replicated v4-MS engine agrees too (same engine, no sharding)
    repl = ScanEngine(arrays, meta, mode="ms", host=host)
    rout = repl.query(reads)
    for i in range(len(reads)):
        assert np.array_equal(out["pointers"][i], rout["pointers"][i]), i
        assert np.array_equal(out["lengths"][i], rout["lengths"][i]), i


def test_tp_ms_doc_and_quirk_fallback(rng):
    """TP MS with doc tracking (sharded jump_d) + the reference-quirk
    fallback for reads containing index-absent characters."""
    from spumoni_tpu.engine.blockbits import build_blockbits
    from spumoni_tpu.index.format import build_doc_arrays
    from spumoni_tpu.parallel.tp import TpMsQuery

    text = rand_dna(rng, 5000)
    tarr = np.frombuffer(text, np.uint8)
    raw = build_raw_index(tarr)
    ds, de = build_doc_arrays(raw, [2500, len(tarr) - 2500])
    dense = build_dense_index(raw, text=tarr, with_samples=True,
                              doc_start=ds, doc_end=de)
    arrays, meta, host = build_blockbits(dense, want_ms=True, want_doc=True)
    native = NativeQueryEngine(
        raw.n, raw.run_heads, raw.run_starts, raw.thresholds,
        raw.samples_start, raw.samples_last, text=tarr,
        start_doc=ds, end_doc=de)

    class _NativeWrap:
        def query(self, reads):
            p, l, d = native.query_ms([bytes(r) for r in reads],
                                      with_docs=True)
            return {"pointers": p, "lengths": l, "docs": d}

    tp = TpMsQuery(arrays, meta, make_tp_mesh(2, 4), host, use_doc=True,
                   fallback=_NativeWrap())
    reads = [mutated_substring(rng, text, 250, err=0.05) for _ in range(4)]
    reads.append(text[200:400] + b"NNN" + text[3000:3100])  # absent char
    out = tp.query(reads)
    nat_p, nat_l, nat_d = native.query_ms([bytes(r) for r in reads],
                                          with_docs=True)
    for i in range(len(reads)):
        assert np.array_equal(out["pointers"][i], nat_p[i]), i
        assert np.array_equal(out["lengths"][i], nat_l[i]), i
        assert np.array_equal(out["docs"][i], nat_d[i]), i


def test_tp_ms_cli_reachable(tmp_path, rng):
    """--tp-devices for -M through pipeline.run: TP value files must be
    byte-identical to the replicated-path run."""
    from spumoni_tpu.pipeline import BuildConfig, RunConfig, build, run

    genome_path = str(tmp_path / "g.fa")
    with open(genome_path, "w") as f:
        f.write(">chr\n" + rand_dna(rng, 15000).decode() + "\n")
    reads_path = str(tmp_path / "reads.fa")
    with open(reads_path, "w") as f:
        text = open(genome_path).readlines()[1].strip().encode()
        for i in range(5):
            f.write(f">pos{i}\n"
                    f"{mutated_substring(rng, text, 280, 0.05).decode()}\n")
            f.write(f">neg{i}\n{rand_dna(rng, 280).decode()}\n")
    build(BuildConfig(ref_file=genome_path, output_prefix=str(tmp_path / "i"),
                      ms_index=True, use_minimizers=False))
    base = dict(ref_file=str(tmp_path / "i"), pattern_file=reads_path,
                ms_requested=True, min_digest=False, write_report=True)
    run(RunConfig(**base))
    repl = {ext: open(reads_path + ext, "rb").read()
            for ext in (".lengths", ".pointers", ".report")}
    run(RunConfig(tp_devices=4, **base))
    for ext, blob in repl.items():
        assert open(reads_path + ext, "rb").read() == blob, ext
