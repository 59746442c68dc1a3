"""Query-engine parity: native CPU engine and JAX lockstep engine vs the naive
recurrence oracle and brute-force matching statistics."""

import numpy as np
import pytest

from spumoni_tpu.native import build_raw_index, NativeQueryEngine
from spumoni_tpu.index.format import build_dense_index
from spumoni_tpu.engine.arrays import to_device_arrays
from spumoni_tpu.engine.scan_engine import ScanEngine
from spumoni_tpu.engine.oracle import NaiveRLBWT, brute_force_ms

from conftest import rand_dna


def _build(text: bytes, with_samples=True):
    tarr = np.frombuffer(text, np.uint8)
    raw = build_raw_index(tarr)
    dense = build_dense_index(raw, text=tarr, with_samples=with_samples)
    native = NativeQueryEngine(raw.n, raw.run_heads, raw.run_starts,
                               raw.thresholds, raw.samples_start,
                               raw.samples_last, text=tarr)
    return raw, dense, native


def test_native_pml_matches_naive_recurrence(rng, make_reads):
    for _ in range(5):
        text = rand_dna(rng, int(rng.integers(20, 250)))
        _, _, native = _build(text)
        nv = NaiveRLBWT(text)
        reads = make_reads(rng, text, num=6, max_len=60)
        for rd, got in zip(reads, native.query_pml(reads)):
            assert np.array_equal(got, nv.query_pml(rd))


def test_native_ms_matches_brute_force(rng, make_reads):
    for _ in range(5):
        text = rand_dna(rng, int(rng.integers(20, 250)))
        _, _, native = _build(text)
        nv = NaiveRLBWT(text)
        reads = make_reads(rng, text, num=6, max_len=60)
        ptrs, lens = native.query_ms(reads)
        for rd, pt, ln in zip(reads, ptrs, lens):
            assert np.array_equal(pt, nv.query_ms_pointers(rd))
            assert np.array_equal(ln, brute_force_ms(text, rd))


def test_jax_engine_matches_native(rng, make_reads):
    for _ in range(3):
        text = rand_dna(rng, int(rng.integers(300, 1500)))
        raw, dense, native = _build(text)
        arrays, meta = to_device_arrays(dense)
        reads = make_reads(rng, text, num=12, max_len=250)

        pml = ScanEngine(arrays, meta, mode="pml").query(reads)
        for a, b in zip(pml["lengths"], native.query_pml(reads)):
            assert np.array_equal(a, b)

        ms = ScanEngine(arrays, meta, mode="ms").query(reads)
        ptrs, lens = native.query_ms(reads)
        for a, b in zip(ms["pointers"], ptrs):
            assert np.array_equal(a, b)
        for a, rd in zip(ms["lengths"], reads):
            assert np.array_equal(a, brute_force_ms(text, rd))


def test_jax_engine_reads_with_unknown_chars(rng, make_reads):
    # 'N' and other bytes absent from the index exercise the cnt==0 branch
    text = rand_dna(rng, 800)
    raw, dense, native = _build(text)
    arrays, meta = to_device_arrays(dense)
    reads = []
    for _ in range(8):
        rd = bytearray(make_reads(rng, text, num=1, max_len=120)[0])
        for k in range(len(rd)):
            if rng.random() < 0.1:
                rd[k] = ord('N')
        reads.append(bytes(rd))
    pml = ScanEngine(arrays, meta, mode="pml").query(reads)
    for a, b in zip(pml["lengths"], native.query_pml(reads)):
        assert np.array_equal(a, b)
    ms = ScanEngine(arrays, meta, mode="ms").query(reads)
    ptrs, _ = native.query_ms(reads)
    for a, b in zip(ms["pointers"], ptrs):
        assert np.array_equal(a, b)


def test_dense_index_roundtrip(tmp_path, rng):
    from spumoni_tpu.index.format import save_dense_index, load_dense_index
    text = rand_dna(rng, 500)
    tarr = np.frombuffer(text, np.uint8)
    raw = build_raw_index(tarr)
    dense = build_dense_index(raw, text=tarr, with_samples=True)
    p = str(tmp_path / "idx")
    save_dense_index(dense, p)
    loaded = load_dense_index(p)
    assert loaded.n == dense.n and loaded.r == dense.r
    for f in ("F", "cnt", "char_off", "c_start", "c_len", "c_cum", "c_thr",
              "c_ssamp", "c_esamp", "text"):
        assert np.array_equal(getattr(loaded, f), getattr(dense, f)), f
    assert loaded.last_run_sample == dense.last_run_sample


def test_extension_diag_matches_while_kernel(rng, make_reads):
    """The diagonal-run extension (one brute LCP per pointer-diagonal end +
    arithmetic fill) must equal the two-pointer while_loop kernel and brute
    force — including underflowed (negative) pointers from N chars, exact
    substrings (single diagonal), and reset-position ptr<=0 handling."""
    import jax.numpy as jnp
    from spumoni_tpu.engine.scan_engine import (build_text_words,
                                                extend_pointers_diag,
                                                extend_pointers_kernel)

    for trial in range(3):
        text = rand_dna(rng, 4000)
        raw, dense, native = _build(text)
        arrays, meta = to_device_arrays(dense)
        eng = ScanEngine(arrays, meta, mode="ms")
        reads = make_reads(rng, text, num=10, max_len=300)
        reads.append(text[100:400])                      # exact substring
        reads.append(b"ACGT" + b"N" * 30 + text[:64])    # underflow ptrs
        reads.append(b"N" * 40)                          # all-reset
        out = eng.query(reads)
        ptrs, lens = native.query_ms(reads)
        for i, rd in enumerate(reads):
            assert np.array_equal(out["lengths"][i], lens[i]), i
            assert np.array_equal(out["pointers"][i], ptrs[i]), i

        # cross-check the two kernels directly on one padded batch — only
        # for reads whose pointers are all >= 1: reads with reset/underflow
        # pointers take the reference's sequential-carry quirk path, which
        # the diag kernel intentionally delegates (ScanEngine fallback,
        # exercised by the eng.query comparison above)
        normal = [i for i, rd in enumerate(reads) if (ptrs[i] >= 1).all()]
        B = len(normal)
        L = 512
        fwd = np.zeros((B, L), np.uint8)
        pf = np.zeros((B, L), np.int64)
        rl = np.zeros((B,), np.int64)
        for j, i in enumerate(normal):
            a = np.frombuffer(reads[i], np.uint8)
            fwd[j, :len(a)] = a
            pf[j, :len(a)] = ptrs[i]
            rl[j] = len(a)
        nt = int(arrays.text.shape[0])
        tw = build_text_words(arrays.text, nt)
        a_ = np.asarray(extend_pointers_diag(
            tw, jnp.asarray(fwd), jnp.asarray(rl), jnp.asarray(pf), nt))
        b_ = np.asarray(extend_pointers_kernel(
            arrays.text, jnp.asarray(fwd), jnp.asarray(rl),
            jnp.asarray(pf), nt))
        for j in range(B):
            assert np.array_equal(a_[j, :rl[j]], b_[j, :rl[j]]), j
        # hybrid wide-window escalation path (text_wide) must match too —
        # the exact-substring read (300-byte single diagonal) forces the
        # 256 B phase
        from spumoni_tpu.engine.scan_engine import build_text_wide
        twide = build_text_wide(arrays.text, nt)
        c_ = np.asarray(extend_pointers_diag(
            tw, jnp.asarray(fwd), jnp.asarray(rl), jnp.asarray(pf), nt,
            text_wide=twide))
        for j in range(B):
            assert np.array_equal(c_[j, :rl[j]], b_[j, :rl[j]]), j


def test_extension_diag2_compaction_matches_v2(rng, make_reads):
    """The end-compacted brute pass (v3) must equal v2 and the two-pointer
    oracle, including when a segment holds MORE active ends than one
    compaction group (chunk_lanes < ends per segment forces the outer
    recompaction loop) and when segments cross read boundaries."""
    import jax.numpy as jnp
    from spumoni_tpu.engine.scan_engine import (build_text_words,
                                                extend_pointers_diag,
                                                extend_pointers_diag2,
                                                extend_pointers_kernel)

    text = rand_dna(rng, 6000)
    raw, dense, native = _build(text)
    arrays, meta = to_device_arrays(dense)
    nt = int(arrays.text.shape[0])
    tw = build_text_words(arrays.text, nt)

    reads = make_reads(rng, text, num=14, max_len=256)
    reads.append(text[100:350])                  # one diagonal, long LCP
    # pathological: alternating random bases break every diagonal -> ~all
    # in-read positions are ends
    reads.append(bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 256)))
    ptrs, _ = native.query_ms(reads)
    normal = [i for i in range(len(reads)) if (ptrs[i] >= 1).all()]
    B, L = len(normal), 256
    fwd = np.zeros((B, L), np.uint8)
    pf = np.zeros((B, L), np.int64)
    rl = np.zeros((B,), np.int64)
    for j, i in enumerate(normal):
        a = np.frombuffer(reads[i], np.uint8)[:L]
        fwd[j, :len(a)] = a
        pf[j, :len(a)] = ptrs[i][:L]
        rl[j] = len(a)
    v2 = np.asarray(extend_pointers_diag(
        tw, jnp.asarray(fwd), jnp.asarray(rl), jnp.asarray(pf), nt))
    oracle = np.asarray(extend_pointers_kernel(
        arrays.text, jnp.asarray(fwd), jnp.asarray(rl), jnp.asarray(pf), nt))
    # chunk_lanes=64 << ends per 1024-position segment: outer loop must
    # recompact several times; also cover SEG == BL and CH == SEG
    for seg, ch in ((1024, 64), (B * L, 16384), (512, 512)):
        v3 = np.asarray(extend_pointers_diag2(
            tw, jnp.asarray(fwd), jnp.asarray(rl), jnp.asarray(pf), nt,
            seg_positions=seg, chunk_lanes=ch))
        for j in range(B):
            assert np.array_equal(v3[j, :rl[j]], v2[j, :rl[j]]), (seg, ch, j)
            assert np.array_equal(v3[j, :rl[j]], oracle[j, :rl[j]]), \
                (seg, ch, j)


def test_extension_sweep_matches_v2(rng, make_reads):
    """The bulk-sweep extension (v4: one 64 B byte-compare per flat
    position + per-read top-K long-tail rounds) must equal v2 and the
    two-pointer oracle — including reads whose survivor count exceeds K
    (forces multiple extraction rounds), exact substrings (single long
    diagonal), and tiny chunk sizes crossing read boundaries."""
    import jax.numpy as jnp
    from spumoni_tpu.engine.scan_engine import (build_text_wide,
                                                build_text_words,
                                                extend_pointers_diag,
                                                extend_pointers_kernel,
                                                extend_pointers_sweep)

    # repetitive text -> long post-jump tails (many LCP >= 64 survivors)
    unit = rand_dna(rng, 1500)
    text = unit * 3 + rand_dna(rng, 2000)
    raw, dense, native = _build(text)
    arrays, meta = to_device_arrays(dense)
    nt = int(arrays.text.shape[0])
    tw = build_text_words(arrays.text, nt)
    twide = build_text_wide(arrays.text, nt)

    reads = make_reads(rng, text, num=12, max_len=256)
    reads.append(text[100:350])                  # one diagonal, long LCP
    reads.append(unit[:200] + unit[:56])         # repeat-heavy: many tails
    reads.append(bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 256)))
    ptrs, _ = native.query_ms(reads)
    normal = [i for i in range(len(reads)) if (ptrs[i] >= 1).all()]
    B, L = len(normal), 256
    fwd = np.zeros((B, L), np.uint8)
    pf = np.zeros((B, L), np.int64)
    rl = np.zeros((B,), np.int64)
    for j, i in enumerate(normal):
        a = np.frombuffer(reads[i], np.uint8)[:L]
        fwd[j, :len(a)] = a
        pf[j, :len(a)] = ptrs[i][:L]
        rl[j] = len(a)
    v2 = np.asarray(extend_pointers_diag(
        tw, jnp.asarray(fwd), jnp.asarray(rl), jnp.asarray(pf), nt))
    oracle = np.asarray(extend_pointers_kernel(
        arrays.text, jnp.asarray(fwd), jnp.asarray(rl), jnp.asarray(pf), nt))
    # K=1 forces a round per survivor; also cover chunk < L, defaults, and
    # the memory-tight 64 B phase-B fallback (text_wide=None)
    for chp, K, tch, twd in ((4096, 1, 512, twide), (1024, 2, 256, twide),
                             (262144, 4, 16384, twide), (4096, 2, 512, None)):
        v4 = np.asarray(extend_pointers_sweep(
            tw, jnp.asarray(fwd), jnp.asarray(rl), jnp.asarray(pf), nt,
            twd, chunk_positions=chp, K=K, tail_chunk=tch))
        for j in range(B):
            assert np.array_equal(v4[j, :rl[j]], v2[j, :rl[j]]), (chp, K, j)
            assert np.array_equal(v4[j, :rl[j]], oracle[j, :rl[j]]), \
                (chp, K, j)


def test_classify_only_matches_host_binmax(rng, make_reads):
    """ScanEngine.classify (fused on-device bin-max, O(B) summaries) must
    agree with host binmax.classify on query values — both modes, including
    the anomalous-pointer MS fallback lane (read with N)."""
    from spumoni_tpu.classify import binmax
    from spumoni_tpu.engine.layered import build_layered

    text = rand_dna(rng, 6000)
    tarr = np.frombuffer(text, np.uint8)
    raw = build_raw_index(tarr)
    dense = build_dense_index(raw, text=tarr, with_samples=True)
    reads = make_reads(rng, text, num=10, max_len=500)
    reads.append(b"N" * 40 + text[100:400])   # anomalous MS pointers
    arrays, meta, host = build_layered(dense)
    for mode in ("pml", "ms"):
        eng = ScanEngine(arrays, meta, mode=mode, host=host)
        st = eng.classify(reads, 150, 5)
        vals = eng.query(reads)["lengths"]
        for i, v in enumerate(vals):
            r_ = binmax.classify(v, 150, 5)
            assert st["found"][i] == (r_.status == "FOUND"), (mode, i)
            assert st["above"][i] == r_.bins_above, (mode, i)
            assert st["below"][i] == r_.bins_below, (mode, i)
            assert st["sum_maxes"][i] == int(r_.bin_maxes.sum()), (mode, i)


def test_sweep_two_gather_text_matches(rng):
    """extend_pointers_sweep with the memory-lean [rows, 8] text table
    (build_text_words8 + two pipelined gathers per window) must produce the
    same lengths as the [rows, 17] one-gather table."""
    import jax.numpy as jnp
    from spumoni_tpu.engine.scan_engine import (build_text_words,
                                                build_text_rows512,
                                                build_text_wide,
                                                extend_pointers_sweep)
    from spumoni_tpu.native import build_raw_index, NativeQueryEngine

    acgt = np.frombuffer(b"ACGT", np.uint8)
    text = rng.choice(acgt, size=30_000)
    raw = build_raw_index(text)
    native = NativeQueryEngine(raw.n, raw.run_heads, raw.run_starts,
                               raw.thresholds, raw.samples_start,
                               raw.samples_last, text=text)
    B, L = 16, 256
    fwd = np.zeros((B, L), np.uint8)
    lens = np.zeros((B,), np.int64)
    reads = []
    for i in range(B):
        st = int(rng.integers(0, len(text) - L))
        rd = text[st:st + L].copy()
        mut = rng.random(L) < 0.04
        rd[mut] = rng.choice(acgt, size=int(mut.sum()))
        reads.append(rd.tobytes())
        fwd[i] = rd
        lens[i] = L
    ptrs = native.query_ms(reads, with_lengths=False)
    ptrs_fwd = np.stack(ptrs)
    nt = len(text)
    t_d = jnp.asarray(text)
    tw17 = build_text_words(t_d, nt)
    tw8 = build_text_rows512(t_d, nt)
    twide = build_text_wide(t_d, nt)
    a = np.asarray(extend_pointers_sweep(
        tw17, jnp.asarray(fwd), jnp.asarray(lens.astype(np.int64)),
        jnp.asarray(ptrs_fwd), nt, twide))
    b = np.asarray(extend_pointers_sweep(
        tw8, jnp.asarray(fwd), jnp.asarray(lens.astype(np.int64)),
        jnp.asarray(ptrs_fwd), nt, None, text_two_gather=True))
    assert np.array_equal(a, b)
