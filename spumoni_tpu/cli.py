"""Command-line interface: `spumoni-tpu build` / `spumoni-tpu run`.

Flag-compatible with the reference CLI (/root/reference/src/spumoni.cpp:32-206)
where the semantics carry over, plus TPU-specific options (--device, batching).
"""

from __future__ import annotations

import argparse
import sys

from .pipeline import (BuildConfig, RunConfig, build, import_reference_build,
                       run)


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="spumoni-tpu",
        description="TPU-native matching-statistics engine "
                    "(MS/PML computation and read classification)")
    sub = p.add_subparsers(dest="command", required=True)

    b = sub.add_parser("build", help="build the MS/PML index for a reference")
    b.add_argument("-r", "--ref", dest="ref_file", default="",
                   help="path to reference FASTA (or general text with -g)")
    b.add_argument("-i", "--filelist", dest="input_list", default="",
                   help="file with a list of FASTA files to index")
    b.add_argument("-o", "--prefix", dest="output_prefix", required=True,
                   help="output prefix for index file(s)")
    b.add_argument("-M", "--MS", dest="ms_index", action="store_true",
                   help="build an index for computing MSs")
    b.add_argument("-P", "--PML", dest="pml_index", action="store_true",
                   help="build an index for computing PMLs")
    b.add_argument("-g", "--general-text", dest="is_general_text",
                   action="store_true", help="input is general text")
    b.add_argument("-c", "--no-rev-comp", dest="use_rev_comp",
                   action="store_false", help="do not add reverse complement")
    b.add_argument("-n", "--no-digest", dest="use_minimizers",
                   action="store_false", help="turn off minimizer digestion")
    b.add_argument("-m", "--minimizer-alphabet", dest="use_promotions",
                   action="store_true", help="use alphabet-promoted minimizers")
    b.add_argument("-a", "--dna-minimizer", dest="use_dna_letters",
                   action="store_true", help="use DNA-letter minimizers")
    b.add_argument("-K", "--small-window", dest="k", type=int, default=4)
    b.add_argument("-W", "--large-window", dest="w", type=int, default=11)
    b.add_argument("-d", "--doc-array", dest="build_doc", action="store_true",
                   help="build the document array")
    b.add_argument("-w", "--window", dest="bin_size", type=int, default=150,
                   help="classification bin size in bp")
    b.add_argument("-k", "--keep", dest="keep_files", action="store_true",
                   help="keep temporary files")
    b.add_argument("-v", "--verbose", action="store_true")
    b.add_argument("--build-method", dest="build_method",
                   choices=["auto", "sais", "pfp"], default="auto",
                   help="native construction path: in-memory SA-IS or "
                        "prefix-free parsing (identical output; pfp uses "
                        "O(parse+dict) memory for very large references)")
    b.add_argument("--emit-ref-formats", dest="emit_ref_formats",
                   action="store_true",
                   help="also write the reference binary's 5-byte "
                        ".bwt.heads/.bwt.len/.thr_pos/.ssa/.esa intermediates")

    ir = sub.add_parser(
        "import-ref",
        help="build run-ready indexes from a reference spumoni build's "
             "intermediate files (.bwt.heads/.bwt.len/.thr_pos/.ssa/.esa)")
    ir.add_argument("-r", "--ref", dest="ref_file", required=True,
                    help="built-reference path the intermediates are named "
                         "after (usually <prefix>.fa)")
    ir.add_argument("-M", "--MS", dest="ms_index", action="store_true")
    ir.add_argument("-P", "--PML", dest="pml_index", action="store_true")
    ir.add_argument("-d", "--doc-array", dest="build_doc",
                    action="store_true",
                    help="rebuild the document array from the imported SA "
                         "samples + <ref>.fdi (doc_array.cpp:18-108)")
    ir.add_argument("-m", "--minimizer-alphabet", dest="use_promotions",
                    action="store_true")
    ir.add_argument("-a", "--dna-minimizer", dest="use_dna_letters",
                    action="store_true")
    ir.add_argument("-K", "--small-window", dest="k", type=int, default=4)
    ir.add_argument("-W", "--large-window", dest="w", type=int, default=11)
    ir.add_argument("-w", "--window", dest="bin_size", type=int, default=150)

    r = sub.add_parser("run", help="compute MS/PML for reads against an index")
    r.add_argument("-r", "--ref", dest="ref_file", required=True,
                   help="index prefix (as given to build -o)")
    r.add_argument("-p", "--pattern", dest="pattern_file", required=True,
                   help="query reads (FASTA/FASTQ, or general text with -g)")
    r.add_argument("-M", "--MS", dest="ms_requested", action="store_true")
    r.add_argument("-P", "--PML", dest="pml_requested", action="store_true")
    r.add_argument("-g", "--general", dest="is_general_text",
                   action="store_true")
    r.add_argument("-d", "--doc-array", dest="use_doc", action="store_true")
    r.add_argument("-c", "--classify", dest="write_report", action="store_true")
    r.add_argument("-n", "--no-digest", dest="min_digest",
                   action="store_false")
    r.add_argument("-m", "--minimizer-alphabet", dest="use_promotions",
                   action="store_true")
    r.add_argument("-a", "--dna-minimizer", dest="use_dna_letters",
                   action="store_true")
    r.add_argument("-K", "--small-window", dest="k", type=int, default=4)
    r.add_argument("-W", "--large-window", dest="w", type=int, default=11)
    r.add_argument("-w", "--window", dest="bin_size", type=int, default=150)
    r.add_argument("-t", "--threads", dest="threads", type=int, default=1,
                   help="CPU threads (device=cpu)")
    r.add_argument("--device", choices=["tpu", "cpu"], default="tpu",
                   help="query engine backend (default: tpu)")
    r.add_argument("--engine", choices=["auto", "layered", "occ", "bits"],
                   default="auto",
                   help="TPU kernel layout: block-bits v4 (PML default when "
                        "eligible), layered v2 (MS/doc and large indexes), "
                        "occ-block v3 (kept for stronger-VPU parts)")
    r.add_argument("--batch-bases", dest="batch_bases", type=int,
                   default=33_554_432, help="bases per device batch (the "
                        "scan step is latency-floored, so reads/s scales "
                        "with lanes per kernel call)")
    r.add_argument("--tp-devices", dest="tp_devices", type=int, default=0,
                   help="ICI-sharded index: shard the index rows over this "
                        "many devices on the 'model' mesh axis (classify-"
                        "only; 0 = auto when the index exceeds the HBM "
                        "budget, -1 = never)")
    r.add_argument("--ks-report", dest="ks_report", action="store_true",
                   help="classify via windowed KS test instead of bin-max")
    r.add_argument("--resume", dest="resume", action="store_true",
                   help="resume from the durable read cursor")
    r.add_argument("--report-only", dest="report_only", action="store_true",
                   help="with -c: write only the .report (no value files); "
                        "classification is fused on device and only O(B) "
                        "verdict summaries leave the chip")
    return p


def main(argv=None) -> int:
    args = _build_parser().parse_args(argv)
    kwargs = {k: v for k, v in vars(args).items() if k != "command"}
    if args.command == "build":
        if args.is_general_text:
            kwargs["use_minimizers"] = False
        cfg = BuildConfig(**kwargs)
        build(cfg)
        return 0
    if args.command == "import-ref":
        if not args.ms_index and not args.pml_index:
            raise SystemExit("import-ref: at least one of -M/-P is required")
        out = args.ref_file
        for ext in (".fa", ".bin"):
            if out.endswith(ext):
                out = out[:-len(ext)]
        cfg = BuildConfig(output_prefix=out, **kwargs)
        import_reference_build(cfg)
        return 0
    if args.command == "run":
        if args.is_general_text:
            kwargs["min_digest"] = False
        # multi-host: SPUMONI_COORDINATOR / SPUMONI_NUM_PROCESSES /
        # SPUMONI_PROCESS_ID env vars activate jax.distributed
        from .parallel.distributed import initialize
        pidx, pcount = initialize()
        cfg = RunConfig(process_index=pidx, process_count=pcount, **kwargs)
        run(cfg)
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
