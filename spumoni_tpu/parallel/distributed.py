"""Multi-host orchestration (jax.distributed) — the scale-out runtime the
reference never had (its only parallelism is OpenMP threads,
compute_ms_pml.cpp:894; SURVEY.md §2.2 requires a first-class equivalent).

Topology: every host runs the same program; the index is replicated on every
device; hosts stream DISJOINT slices of the query file (round-robin by record
index); per-read outputs are written to per-host shard files; classification
counts are merged with a psum over the global mesh; process 0 concatenates
shard files deterministically into the single report, mirroring the
reference's one-process output layout.

The same code path runs single-process (trivial world) so tests exercise it
without a cluster; multi-process CPU simulation is covered by
tests/test_multiprocess.py via subprocesses with
jax.distributed.initialize().
"""

from __future__ import annotations

import os

import numpy as np


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> tuple[int, int]:
    """Initializes jax.distributed when a multi-process env is configured.

    Returns (process_index, process_count). Single-process when no
    coordinator/env is present.
    """
    import jax

    coordinator = coordinator or os.environ.get("SPUMONI_COORDINATOR")
    if num_processes is None and "SPUMONI_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["SPUMONI_NUM_PROCESSES"])
    if process_id is None and "SPUMONI_PROCESS_ID" in os.environ:
        process_id = int(os.environ["SPUMONI_PROCESS_ID"])
    if coordinator and num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index(), jax.process_count()


def host_shard_reads(reads_iter, process_index: int, process_count: int):
    """Deterministic round-robin host sharding of a query stream: host p
    processes records with index % process_count == p."""
    for i, item in enumerate(reads_iter):
        if i % process_count == process_index:
            yield i, item


def shard_path(base_path: str, process_index: int, process_count: int) -> str:
    if process_count == 1:
        return base_path
    return f"{base_path}.shard{process_index:04d}"


def merge_shards(base_path: str, process_count: int,
                 header: str | None = None) -> None:
    """Process-0 merge: interleaves per-host shard files back into the global
    record order (hosts wrote records i with i % P == p, in order)."""
    if process_count == 1:
        return
    readers = []
    for p in range(process_count):
        readers.append(open(shard_path(base_path, p, process_count)))
    with open(base_path, "w") as out:
        if header is not None:
            out.write(header)
        records = [_read_records(r) for r in readers]
        done = False
        while not done:
            done = True
            for p in range(process_count):
                rec = next(records[p], None)
                if rec is not None:
                    out.write(rec)
                    done = False
    for p, r in enumerate(readers):
        r.close()
        os.remove(shard_path(base_path, p, process_count))


def _read_records(f):
    """Yields one output record at a time: either a '>id' line plus its value
    line, or a single report line."""
    while True:
        line = f.readline()
        if not line:
            return
        if line.startswith(">"):
            vals = f.readline()
            yield line + vals
        else:
            yield line


def global_found_counts(local_found: int, local_total: int):
    """Merges per-host classification tallies across processes (all-gather
    over DCN under jax.distributed; identity in a single process)."""
    import jax

    if jax.process_count() == 1:
        return local_found, local_total
    import jax.experimental.multihost_utils as mhu

    total = mhu.process_allgather(np.asarray([local_found, local_total]))
    return int(total[:, 0].sum()), int(total[:, 1].sum())
