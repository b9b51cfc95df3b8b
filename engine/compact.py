"""Bin-packing small-file compaction with per-bin lineage and resume (L5).

Generalizes the reference's rewrite-a-clean-artifact step
(``file_service.py:42-45``) to table maintenance: coalesce undersized
data files into ~target-size files, grouped by the files' partition
label (and ordered by their min-stat so clustering locality survives),
rewriting the manifest atomically at the end.

Execution model: the *planner* is pure driver-side metadata arithmetic
over the manifest (no data touched). Each resulting bin is rewritten by
one Ray task that reads only its own input files and writes exactly one
deterministic output file -- raw ``@ray.remote`` is used deliberately
here: the unit of work is "a bin of files", a side-effecting rewrite
with per-bin lineage, which the Dataset API has no natural shape for
(SURVEY 2.10 L5). Lineage is appended to the job log *as each bin
completes* (``ray.wait`` loop), so a killed run resumes by skipping
committed bins; deterministic output names make retries overwrite
rather than duplicate.

Skew: a partition whose pending bytes exceed ``salt_threshold`` is
simply split into more bins (bins are capped at target size) -- bins are
the salt granules; their ids are recorded in lineage.
"""

from __future__ import annotations

import os
from typing import Optional

import ray

from engine.manifest import FileEntry, JobLog, Table


def plan_bins(
    files: list,
    target_bytes: int,
    small_fraction: float = 0.75,
) -> tuple:
    """First-fit-decreasing bin packing of undersized files, per partition.

    Returns ``(bins, untouched)`` where each bin is a list[FileEntry]
    whose total is ~target_bytes. Files already >= small_fraction *
    target pass through untouched. A bin of one file is pointless ->
    untouched.
    """
    small_cut = int(target_bytes * small_fraction)
    by_part: dict = {}
    untouched = []
    for fe in files:
        if fe.bytes >= small_cut:
            untouched.append(fe)
        else:
            by_part.setdefault(fe.partition, []).append(fe)

    bins = []
    for part in sorted(by_part, key=lambda p: (p is None, p)):
        group = by_part[part]
        # order by min-stat of the first stats col if present, so
        # clustering locality survives compaction; else by path.
        def sort_key(fe: FileEntry):
            # stringify stat minima: files in one partition may carry
            # different stat columns/types (e.g. int __zkey from a
            # cluster job next to str url from a later ingest) and a
            # mixed int/str tuple comparison would raise TypeError
            for prio, col in enumerate(("__zkey", "url", "lang")):
                if col in fe.stats and fe.stats[col][0] is not None:
                    v = fe.stats[col][0]
                    return (0, prio, str(v).zfill(24) if isinstance(v, int) else str(v), fe.path)
            return (1, 0, "", fe.path)

        group.sort(key=sort_key)
        cur, cur_bytes = [], 0
        for fe in group:
            if cur and cur_bytes + fe.bytes > target_bytes:
                bins.append(cur)
                cur, cur_bytes = [], 0
            cur.append(fe)
            cur_bytes += fe.bytes
        if cur:
            bins.append(cur)
    # single-file bins: nothing to gain
    real_bins = []
    for b in bins:
        if len(b) == 1:
            untouched.append(b[0])
        else:
            real_bins.append(b)
    return real_bins, untouched


@ray.remote(num_cpus=1)
def _rewrite_bin(
    paths: list,
    out_path: str,
    stats_cols: tuple,
    partition: Optional[str],
    compression: str = "zstd",
) -> dict:
    """Read a bin's files, write one file; pure pyarrow inside the task.

    At 100 TB each bin is ~one target file (128 MB-1 GB) -- well within
    a worker's heap; thousands of bins run concurrently.
    """
    import pyarrow.parquet as pq
    import pyarrow as pa

    from engine.writer import _file_distincts, _file_stats, read_tables_parallel

    # a bin is many SMALL files by construction; reading them serially
    # pays per-file open/decode latency len(paths) times over
    merged = pa.concat_tables(read_tables_parallel(paths), promote_options="default")
    # unique tmp per ATTEMPT: after a crashed run, orphaned in-flight
    # tasks may still be writing this bin's deterministic out_path; a
    # shared ".tmp" name lets the loser's os.replace hit
    # FileNotFoundError. Unique tmp + atomic replace = last writer
    # wins with identical content (same input set by construction).
    import uuid

    tmp = out_path + f".tmp-{uuid.uuid4().hex[:8]}"
    pq.write_table(merged, tmp, compression=compression)
    os.replace(tmp, out_path)
    return {
        "path": out_path,
        "rows": len(merged),
        "bytes": os.path.getsize(out_path),
        "partition": partition,
        "stats": _file_stats(merged, stats_cols),
        "distincts": _file_distincts(merged, stats_cols),
    }


def compact_table(
    table: Table,
    target_bytes: int,
    job_id: str,
    stats_cols=("url", "lang", "warc_ts"),
    small_fraction: float = 0.75,
    max_in_flight: int = 64,
    failpoint_after: Optional[int] = None,
) -> dict:
    """Run (or resume) a compaction job; commit one new snapshot.

    ``failpoint_after``: test hook -- raise after N bins committed to the
    lineage log (before the snapshot commit), simulating a crash
    (FIXTURES.md F5 resume scenario).
    """
    prior = table.operation_snapshot(f"compact:{job_id}")
    if prior is not None:
        psnap = table.snapshot(prior)
        return {
            "snapshot_id": prior,
            "bins": 0,
            "bins_skipped_resume": 0,
            "files_before": len(psnap.files),
            "files_after": len(psnap.files),
            "rows": psnap.total_rows,
            "already_committed": True,
        }
    snap = table.snapshot()
    bins, untouched = plan_bins(snap.files, target_bytes, small_fraction)
    log = JobLog(table, job_id)
    done = log.committed()

    # bins are identified by a CONTENT id (hash of the sorted input
    # paths), not a planning ordinal: if the snapshot changed between a
    # crash and the resume, re-planned ordinals could bind to different
    # file sets and a skipped "bin-00003" would not correspond to the
    # files actually removed. A content id only matches when the bin's
    # exact input set re-plans identically; changed bins re-run.
    import hashlib

    def bin_id(b) -> str:
        paths = "\n".join(sorted(fe.path for fe in b))
        return "bin-" + hashlib.blake2b(paths.encode(), digest_size=8).hexdigest()

    planned_ids = {bin_id(b) for b in bins}
    # only resume entries whose input set is still planned; stale
    # entries (snapshot moved on) are ignored -- their outputs remain
    # as orphans for gc_orphans
    done = {pid: e for pid, e in done.items() if pid in planned_ids}
    new_entries = {pid: FileEntry.from_json(e["output_files"][0]) for pid, e in done.items()}
    replaced = {p for e in done.values() for p in e["input_files"]}

    pending = []
    for b in bins:
        pid = bin_id(b)
        if pid in done:
            continue
        out_path = os.path.join(table.data_dir, f"compact-{job_id}-{pid}.parquet")
        pending.append((pid, b, out_path))

    in_flight = {}
    committed_count = len(done)
    idx = 0
    while idx < len(pending) or in_flight:
        while idx < len(pending) and len(in_flight) < max_in_flight:
            pid, b, out_path = pending[idx]
            ref = _rewrite_bin.remote(
                [fe.path for fe in b], out_path, tuple(stats_cols), b[0].partition
            )
            in_flight[ref] = (pid, b)
            idx += 1
        ready, _ = ray.wait(list(in_flight), num_returns=1)
        for ref in ready:
            pid, b = in_flight.pop(ref)
            try:
                entry_json = ray.get(ref)
            except Exception as ex:
                # durable failure record (reference state machine's
                # ``error`` state, file_service.py:66-81): the crashed
                # bin is visible in the log and retried on resume
                # (failed entries are not in committed()).
                log.record(
                    pid,
                    input_files=[fe.path for fe in b],
                    output_files=[],
                    rows=0,
                    state="failed",
                    error=ex,
                )
                for r in in_flight:
                    ray.cancel(r, force=True)
                raise
            log.record(
                pid,
                input_files=[fe.path for fe in b],
                output_files=[entry_json],
                rows=entry_json["rows"],
            )
            new_entries[pid] = FileEntry.from_json(entry_json)
            replaced.update(fe.path for fe in b)
            committed_count += 1
            if failpoint_after is not None and committed_count >= failpoint_after:
                for r in in_flight:
                    ray.cancel(r, force=True)
                raise RuntimeError(
                    f"injected failure after {committed_count} bins (job {job_id})"
                )
    new_files = [new_entries[pid] for pid in sorted(new_entries)]
    new_snap = table.commit(
        f"compact:{job_id}", add_files=new_files, remove_files=sorted(replaced)
    )
    return {
        "snapshot_id": new_snap.snapshot_id,
        "bins": len(bins),
        "bins_skipped_resume": len(done),
        "files_before": len(snap.files),
        "files_after": len(new_snap.files),
        "rows": new_snap.total_rows,
    }
