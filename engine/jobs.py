"""End-to-end maintenance jobs over a manifest Table (SURVEY 3.x traces).

Each job is: build a lazy Dataset pipeline -> stream it into immutable
parquet files via :mod:`engine.writer` -> commit ONE snapshot on the
driver (atomic manifest rename). None of these call ``ray.init``.

Jobs
----
- :func:`ingest`          schema-evolving ingest + sanitize (3.1 trace)
- :func:`merge_into`      MERGE INTO by url, LWW warc_ts (M1 milestone)
- :func:`compact`         bin-packing compaction (engine.compact)
- :func:`cluster`         Z-order/Hilbert clustering rewrite (M3)
- :func:`expire`          snapshot TTL + refcount GC (M4)
- :func:`full_maintenance` ingest -> merge -> compact -> cluster -> expire
"""

from __future__ import annotations

import hashlib
import uuid
from typing import Optional

import pyarrow as pa
import ray.data

from engine.config import EngineConfig
from engine.manifest import FileEntry, JobLog, Table
from engine.merge import merge_datasets
from engine.sanitize import sanitize_stage
from engine.writer import write_files
from engine.zorder import ZKEY_COL, cluster_dataset, collect_lang_codes
from engine import compact as compact_mod


# ---------------------------------------------------------------------------
# schema evolution (reference: dynamic field growth, transposer.py:48-49)
# ---------------------------------------------------------------------------

def unify_parquet_schemas(paths: list) -> pa.Schema:
    """Driver-side footer scan -> unified schema. Footers are metadata-only
    reads (no row groups), pooled so per-file open latency overlaps; for
    very many files fan this out with ``ray.remote`` -- at 10^6 files it
    is an embarrassingly parallel metadata pass."""
    import pyarrow.parquet as pq

    if len(paths) <= 2:
        schemas = [pq.read_schema(p) for p in paths]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(16, len(paths))) as ex:
            schemas = list(ex.map(pq.read_schema, paths))
    return pa.unify_schemas(schemas)


def align_to_schema(batch: pa.Table, schema: pa.Schema) -> pa.Table:
    """Null-fill missing columns + reorder + cast: the engine's version of
    'new keys appended dynamically, missing keys simply absent'
    (``docs/processing-engine.md:147-154``; DictWriter empty-cell
    semantics ``file_service.py:16-21``)."""
    cols = []
    for f in schema:
        if f.name in batch.column_names:
            cols.append(batch.column(f.name).cast(f.type))
        else:
            cols.append(pa.nulls(len(batch), type=f.type))
    return pa.Table.from_arrays(cols, schema=schema)


def evolved_read(paths: list, columns: Optional[list] = None) -> "ray.data.Dataset":
    """read_parquet across files with heterogeneous-but-unifiable schemas:
    missing columns surface as nulls (the manifest's ``fields`` list grown
    dynamically, reference ``transposer.py:48-49``).

    ``columns`` projects AFTER the schema-unified read: passing a
    partial schema together with ``columns=`` to read_parquet fails on
    any file missing a selected column (the reader validates each
    file's pruned schema against the partial one), the same limitation
    ``Table.scan`` documents."""
    schema = unify_parquet_schemas(paths)
    ds = ray.data.read_parquet(paths, schema=schema)
    if columns:
        ds = ds.select_columns(list(columns))
    return ds


# ---------------------------------------------------------------------------
# jobs
# ---------------------------------------------------------------------------

def _shuffle_blocks(
    table: Table,
    cfg: Optional[EngineConfig] = None,
    cpu_floor: bool = True,
    live: Optional[list] = None,
) -> int:
    """Block/partition count for shuffle stages, from manifest bytes.
    ``cfg.shuffle_blocks`` overrides (fixed data-derived partitioning,
    identical dataflow across cluster sizes).

    ~32 MB of (compressed) file bytes per block keeps the exchange from
    degenerating into O(blocks x partitions) minuscule objects where it
    becomes scheduling-bound (an all-to-all moves blocks^2 objects
    through the raylet -- in local mode ONE raylet coordinates all of
    them, so keep blocks near the core count, not above it). Bounded at
    4096 (at 10^12 rows raise DataContext.target_max_block_size instead
    of block count).
    """
    import ray

    if cfg is not None and cfg.shuffle_blocks:
        return int(cfg.shuffle_blocks)
    total_bytes = sum(f.bytes for f in (live if live is not None else table.live_files()))
    by_bytes = total_bytes // (32 << 20) + 1
    if not cpu_floor:
        return int(min(4096, by_bytes))
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return int(min(4096, max(by_bytes, min(64, cpus), 8)))


def ingest(
    table: Table,
    source,
    cfg: Optional[EngineConfig] = None,
    sanitize_cols=("text",),
    rows_per_file: Optional[int] = None,
    job_id: Optional[str] = None,
) -> dict:
    """Ingest a Dataset (or list of parquet paths) into the table:
    sanitize -> write files -> commit snapshot. Raw-first durability is
    inherited from immutability: inputs are never mutated, and a failed
    job commits nothing (reference: raw blob persisted before
    processing, ``file_service.py:32-35``)."""
    cfg = cfg if cfg is not None else EngineConfig()
    job_id = job_id or uuid.uuid4().hex[:8]
    ds = evolved_read(source) if isinstance(source, (list, tuple)) else source
    if sanitize_cols:
        ds = sanitize_stage(ds, columns=sanitize_cols)
    entries = write_files(
        ds,
        table.data_dir,
        prefix=f"ingest-{job_id}",
        stats_cols=cfg.stats_cols,
        rows_per_file=rows_per_file,
    )
    snap = table.commit(f"ingest:{job_id}", add_files=entries, schema=_entries_schema(entries))
    return {"snapshot_id": snap.snapshot_id, "files": len(entries), "rows": snap.total_rows}


def ingest_sharded(
    table: Table,
    paths: list,
    cfg: Optional[EngineConfig] = None,
    job_id: str = "ingest",
    shard_files: int = 16,
    sanitize_cols=("text",),
    rows_per_file: Optional[int] = None,
    failpoint_after: Optional[int] = None,
    fail_shard: Optional[int] = None,
) -> dict:
    """Resumable ingest: input files are processed in shards of
    ``shard_files``; each shard streams through its own pipeline and is
    recorded in the job lineage log as it completes. A rerun with the
    same ``job_id`` skips committed shards and commits ONE snapshot over
    all shard outputs (L1/L2: the ``processed_fs_id`` backfill pattern
    at partition granularity; north_rule "resumable from checkpoint with
    per-partition lineage").

    A shard whose pipeline RAISES is recorded durably in the lineage
    log with ``state="failed"`` and the error before the exception
    propagates (the reference's persisted ``error`` state,
    ``file_service.py:66-81``); a resume retries exactly the failed /
    unrecorded shards.

    ``failpoint_after``: test hook, crash after N shards committed.
    ``fail_shard``: test hook, shard index whose processing raises.
    """
    cfg = cfg if cfg is not None else EngineConfig()
    prior = table.operation_snapshot(f"ingest:{job_id}")
    if prior is not None:
        snap = table.snapshot(prior)
        return {
            "snapshot_id": prior,
            "files": len(snap.files),
            "rows": snap.total_rows,
            "shards": 0,
            "shards_skipped_resume": 0,
            "already_committed": True,
        }
    log = JobLog(table, job_id)
    done = log.committed()
    shards = [paths[i : i + shard_files] for i in range(0, len(paths), shard_files)]
    all_entries = []
    for pid, e in done.items():
        all_entries.extend(FileEntry.from_json(d) for d in e["output_files"])
    completed = len(done)
    for i, shard in enumerate(shards):
        # shard id = content hash of its input paths, NOT the ordinal:
        # a resume whose path list shifted (a glob that picked up new
        # files) must not skip a DIFFERENT file set under a recycled
        # ordinal (same hazard compact.py solves with content-hash bin
        # ids). Ordinal kept in the id only for human-readable logs.
        digest = hashlib.blake2b(
            "\n".join(shard).encode("utf-8"), digest_size=8
        ).hexdigest()
        pid = f"shard-{digest}"
        if pid in done:
            continue
        try:
            if fail_shard is not None and i == fail_shard:
                raise RuntimeError(f"injected shard failure (shard {i}, job {job_id})")
            ds = evolved_read(shard)
            if sanitize_cols:
                ds = sanitize_stage(ds, columns=sanitize_cols)
            entries = write_files(
                ds,
                table.data_dir,
                prefix=f"ingest-{job_id}-{pid}",
                stats_cols=cfg.stats_cols,
                rows_per_file=rows_per_file,
            )
        except Exception as ex:
            log.record(
                pid, input_files=shard, output_files=[], rows=0,
                state="failed", error=ex,
            )
            raise
        log.record(
            pid,
            input_files=shard,
            output_files=[e.to_json() for e in entries],
            rows=sum(e.rows for e in entries),
        )
        all_entries.extend(entries)
        completed += 1
        if failpoint_after is not None and completed >= failpoint_after:
            raise RuntimeError(f"injected failure after {completed} shards (job {job_id})")
    snap = table.commit(
        f"ingest:{job_id}", add_files=all_entries, schema=_entries_schema(all_entries)
    )
    return {
        "snapshot_id": snap.snapshot_id,
        "files": len(all_entries),
        "rows": snap.total_rows,
        "shards": len(shards),
        "shards_skipped_resume": len(done),
    }


def payload_column_shares(table: Table, sample_files: int = 4, live=None) -> dict:
    """Per-column compressed-byte share, from a few parquet FOOTERS
    (metadata-only IO). Drives the wide-merge auto-routing decision:
    at 100 TB the html payload dominates table bytes, and shipping it
    through the merge exchange is the round-1 VERDICT scale-killer #3.
    ``live``: pass an already-parsed file list to skip the manifest
    parse (a 10^6-file manifest is a real pass)."""
    import pyarrow.parquet as pq

    files = live if live is not None else table.live_files()
    step = max(1, len(files) // sample_files)
    agg: dict = {}
    total = 0
    for fe in files[::step][:sample_files]:
        md = pq.ParquetFile(fe.path).metadata
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema.split(".")[0]
                agg[name] = agg.get(name, 0) + col.total_compressed_size
                total += col.total_compressed_size
    if total == 0:
        return {}
    return {k: v / total for k, v in agg.items()}


def _auto_wide_cols(table: Table, cfg: EngineConfig, snap=None) -> list:
    """Binary columns worth routing through the two-phase wide merge:
    payload share >= cfg.merge_wide_share on a table >=
    cfg.merge_wide_min_bytes. Below the size floor the single-pass
    merge wins (the wide path costs a second input scan).

    ``snap``: the caller's already-parsed Snapshot; without it this
    probe would re-deserialize the full manifest up to three times
    (schema + two file-list walks) inside merge_into's documented
    one-parse budget."""
    if snap is None:
        snap = table.snapshot()
    schema = snap.arrow_schema()
    if schema is None:
        return []
    binary_cols = [
        f.name
        for f in schema
        if pa.types.is_binary(f.type) or pa.types.is_large_binary(f.type)
    ]
    if not binary_cols:
        return []
    if not cfg.merge_wide_single_node:
        import ray

        alive = [n for n in ray.nodes() if n.get("Alive", False)] if ray.is_initialized() else []
        if len(alive) <= 1:
            return []  # no network to save: single-pass merge wins
    total_bytes = sum(f.bytes for f in snap.files)
    if total_bytes < cfg.merge_wide_min_bytes:
        return []
    shares = payload_column_shares(table, live=snap.files)
    return [c for c in binary_cols if shares.get(c, 0.0) >= cfg.merge_wide_share]


@ray.remote(num_cpus=1)
def _merge_small_task(
    paths: list,
    data_dir: str,
    prefix: str,
    key: str,
    ts: str,
    stats_cols: tuple,
    schema: pa.Schema,
) -> list:
    """Whole-table MERGE in ONE task (small-table fast path): read ->
    LWW fold -> write. Only reached when the table's live bytes fit one
    worker's heap (``cfg.merge_small_bytes``) and there is no source
    Dataset (a source's size is unknown without executing it). The fold
    is :func:`engine.merge.merge_fold_passthrough_arrow` -- the SAME function
    the distributed per-bucket path runs, applied to all rows at once:
    bucketing is purely a parallelism device over a row-set fold, so
    semantics are unchanged by construction. At the driver bench's
    ~30 MB / 200 k-row config the distributed repartition + sort-shuffle
    groupby spends ~3 s of orchestration on ~0.5 s of fold compute
    (BASELINE.md round 4); never triggers at production scale.

    ``schema`` is the manifest's VISIBLE schema, aligned per file the
    same way ``Table.scan`` serves the distributed path (evolved
    columns null-filled, ``__``-internals dropped)."""
    from engine.merge import merge_fold_passthrough_arrow
    from engine.writer import read_tables_parallel, write_block

    tables = read_tables_parallel(paths)
    merged = pa.concat_tables([align_to_schema(t, schema) for t in tables])
    block = merge_fold_passthrough_arrow(merged, key, ts)
    return [write_block(block, data_dir, prefix, stats_cols=stats_cols)]


def merge_into(
    table: Table,
    cfg: Optional[EngineConfig] = None,
    source=None,
    job_id: Optional[str] = None,
) -> dict:
    """MERGE INTO: current table contents (optionally unioned with a new
    source Dataset) collapsed to one row per url, LWW by warc_ts with
    non-empty coalesce; NULL-url rows pass through. Rewrites the table
    (new files, old files stay until expiration -- snapshot isolation)."""
    cfg = cfg if cfg is not None else EngineConfig()
    job_id = job_id or uuid.uuid4().hex[:8]
    # ONE manifest parse per merge_into(): files + schema off the same
    # Snapshot object (a 10^6-file manifest is a real pass)
    snap = table.snapshot()
    live = snap.files
    schema = snap.arrow_schema()
    # bytes/CPU-derived bucket count, with cfg.merge_buckets as a FLOOR
    # (the user's hot-bucket / skew knob: raising it always takes effect)
    blocks = max(_shuffle_blocks(table, cfg, live=live), int(cfg.merge_buckets or 0))

    def build():
        # coalesce AT THE READ (override_num_blocks) instead of a
        # repartition exchange after it: the sort-shuffle's cost grows
        # with input block count (the planner splits these files to
        # ~290 tiny blocks and the exchange degenerates -- measured
        # 119-193 s vs 6.6 s at the 2.4 M-row scaling config), and a
        # post-read repartition fixes that only by paying a second
        # all-to-all (10.9 s -> 6.9 s at 8 CPUs without it). blocks is
        # bytes-derived, so each read task stays ~32 MB regardless of
        # file count. A union'd source keeps its own blocks and rides
        # one repartition: its block layout is unknown here and the
        # sort degenerates on many tiny blocks.
        ds = table.scan(override_num_blocks=blocks)
        if source is not None:
            ds = ds.union(source).repartition(blocks)
        return ds

    names = set(schema.names) if schema is not None else set()
    wide = [c for c in (cfg.merge_wide_cols or ()) if c in names]
    if not wide and cfg.merge_wide_auto:
        wide = _auto_wide_cols(table, cfg, snap=snap)
    if (
        not wide
        and source is None
        and live
        and schema is not None
        and not cfg.shuffle_blocks  # explicit partitioning pin wins
        and sum(f.bytes for f in live) <= cfg.merge_small_bytes
    ):
        # small-table fast path: one task, no exchange (see
        # _merge_small_task). Semantics identical: same fold function,
        # same key/ts, same per-file stats.
        rows_out = ray.get(
            _merge_small_task.remote(
                [f.path for f in live],
                table.data_dir,
                f"merge-{job_id}",
                cfg.merge_key,
                cfg.merge_ts,
                tuple(cfg.stats_cols),
                pa.schema([f for f in schema if not f.name.startswith("__")]),
            )
        )
        entries = [FileEntry.from_json(r) for r in rows_out]
    else:
        if wide:
            from engine.merge import merge_datasets_wide

            merged = merge_datasets_wide(
                build, wide, key=cfg.merge_key, ts=cfg.merge_ts, num_buckets=blocks
            )
        else:
            merged = merge_datasets(
                build(), key=cfg.merge_key, ts=cfg.merge_ts, num_buckets=blocks
            )
        entries = write_files(
            merged, table.data_dir, prefix=f"merge-{job_id}", stats_cols=cfg.stats_cols
        )
    old_paths = [f.path for f in live]
    snap = table.commit(f"merge:{job_id}", add_files=entries, remove_files=old_paths)
    return {"snapshot_id": snap.snapshot_id, "files": len(entries), "rows": snap.total_rows}


def compact(
    table: Table,
    cfg: Optional[EngineConfig] = None,
    target_bytes: Optional[int] = None,
    job_id: Optional[str] = None,
    **kwargs,
) -> dict:
    cfg = cfg if cfg is not None else EngineConfig()
    job_id = job_id or uuid.uuid4().hex[:8]
    return compact_mod.compact_table(
        table,
        target_bytes=target_bytes or cfg.target_file_bytes,
        job_id=job_id,
        stats_cols=cfg.stats_cols,
        small_fraction=cfg.compact_small_fraction,
        **kwargs,
    )


def _sort_blocks(
    table: Table, cfg: Optional[EngineConfig] = None, live: Optional[list] = None
) -> int:
    """Bytes-only block count for the clustering sort (no CPU term):
    the dataflow is then a pure property of the DATA -- identical at
    every cluster size -- and a small post-merge table doesn't pay an
    all-to-all of blocks^2 tiny objects for a sort whose data fits a
    handful of blocks. At scale the bytes term provides the sort
    parallelism (capped 4096; above that raise
    ``DataContext.target_max_block_size``); below ~32 MB the exchange
    degenerates to a near-local sort, which is exactly right.
    ``cfg.shuffle_blocks`` still overrides explicitly.

    A ROWS floor (~200k rows/block, capped at 64 from it) covers tables
    that are byte-light but row-heavy: post-merge text tables compress
    ~5:1, so a 100 MB table can still hold 5 M rows of curve-key compute
    that a 4-block sort would starve. Both terms are properties of the
    DATA (no CPU term) so the dataflow stays identical across cluster
    sizes; at production scale the bytes term dominates and the rows
    floor is a no-op.

    ``live`` lets callers that already hold the live-file list avoid a
    redundant manifest parse (a 10^6-file manifest is a real pass)."""
    if live is None:
        live = table.live_files()
    blocks = _shuffle_blocks(table, cfg, cpu_floor=False, live=live)
    if cfg is not None and cfg.shuffle_blocks:
        return blocks
    rows = sum(f.rows for f in live)
    return int(min(4096, max(blocks, min(rows // 200_000, 64))))


@ray.remote(num_cpus=1)
def _cluster_small_task(
    paths: list,
    data_dir: str,
    prefix: str,
    codes: dict,
    curve: str,
    cols: tuple,
    stats_cols: tuple,
    rows_per_file: Optional[int],
    schema: pa.Schema,
) -> list:
    """Whole-table clustering rewrite in ONE task (small-table fast
    path): read -> curve key -> in-memory sort -> write. Only reached
    when the table's live bytes fit comfortably in one worker's heap
    (``cfg.cluster_small_bytes``); the distributed sort's sample +
    range-exchange orchestration dominates actual compute ~4:1 at this
    size (BASELINE.md round 4).

    ``schema`` is the manifest's VISIBLE schema: each file is aligned
    to it (evolved columns null-filled, ``__``-internals such as a
    prior run's zkey dropped) -- the same view ``Table.scan`` serves
    the distributed path."""
    import pyarrow.compute as pc

    from engine.writer import read_tables_parallel, write_block
    from engine.zorder import add_cluster_key

    tables = read_tables_parallel(paths)
    merged = pa.concat_tables([align_to_schema(t, schema) for t in tables])
    keyed = add_cluster_key(merged, codes, curve=curve, cols=cols)
    keyed = keyed.take(pc.sort_indices(keyed, sort_keys=[(ZKEY_COL, "ascending")]))
    per = rows_per_file or len(keyed) or 1
    out = []
    for off in range(0, max(len(keyed), 1), per):
        chunk = keyed.slice(off, per)
        if len(chunk) or not out:
            out.append(write_block(chunk, data_dir, prefix, stats_cols=stats_cols))
    return out


def _codes_from_manifest(files: list, col: str) -> Optional[dict]:
    """Dense dictionary codes for ``col`` from the manifest's per-file
    distinct-value sets -- exact iff EVERY live file recorded the stat
    (a file over the cardinality cap, or written pre-stat, forces the
    scan fallback). Same sorted-distinct mapping as
    ``collect_lang_codes`` by construction. Takes the already-parsed
    file list so the caller pays ONE manifest parse, not one per
    accessor (a 10^6-file manifest is a real pass)."""
    if not files or any(col not in f.distincts for f in files):
        return None
    vals = sorted({v for f in files for v in f.distincts[col] if v is not None})
    return {v: i for i, v in enumerate(vals)}


def cluster(
    table: Table,
    cfg: Optional[EngineConfig] = None,
    rows_per_file: Optional[int] = None,
    job_id: Optional[str] = None,
) -> dict:
    """Z-order/Hilbert clustering rewrite: compute zkey -> range-partition
    sort -> write files (zkey min/max recorded per file) -> snapshot."""
    cfg = cfg if cfg is not None else EngineConfig()
    job_id = job_id or uuid.uuid4().hex[:8]
    # ONE manifest parse per cluster(): files, schema and the distinct
    # codes all come off the same Snapshot object
    snap = table.snapshot()
    live = snap.files
    mschema = snap.arrow_schema()
    # distinct codes from manifest value-set stats when every live file
    # carries them (metadata-only, no Dataset execution); fall back to a
    # pruned single-column scan -- unique(lang) must not read html bytes
    codes = _codes_from_manifest(live, cfg.cluster_cols[0])
    if codes is None:
        codes = collect_lang_codes(
            table.scan(columns=[cfg.cluster_cols[0]]), col=cfg.cluster_cols[0]
        )
    if (
        live
        and mschema is not None
        and not (cfg.shuffle_blocks)  # explicit partitioning pin wins
        and sum(f.bytes for f in live) <= cfg.cluster_small_bytes
    ):
        # small-table fast path: one task, no distributed sort (see
        # _cluster_small_task). Semantics identical: same key, same
        # global zkey order across output files, same per-file stats.
        rows_out = ray.get(
            _cluster_small_task.remote(
                [f.path for f in live],
                table.data_dir,
                f"cluster-{job_id}",
                codes,
                cfg.cluster_curve,
                tuple(cfg.cluster_cols),
                tuple(cfg.stats_cols) + (ZKEY_COL,),
                rows_per_file,
                pa.schema([f for f in mschema if not f.name.startswith("__")]),
            )
        )
        entries = [FileEntry.from_json(r) for r in rows_out]
    else:
        blocks = _sort_blocks(table, cfg, live=live)
        clustered = cluster_dataset(
            table.scan().repartition(blocks), codes, curve=cfg.cluster_curve,
            cols=tuple(cfg.cluster_cols),
        )
        entries = write_files(
            clustered,
            table.data_dir,
            prefix=f"cluster-{job_id}",
            stats_cols=tuple(cfg.stats_cols) + (ZKEY_COL,),
            rows_per_file=rows_per_file,
        )
    old_paths = [f.path for f in live]
    snap = table.commit(f"cluster:{job_id}", add_files=entries, remove_files=old_paths)
    return {"snapshot_id": snap.snapshot_id, "files": len(entries), "rows": snap.total_rows}


def dedup_lines(
    table: Table,
    cfg: Optional[EngineConfig] = None,
    text_col: str = "text",
    key_col: str = "url",
    rows_per_file: Optional[int] = None,
    job_id: Optional[str] = None,
) -> dict:
    """Maintenance op: C4-style GLOBAL line dedup committed through the
    snapshot lifecycle (full rewrite, like cluster). A line ('\\n'
    split of ``text_col``) survives only in the row with the
    lexicographically smallest ``(key, line_idx)`` among every
    occurrence corpus-wide; each row's text is reassembled from its
    surviving lines.

    Partitioning assumptions (documented): keys are UNIQUE for the
    deduped population -- run AFTER merge (the LWW merge leaves one row
    per url); rows with NULL/'' keys pass through untouched, the same
    null-key passthrough convention MERGE follows. Winner order is the
    KEY's lexicographic order (SQL ``min(url)``), so the op has an
    exact DuckDB mirror.

    Scale shape (same as :func:`engine.dedup.dedup_lines_global`):
    pass 1 exchanges only ``(h1, h2, key, idx)`` line triples and
    emits loser coordinates; pass 2 is the rewrite itself -- a full
    table pass that any rewrite op pays, co-partitioned by key hash so
    each bucket rebuilds locally. Returns the commit summary.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from engine.dedup import _pairs_buckets, hash64_strings, line_hash_pair, line_positions

    cfg = cfg if cfg is not None else EngineConfig()
    job_id = job_id or uuid.uuid4().hex[:8]
    # commit-level idempotence (the compact/ingest pattern): a rerun of
    # a job whose snapshot already landed -- driver died AFTER the
    # commit -- must be a no-op, not a second full rewrite
    prior = table.operation_snapshot(f"dedup-lines:{job_id}")
    if prior is not None:
        psnap = table.snapshot(prior)
        return {
            "snapshot_id": prior,
            "files": len(psnap.files),
            "rows": psnap.total_rows,
            "already_committed": True,
        }
    snap = table.snapshot()
    live = snap.files
    if not live:
        return {"snapshot_id": snap.snapshot_id, "files": 0, "rows": 0}
    ds = table.scan()
    num_buckets = _pairs_buckets(ds)

    def explode(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        ks, lines_all, lens = [], [], []
        for k, x in zip(keys, texts):
            if k is None or k == "":
                continue  # passthrough rows contribute no lines
            ls = (x if isinstance(x, str) else "").split("\n")
            ks.append(k)
            lines_all.extend(ls)
            lens.append(len(ls))
        if not ks:
            return pa.table(
                {"h1": pa.array([], pa.uint64()), "h2": pa.array([], pa.uint64()),
                 "key": pa.array([], pa.string()), "idx": pa.array([], pa.int64()),
                 "__bucket": pa.array([], pa.int64())}
            )
        lens = np.array(lens, np.int64)
        flat = np.asarray(lines_all, dtype=object)
        h1, h2 = line_hash_pair(flat)  # ONE hash-pair definition
        key_rep = np.repeat(np.asarray(ks, dtype=object), lens)
        idx = line_positions(lens)  # 1-based SQL convention, shared
        return pa.table(
            {"h1": pa.array(h1), "h2": pa.array(h2),
             "key": pa.array(key_rep, pa.string()), "idx": pa.array(idx),
             "__bucket": pa.array((h1 % np.uint64(num_buckets)).astype(np.int64))}
        )

    def losers(df: pd.DataFrame) -> pd.DataFrame:
        # winner per distinct line = min (key, idx); key order is the
        # SQL min(url) the oracle mirrors. ONE vectorized sort per
        # bucket (pandas C string sort), no per-line Python.
        df = df.sort_values(["h1", "h2", "key", "idx"], kind="stable")
        h1 = df["h1"].to_numpy()
        h2 = df["h2"].to_numpy()
        first = np.ones(len(df), bool)
        if len(df) > 1:
            np.logical_or(h1[1:] != h1[:-1], h2[1:] != h2[:-1], out=first[1:])
        return df.loc[~first, ["key", "idx"]]

    drops = (
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()  # lazy sort upstream executes twice otherwise
        .groupby("__bucket")
        .map_groups(
            lambda df: losers(df.drop(columns=["__bucket"])), batch_format="pandas"
        )
    )

    def corpus_side(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        valid = pc.and_kleene(pc.is_valid(keys), pc.not_equal(keys, ""))
        h = hash64_strings(pc.fill_null(keys.combine_chunks(), ""))
        bucket = np.where(
            pc.fill_null(valid, False).to_numpy(zero_copy_only=False),
            (h % np.uint64(num_buckets)).astype(np.int64),
            0,
        )
        t = t.append_column("__dl_idx", pa.nulls(len(t), pa.int64()))
        t = t.append_column("__side", pa.array(np.zeros(len(t), np.int8)))
        return t.append_column("__bucket", pa.array(bucket))

    def drop_side(t: pa.Table) -> pa.Table:
        h = hash64_strings(t.column("key").combine_chunks())
        out = {name: pa.nulls(len(t), typ) for name, typ in zip(vis_schema.names, vis_schema.types)}
        out[key_col] = t.column("key").cast(vis_schema.field(key_col).type)
        return pa.table(
            {**out,
             "__dl_idx": t.column("idx").cast(pa.int64()),
             "__side": pa.array(np.ones(len(t), np.int8)),
             "__bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int64))}
        )

    def rebuild(t: pa.Table) -> pa.Table:
        # ARROW fold, deliberately: the union's drop-side rows are
        # all-null in every non-key column, and a pandas group would
        # float64-upcast null-bearing int64 columns -- silently
        # corrupting values past 2^53 on the rewrite (the CLAUDE.md
        # 2^53 hazard class; review finding). Arrow carries typed nulls
        # losslessly, so user columns never leave Arrow here.
        side = t.column("__side").to_numpy(zero_copy_only=False)
        corp = t.filter(pa.array(side == 0)).drop_columns(["__side", "__dl_idx"])
        drt = t.filter(pa.array(side == 1))
        keys = corp.column(key_col).to_numpy(zero_copy_only=False)
        texts = corp.column(text_col).to_pylist()
        ks = pd.Series(keys)
        keyed = (ks.notna() & (ks != "")).to_numpy()
        # documented precondition, validated LOUDLY: keys co-locate by
        # hash, so duplicates are visible inside their bucket. Applying
        # one key's drop indexes to two different rows would delete the
        # wrong lines (or crash) -- refuse instead (review finding).
        if keyed.any():
            dup = ks[keyed].duplicated()
            if dup.any():
                k = ks[keyed][dup].iloc[0]
                raise ValueError(
                    f"dedup_lines requires unique {key_col!r} keys but "
                    f"{k!r} appears more than once -- run MERGE first "
                    "(NULL/'' keys pass through and may repeat)"
                )
        if len(drt):
            dk = drt.column(key_col).to_numpy(zero_copy_only=False)
            di = drt.column("__dl_idx").to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.argsort(dk, kind="stable")
            dk, di = dk[order], di[order]
            starts = np.ones(len(dk), bool)
            starts[1:] = dk[1:] != dk[:-1]
            s_idx = np.flatnonzero(starts)
            dropped = {
                dk[s]: np.sort(di[s:e])
                for s, e in zip(s_idx, np.append(s_idx[1:], len(dk)))
            }
            touched = np.flatnonzero(ks.isin(dropped.keys()).to_numpy())
            for i in touched:
                x = texts[i] if isinstance(texts[i], str) else ""
                lines = x.split("\n")
                keep = np.ones(len(lines), bool)
                keep[dropped[keys[i]] - 1] = False
                texts[i] = "\n".join([l for l, k in zip(lines, keep) if k])
        # keyed rows always come out with a (possibly empty) STRING --
        # their lines went through the dedup (NULL text = one '' line),
        # matching the oracle's coalesce. Passthrough rows keep NULL.
        # Non-str nulls (None / nan, depending on the block's transit
        # format) normalize through the isinstance check.
        texts = [
            (x if isinstance(x, str) else ("" if k else None))
            for x, k in zip(texts, keyed)
        ]
        # type from the MANIFEST schema, not the group block: a group
        # whose text slice is all-null can arrive null-TYPED, and
        # pa.array(strings, type=null) raises "Invalid null value"
        ti = corp.schema.get_field_index(text_col)
        return corp.set_column(
            ti, text_col, pa.array(texts, vis_schema.field(text_col).type)
        )

    mschema = snap.arrow_schema()
    vis_schema = pa.schema([f for f in mschema if not f.name.startswith("__")])
    both = ds.map_batches(
        corpus_side, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        drops.map_batches(drop_side, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    out = both.groupby("__bucket").map_groups(
        lambda t: rebuild(t.drop_columns(["__bucket"])), batch_format="pyarrow"
    )
    # safety net: align output blocks to the manifest's visible schema
    # (the Arrow fold preserves types by construction; this pins it)
    out = out.map_batches(
        lambda t: align_to_schema(t, vis_schema),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    entries = write_files(
        out,
        table.data_dir,
        prefix=f"linededup-{job_id}",
        stats_cols=tuple(cfg.stats_cols),
        rows_per_file=rows_per_file,
    )
    old_paths = [f.path for f in live]
    snap2 = table.commit(
        f"dedup-lines:{job_id}", add_files=entries, remove_files=old_paths
    )
    return {
        "snapshot_id": snap2.snapshot_id,
        "files": len(entries),
        "rows": snap2.total_rows,
    }


def expire(table: Table, cfg: Optional[EngineConfig] = None, now: Optional[float] = None) -> dict:
    cfg = cfg if cfg is not None else EngineConfig()
    return table.expire_snapshots(cfg.snapshot_ttl_seconds, now=now)


def dump_csv(table: Table, out_dir: str, columns: Optional[list] = None) -> str:
    """S5 conformance sink: canonical CSV dump of the current snapshot
    (the engine's DictWriter re-serialization, ``file_service.py:16-21``)
    for diffing against the reference's processed artifacts. Binary
    columns are excluded (CSV-unrepresentable)."""
    ds = table.scan(columns=columns)
    schema = ds.schema()
    drop = [n for n, t in zip(schema.names, schema.types) if pa.types.is_binary(t) or pa.types.is_large_binary(t)]
    if drop:
        ds = ds.select_columns([n for n in schema.names if n not in drop])
    ds.write_csv(out_dir)
    return out_dir


class _NormalizeFused:
    """Quality stats + language id + simhash in ONE pandas callable:
    state (regexes, profiles) built once per process, one
    arrow<->pandas conversion for the whole chain instead of three
    (the round-2 ingest-scaling fix -- format conversions were pure
    per-block overhead that scaled worse than the kernels)."""

    def __init__(self, text_col: str = "text", simhash: bool = True):
        from engine.langid import LangId
        from engine.textstats import TextStats

        self.ts = TextStats(text_col)
        self.li = LangId(text_col)
        self.simhash = simhash
        self.text_col = text_col

    def __call__(self, batch):
        batch = self.ts(batch)
        batch = self.li(batch)
        if self.simhash:
            from engine.dedup import simhash_texts

            # pass the Series straight through: the fast hasher works
            # on the Arrow buffer, so no to_pylist materialization
            batch["simhash"] = simhash_texts(batch[self.text_col])
        return batch


_NORM_CACHE: dict = {}


def _normalize_fn(batch, text_col: str = "text", simhash: bool = True, sanitize_cols=()):
    key = (text_col, simhash)
    st = _NORM_CACHE.get(key)
    if st is None:
        st = _NORM_CACHE[key] = _NormalizeFused(text_col, simhash)
    out = st(batch)
    if sanitize_cols:
        # fused tail: same Arrow sanitize kernels, same normalize->
        # sanitize order as the separate sanitize_stage, but without a
        # second full-data stage pass (one fewer block materialization
        # + 64-task wave; callers then ingest with sanitize_cols=())
        from engine.sanitize import sanitize_batch

        return sanitize_batch(
            pa.Table.from_pandas(out, preserve_index=False), columns=sanitize_cols
        )
    return out


def normalize_stage(
    ds,
    cfg: Optional[EngineConfig] = None,
    simhash: bool = True,
    sanitize_cols=(),
):
    """The north-star normalization chain: quality stats -> language id
    -> simhash content signature, one fused elastic map stage over the
    text column (see ARCHITECTURE.md section 1). ``sanitize_cols``
    additionally fuses the cell sanitizer into the SAME stage (pass
    ``sanitize_cols=()`` to the downstream ``ingest`` to avoid a
    redundant pass)."""
    cfg = cfg if cfg is not None else EngineConfig()
    return ds.map_batches(
        _normalize_fn,
        batch_format="pandas",
        fn_kwargs={"simhash": simhash, "sanitize_cols": tuple(sanitize_cols)},
        batch_size=cfg.batch_size,
    )


def full_maintenance(
    table_root: str,
    source,
    cfg: Optional[EngineConfig] = None,
    target_bytes: Optional[int] = None,
    rows_per_file: Optional[int] = None,
    normalize: bool = False,
) -> dict:
    """The flagship pipeline (SURVEY 3.1 engine trace): ingest [+
    normalize] -> MERGE -> compact -> cluster, each committing its own
    snapshot."""
    cfg = cfg if cfg is not None else EngineConfig()
    table = Table.create(table_root)
    if isinstance(source, (list, tuple)):
        source = evolved_read(source)
    # fail BEFORE the first commit on an input that can't be merged:
    # without this, ingest commits a snapshot and the merge stage then
    # dies mid-pipeline with a bare KeyError, leaving a half-maintained
    # table (found via the CLI on a raw documents.parquet)
    names = set(source.schema().names)
    missing = [c for c in (cfg.merge_key, cfg.merge_ts) if c not in names]
    if missing:
        raise ValueError(
            f"maintenance input is missing merge column(s) {missing}; "
            f"expected a pages-shaped table (see engine.pages.read_pages "
            f"to derive one), got columns {sorted(names)}"
        )
    sanitize_cols = ("text",)
    if normalize:
        # fused path: sanitize rides the normalize stage (one full-data
        # pass; byte-identical to the staged pipeline by test)
        source = normalize_stage(source, cfg, sanitize_cols=sanitize_cols)
        sanitize_cols = ()
    out = {
        "ingest": ingest(
            table, source, cfg, sanitize_cols=sanitize_cols, rows_per_file=rows_per_file
        )
    }
    out["merge"] = merge_into(table, cfg)
    out["compact"] = compact(table, cfg, target_bytes=target_bytes)
    out["cluster"] = cluster(table, cfg, rows_per_file=rows_per_file)
    out["rows"] = table.snapshot().total_rows
    return out


def _entries_schema(entries: list) -> Optional[pa.Schema]:
    """Unified schema of the just-written files (pooled metadata-only
    footer reads). All footers, not just the first: a source Dataset's
    blocks need not share one schema (e.g. a user union of two parquet
    reads without evolved_read alignment), and committing whichever
    file happened to land first silently dropped the other blocks'
    evolved columns from every subsequent scan."""
    if not entries:
        return None
    return unify_parquet_schemas([e.path for e in entries])
