"""Engine configuration.

Generalizes the reference's env-based settings
(``backend/app/core/config.py:9-46``: size caps, retention hours) into a
small dataclass carried by jobs. All values have scale-aware defaults:
the same config shape drives a 4-CPU test session and a 256-node
cluster; only the numbers change.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    # --- file layout -----------------------------------------------------
    #: target output data-file size for compaction / ingest (bytes).
    #: Files below ``compact_small_threshold`` are compaction candidates.
    target_file_bytes: int = 128 * 1024 * 1024
    #: a live file smaller than this fraction of target is "small" and
    #: eligible for bin-packing compaction.
    compact_small_fraction: float = 0.75

    # --- merge -----------------------------------------------------------
    #: merge key column (reference: user-pluggable ``id_field``,
    #: ``backend/app/api/v1/endpoints/files.py:17-20``).
    merge_key: str = "url"
    #: last-writer-wins ordering column (replaces the reference's
    #: positional row order, ``csv_handler.py:86-95``).
    merge_ts: str = "warc_ts"
    #: number of hash buckets for the MERGE shuffle. Scale with cluster
    #: size: ~2-4x total cores so stragglers rebalance.
    merge_buckets: int = 64
    #: wide binary payload columns kept OUT of the merge shuffle via the
    #: two-phase winner-retrieval path (merge_datasets_wide); empty ->
    #: auto-detect (see merge_wide_auto), () with auto off -> single-pass
    #: merge moving full rows.
    merge_wide_cols: tuple = ()
    #: auto-route binary columns through the wide path when the table is
    #: big enough that payload bytes dominate the exchange. A column
    #: qualifies when its compressed-byte share (sampled from parquet
    #: footers) >= merge_wide_share AND total live bytes >=
    #: merge_wide_min_bytes. Local-scale tables stay on the single-pass
    #: merge (the wide path's second input pass loses below ~100 MB).
    merge_wide_auto: bool = True
    merge_wide_share: float = 0.4
    merge_wide_min_bytes: int = 192 * 1024 * 1024
    #: the wide path trades TWO extra input passes for keeping payload
    #: bytes off the exchange -- a win only when the exchange crosses a
    #: network. On a single node the "shuffle" is shared-memory object
    #: store, and the wide path measured 2.5x slower (BASELINE.md), so
    #: auto-routing additionally requires a multi-node cluster unless
    #: this forces it on.
    merge_wide_single_node: bool = False
    #: tables at or below this many live manifest bytes (and no source
    #: Dataset) skip the merge exchange entirely: ONE Ray task reads the
    #: files, runs the identical LWW fold over all rows at once and
    #: writes the output. The fold is a row-set operation -- bucketing
    #: is purely a parallelism device -- so semantics are unchanged by
    #: construction. Same rationale/measurements as
    #: ``cluster_small_bytes``: at 30 MB / 200 k rows the distributed
    #: repartition + sort-shuffle groupby cost ~3 s of orchestration
    #: for ~0.5 s of fold compute. Never triggers at production scale.
    merge_small_bytes: int = 64 * 1024 * 1024

    # --- clustering ------------------------------------------------------
    cluster_cols: tuple = ("lang", "url")
    #: 'zorder' or 'hilbert'
    cluster_curve: str = "zorder"
    #: tables at or below this many live manifest bytes skip the
    #: distributed sort entirely: ONE Ray task reads the files, computes
    #: the curve key, sorts in memory and writes the output (a
    #: post-merge table this small is a single block anyway, and the
    #: sort pipeline's sample/shuffle orchestration costs ~4x the actual
    #: work -- measured 2.3s orchestration vs 0.4s compute at 90k rows).
    #: At production scale this path never triggers.
    cluster_small_bytes: int = 64 * 1024 * 1024

    # --- skew handling ---------------------------------------------------
    #: a single partition-key value holding more than this many rows is
    #: salted into sub-partitions (north_rule: dominant ``lang`` values).
    salt_threshold_rows: int = 1_000_000
    salt_buckets: int = 8

    # --- retention (reference: 24h TTL, ``cleanup.py:13``) ---------------
    snapshot_ttl_seconds: float = 24 * 3600.0

    # --- stats recorded per data file in the manifest --------------------
    stats_cols: tuple = ("url", "lang", "warc_ts")

    # --- execution -------------------------------------------------------
    #: rows per map_batches batch for text-sized rows; binary-heavy
    #: stages (html) should pass an explicit smaller batch_size.
    batch_size: int = 16384
    #: fixed shuffle block/partition count for merge/cluster exchanges.
    #: None -> derived from manifest bytes and cluster CPUs. Set it when
    #: comparing cluster sizes: partitioning should be a property of the
    #: DATA, not the cluster, so the same job runs the identical
    #: dataflow at N and 4N nodes (the north_rule scaling measurement).
    shuffle_blocks: int | None = None

    extra: dict = field(default_factory=dict)
