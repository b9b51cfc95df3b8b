"""Streaming micro-batch upsert with a sharded mutable index -- the one
place the engine drops to raw Ray actors, per the brief: "raw
``@ray.remote`` tasks/actors only where the Dataset API genuinely can't
express the semantics (e.g. a shared mutable index)".

A continuous ingest receives micro-batches whose rows may duplicate (by
``url``) rows seen in EARLIER micro-batches. Re-running MERGE over the
whole table per micro-batch is O(table); instead a pool of index actors
holds ``key -> latest warc_ts`` partitioned by key hash:

- each micro-batch is first collapsed locally (one MERGE fold -- the
  batch is small), then its ``(key, ts)`` pairs are routed to the index
  shard owning each key,
- the shard compares-and-updates atomically (actor = serialized state
  mutation) and returns the surviving keys,
- only surviving rows are appended to the table (snapshot per
  micro-batch), so the table stays upsert-consistent without rewriting
  old data; a periodic MERGE INTO compacts superseded rows away.

Scale notes: N shards x ~100 bytes/key -> 10^9 keys per 100 GB of actor
heap across the pool; shard count is the scale lever. State is
rebuildable from the table (``rebuild_from_table``), so actor loss is
recoverable, not durable-critical.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from engine.config import EngineConfig
from engine.manifest import Table
from engine.merge import merge_fold
from engine.writer import write_files


@ray.remote
class IndexShard:
    """One shard of the key -> latest-ts index (mutable actor state)."""

    def __init__(self):
        self.latest: dict = {}

    def probe(self, keys: list, ts_us: list) -> list:
        """Read-only: True where ts >= stored ts (or unseen). >= (not >)
        matches the batch fold's last-occurrence-wins on ts ties."""
        return [
            (self.latest.get(k) is None or t >= self.latest[k])
            for k, t in zip(keys, ts_us)
        ]

    def load(self, keys: list, ts_us: list):
        """Apply winners (max-merge). Called AFTER the table commit: a
        crash between probe and load leaves the index stale-LOW, so a
        retry re-appends (harmless duplicate, compacted by MERGE) --
        never silently drops a batch, which mutate-before-commit would."""
        for k, t in zip(keys, ts_us):
            prev = self.latest.get(k)
            if prev is None or t > prev:
                self.latest[k] = t

    def size(self) -> int:
        return len(self.latest)


class StreamingUpsert:
    """Micro-batch upsert front-end for a manifest Table."""

    def __init__(
        self,
        table: Table,
        cfg: Optional[EngineConfig] = None,
        num_shards: int = 8,
    ):
        self.table = table
        self.cfg = cfg if cfg is not None else EngineConfig()
        self.key = self.cfg.merge_key
        self.ts = self.cfg.merge_ts
        self.shards = [IndexShard.remote() for _ in range(num_shards)]
        self.n = num_shards
        self.seq = 0

    def _shard_of(self, keys: pd.Series) -> np.ndarray:
        from engine.merge import _bucket_of  # ONE partition-hash invariant

        return _bucket_of(keys, self.n)

    def rebuild_from_table(self):
        """Recover index state from the table (actor restart path)."""
        df = self.table.scan(columns=[self.key, self.ts]).to_pandas()
        df = df[df[self.key].notna() & (df[self.key] != "")]
        ts_us = pd.to_datetime(df[self.ts]).astype("datetime64[us]").astype("int64")
        sh = self._shard_of(df[self.key])
        ray.get(
            [
                self.shards[s].load.remote(
                    df[self.key][sh == s].tolist(), ts_us[sh == s].tolist()
                )
                for s in range(self.n)
            ]
        )

    def upsert(self, batch: pa.Table) -> dict:
        """Apply one micro-batch: local merge fold -> index LWW filter ->
        append surviving rows as a new snapshot."""
        df = batch.to_pandas()
        null_mask = df[self.key].isna() | (df[self.key] == "")
        merged = merge_fold(df[~null_mask], self.key, self.ts)
        ts_us = pd.to_datetime(merged[self.ts]).astype("datetime64[us]").astype("int64")
        sh = self._shard_of(merged[self.key])
        # 1. read-only probe (no state change before the durable commit)
        verdicts = ray.get(
            [
                self.shards[s].probe.remote(
                    merged[self.key][sh == s].tolist(), ts_us[sh == s].tolist()
                )
                for s in range(self.n)
            ]
        )
        keep = np.zeros(len(merged), dtype=bool)
        for s, v in enumerate(verdicts):
            keep[np.flatnonzero(sh == s)] = v
        survivors = pd.concat([merged[keep], df[null_mask]], ignore_index=True)
        self.seq += 1
        if survivors.empty:
            return {"appended": 0, "snapshot_id": self.table.current_snapshot_id()}
        # 2. durable append
        entries = write_files(
            ray.data.from_pandas(survivors),
            self.table.data_dir,
            prefix=f"stream-{self.seq:06d}",
            stats_cols=self.cfg.stats_cols,
        )
        snap = self.table.commit(f"stream-append:{self.seq}", add_files=entries)
        # 3. only now advance the index (crash before this point leaves
        # the index stale-low -> retry re-appends, never loses the batch)
        win_keys = merged[self.key][keep]
        win_ts = ts_us[keep]
        win_sh = sh[keep]
        ray.get(
            [
                self.shards[s].load.remote(
                    win_keys[win_sh == s].tolist(), win_ts[win_sh == s].tolist()
                )
                for s in range(self.n)
            ]
        )
        return {"appended": len(survivors), "snapshot_id": snap.snapshot_id}
