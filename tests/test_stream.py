"""Streaming micro-batch upsert via the sharded mutable index actors."""

import datetime as dt

import pandas as pd
import pyarrow as pa

from engine.config import EngineConfig
from engine.manifest import Table
from engine.stream import StreamingUpsert


def _ts(i):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=i)


def _batch(rows):
    return pa.table(
        {
            "url": [r[0] for r in rows],
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "text": [r[2] for r in rows],
            "lang": ["en"] * len(rows),
        }
    )


def test_streaming_upsert_lww_across_microbatches(tmp_table_root, ray_session):
    t = Table.create(tmp_table_root)
    s = StreamingUpsert(t, EngineConfig(), num_shards=4)

    r1 = s.upsert(_batch([("u1", _ts(5), "v1"), ("u2", _ts(5), "w1"), (None, _ts(1), "noid")]))
    assert r1["appended"] == 3

    # second micro-batch: u1 older (dropped), u2 newer (kept), u3 new
    r2 = s.upsert(_batch([("u1", _ts(3), "stale"), ("u2", _ts(9), "w2"), ("u3", _ts(1), "x1")]))
    assert r2["appended"] == 2

    df = t.scan().to_pandas()
    assert len(df) == 5  # 3 + 2 appended (u2 has two versions until compaction)
    assert "stale" not in set(df.text)
    assert {"w1", "w2"} <= set(df.text)

    # a periodic MERGE INTO collapses superseded versions
    from engine.jobs import merge_into

    merge_into(t, EngineConfig(merge_buckets=4))
    merged = t.scan().to_pandas()
    by_url = merged[merged.url.notna()].set_index("url").text.to_dict()
    assert by_url == {"u1": "v1", "u2": "w2", "u3": "x1"}


def test_streaming_index_rebuild(tmp_table_root, ray_session):
    t = Table.create(tmp_table_root)
    s = StreamingUpsert(t, EngineConfig(), num_shards=2)
    s.upsert(_batch([("u1", _ts(10), "v1")]))

    # fresh front-end (actor loss): rebuild index from the table, then a
    # stale update must still be rejected
    s2 = StreamingUpsert(t, EngineConfig(), num_shards=2)
    s2.rebuild_from_table()
    r = s2.upsert(_batch([("u1", _ts(4), "stale")]))
    assert r["appended"] == 0
    assert "stale" not in set(t.scan().to_pandas().text)


def test_within_batch_duplicates_collapse_first(tmp_table_root, ray_session):
    t = Table.create(tmp_table_root)
    s = StreamingUpsert(t, EngineConfig(), num_shards=2)
    r = s.upsert(_batch([("u1", _ts(1), "a"), ("u1", _ts(2), "b")]))
    assert r["appended"] == 1  # local fold collapsed before the index
    assert set(t.scan().to_pandas().text) == {"b"}


def test_stream_index_advances_only_after_commit(tmp_table_root, ray_session, monkeypatch):
    # regression: a failed append must NOT advance the index (a retry of
    # the same batch would otherwise be silently dropped)
    t = Table.create(tmp_table_root)
    s = StreamingUpsert(t, EngineConfig(), num_shards=2)
    import engine.stream as stream_mod

    def boom(*a, **k):
        raise RuntimeError("injected write failure")

    monkeypatch.setattr(stream_mod, "write_files", boom)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected"):
        s.upsert(_batch([("u1", _ts(5), "v1")]))
    monkeypatch.undo()
    r = s.upsert(_batch([("u1", _ts(5), "v1")]))  # retry succeeds fully
    assert r["appended"] == 1
    assert set(t.scan().to_pandas().text) == {"v1"}

def test_streaming_preserves_arrow_types_and_nan_contract(tmp_table_root, ray_session):
    """The upsert fold is merge_fold_arrow (not the pandas twin), so a
    micro-batch keeps its exact Arrow types end-to-end -- uint64 at
    full width even WITH nulls (the old pandas round trip upcast
    null-bearing ints to float64, rounding through a 53-bit mantissa)
    -- and an explicit float NaN is a VALID value that wins over an
    older real number (the pandas fold coalesced past it)."""
    import numpy as np

    t = Table.create(tmp_table_root)
    s = StreamingUpsert(t, EngineConfig(), num_shards=2)
    big = (1 << 63) + 11  # not representable in float64
    batch = pa.table(
        {
            "url": ["u1", "u1", "u2"],
            "warc_ts": pa.array([_ts(1), _ts(2), _ts(1)], pa.timestamp("us")),
            "text": ["a", "b", "c"],
            "sim": pa.array([big, None, 7], pa.uint64()),
            "score": pa.array([5.0, float("nan"), None], pa.float64()),
        }
    )
    r = s.upsert(batch)
    assert r["appended"] == 2  # u1 collapsed locally
    out = t.scan().to_arrow_refs()
    import ray as _ray

    tbl = pa.concat_tables(_ray.get(out)).combine_chunks()
    assert tbl.schema.field("sim").type == pa.uint64()
    row = {u: i for i, u in enumerate(tbl.column("url").to_pylist())}
    # u1: later row's null sim coalesced back to the exact uint64
    assert tbl.column("sim")[row["u1"]].as_py() == big
    # u1: later row's explicit NaN is a VALID value and won over 5.0
    v = tbl.column("score")[row["u1"]].as_py()
    assert v is not None and np.isnan(v)
    # u2: null score stays null (never fabricated)
    assert tbl.column("score")[row["u2"]].as_py() is None


def test_stream_plus_merge_equals_batch_merge_for_monotone_arrivals(
    tmp_table_root, ray_session
):
    """ARCHITECTURE contract: a row set whose arrivals are ts-monotone
    per key yields the SAME final table via micro-batch upsert +
    periodic MERGE INTO as via one batch MERGE over all rows --
    including empty-value coalesce back to an earlier batch's value.
    (Stale arrivals are the documented divergence: row-level LWW drops
    them wholesale; not generated here.)"""
    import numpy as np
    import ray.data

    from engine.jobs import merge_into
    from engine.merge import merge_fold_passthrough_arrow

    rng = np.random.default_rng(42)
    keys = [f"u{i}" for i in range(12)] + [None, ""]
    rows = []
    t = 0
    for _ in range(120):
        t += 1  # globally increasing ts = ts-monotone per key
        k = keys[rng.integers(len(keys))]
        text = ["", "a", "b", "hello"][rng.integers(4)]
        lang = ["", "en", "es"][rng.integers(3)]
        rows.append((k, _ts(t), text, lang))

    def batch4(rs):  # _batch ignores the 4th field; build the full row
        return pa.table(
            {
                "url": [r[0] for r in rs],
                "warc_ts": pa.array([r[1] for r in rs], pa.timestamp("us")),
                "text": [r[2] for r in rs],
                "lang": [r[3] for r in rs],
            }
        )

    table = Table.create(tmp_table_root)
    s = StreamingUpsert(table, EngineConfig(), num_shards=3)
    for off in range(0, len(rows), 17):  # uneven micro-batches, in order
        s.upsert(batch4(rows[off : off + 17]))
    merge_into(table, EngineConfig(merge_buckets=4))
    got = (
        table.scan()
        .to_pandas()
        .sort_values(["url", "warc_ts", "text", "lang"], na_position="first")
        .reset_index(drop=True)
    )

    exp = (
        merge_fold_passthrough_arrow(batch4(rows), "url", "warc_ts")
        .to_pandas()
        .sort_values(["url", "warc_ts", "text", "lang"], na_position="first")
        .reset_index(drop=True)
    )
    pd_testing = __import__("pandas").testing
    pd_testing.assert_frame_equal(got[exp.columns], exp)
