"""As-of join: bucketed merge_asof vs hand expectations and pandas."""

import datetime as dt

import pandas as pd
import pyarrow as pa
import ray.data

from engine.asof import asof_join


def _ts(d):
    return dt.datetime(2026, 1, 1) + dt.timedelta(days=d)


def test_asof_backward_semantics(ray_session):
    left = pa.table(
        {
            "eid": pa.array([1, 2, 3, 4], pa.int64()),
            "k": pa.array([10, 10, 10, 20], pa.int64()),
            "ts": pa.array([_ts(1), _ts(5), _ts(9), _ts(2)], pa.timestamp("us")),
        }
    )
    right = pa.table(
        {
            "k": pa.array([10, 10, 30], pa.int64()),
            "rts": pa.array([_ts(2), _ts(6), _ts(0)], pa.timestamp("us")),
            "val": pa.array([100, 200, 999], pa.int64()),
        }
    )
    out = (
        asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                  key="k", left_ts="ts", right_ts="rts", num_buckets=4)
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    # eid1: no right row <= d1 -> null; eid2: d2 row; eid3: d6 row;
    # eid4: key 20 has no right rows -> null
    assert out.val.tolist()[0] != out.val.tolist()[0] or out.val.isna().tolist() == [True, False, False, True]
    assert out.val.dropna().tolist() == [100.0, 200.0]
    assert len(out) == 4  # every left row kept


def test_asof_matches_pandas_global(ray_session):
    import numpy as np

    rng = np.random.default_rng(9)
    n_l, n_r = 500, 200
    left = pd.DataFrame(
        {
            "eid": np.arange(n_l),
            "k": rng.integers(0, 20, n_l),
            "ts": pd.to_datetime(rng.integers(0, 10**6, n_l), unit="s").astype("datetime64[us]"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 25, n_r),
            "rts": pd.to_datetime(rng.integers(0, 10**6, n_r), unit="s").astype("datetime64[us]"),
            "val": np.arange(n_r),
        }
    ).drop_duplicates(subset=["k", "rts"])
    got = (
        asof_join(
            ray.data.from_pandas(left).repartition(3),
            ray.data.from_pandas(right).repartition(2),
            key="k", left_ts="ts", right_ts="rts", num_buckets=8,
        )
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("rts"),
        left_on="ts", right_on="rts", by="k", direction="backward",
    ).sort_values("eid").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["eid", "val"]], exp[["eid", "val"]])


def test_asof_null_keys_and_ts_pass_through_unmatched(ray_session):
    # SQL semantics: NULLs never match; null left ts must not abort
    left = pa.table(
        {
            "eid": pa.array([1, 2, 3], pa.int64()),
            "k": pa.array([10, None, 10], pa.int64()),
            "ts": pa.array([_ts(5), _ts(5), None], pa.timestamp("us")),
        }
    )
    right = pa.table(
        {
            "k": pa.array([10, None], pa.int64()),
            "rts": pa.array([_ts(1), _ts(1)], pa.timestamp("us")),
            "val": pa.array([100, 999], pa.int64()),
        }
    )
    out = (
        asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                  key="k", left_ts="ts", right_ts="rts", num_buckets=4)
        .to_pandas().sort_values("eid").reset_index(drop=True)
    )
    assert len(out) == 3
    assert out.val.tolist()[0] == 100     # normal match
    assert pd.isna(out.val.tolist()[1])   # null key -> unmatched (never 999)
    assert pd.isna(out.val.tolist()[2])   # null ts -> unmatched, no crash


def test_asof_raises_on_int64_beyond_2pow53(ray_session):
    # VERDICT r2 #8: int64 values above 2^53 would silently round
    # through the float64 union fold -- the join must raise instead
    import pytest

    big = (1 << 53) + 7
    left = pa.table(
        {
            "k": pa.array([1, 1], pa.int64()),
            "ts": pa.array([_ts(1), _ts(2)], pa.timestamp("us")),
            "payload": pa.array([big, 5], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([1], pa.int64()),
            "rts": pa.array([_ts(0)], pa.timestamp("us")),
            "val": pa.array([3], pa.int64()),
        }
    )
    # the ValueError surfaces wrapped in RayTaskError -> match message
    with pytest.raises(Exception, match="2\\^53"):
        asof_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            key="k", left_ts="ts", right_ts="rts", num_buckets=2,
        ).to_pandas()

    # sanity: exactly-representable values still pass
    ok_left = left.set_column(2, "payload", pa.array([1 << 53, 5], pa.int64()))
    out = asof_join(
        ray.data.from_arrow(ok_left), ray.data.from_arrow(right),
        key="k", left_ts="ts", right_ts="rts", num_buckets=2,
    ).to_pandas()
    assert sorted(out.payload.tolist()) == [5, 1 << 53]


def test_asof_huge_int64_key_allowed_when_null_free(ray_session):
    # ADVICE r3: a null-free int64 JOIN KEY is populated by both sides
    # and never floats through the union fold -- 64-bit hash keys beyond
    # 2^53 must join exactly, not hard-error.
    big = (1 << 60) + 12345

    left = pa.table(
        {
            "k": pa.array([big, big, big + 1], pa.int64()),
            "ts": pa.array([_ts(1), _ts(5), _ts(2)], pa.timestamp("us")),
        }
    )
    right = pa.table(
        {
            "k": pa.array([big, big + 1], pa.int64()),
            "rts": pa.array([_ts(2), _ts(3)], pa.timestamp("us")),
            "val": pa.array([100, 200], pa.int64()),
        }
    )
    out = (
        asof_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            key="k", left_ts="ts", right_ts="rts", num_buckets=2,
        )
        .to_pandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    assert len(out) == 3
    # keys survived exactly (a float64 round-trip would merge big/big+1)
    assert sorted(out.k.tolist()) == [big, big, big + 1]
    assert out.val.dropna().tolist() == [100.0]  # only ts=d5 has a match


def test_asof_huge_key_with_null_keys_raises(ray_session):
    # residual cross-case: null keys in the data DO float the key column
    # inside the bucket fold -- beyond-2^53 values must still hard-error
    # (exact per-bucket check), never silently round.
    import pytest

    big = (1 << 60) + 12345
    left = pa.table(
        {
            "k": pa.array([big, None, big], pa.int64()),
            "ts": pa.array([_ts(1), _ts(2), _ts(3)], pa.timestamp("us")),
        }
    )
    right = pa.table(
        {
            "k": pa.array([big], pa.int64()),
            "rts": pa.array([_ts(0)], pa.timestamp("us")),
            "val": pa.array([3], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="2\\^53"):
        asof_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            key="k", left_ts="ts", right_ts="rts", num_buckets=1,
        ).to_pandas()


def test_asof_huge_key_null_in_other_batch_raises(ray_session):
    # the batch-level guard exempts each batch on its own (batch A: null
    # keys but small values; batch B: huge keys but null-free) -- only
    # the per-bucket check inside the fold sees them TOGETHER, where the
    # float conversion actually happens.
    import pytest

    big = (1 << 60) + 12345
    batch_nulls = pa.table(
        {
            "k": pa.array([None, 7], pa.int64()),
            "ts": pa.array([_ts(1), _ts(2)], pa.timestamp("us")),
        }
    )
    batch_huge = pa.table(
        {
            "k": pa.array([big, big], pa.int64()),
            "ts": pa.array([_ts(1), _ts(3)], pa.timestamp("us")),
        }
    )
    left = ray.data.from_arrow(batch_nulls).union(ray.data.from_arrow(batch_huge))
    right = pa.table(
        {
            "k": pa.array([7], pa.int64()),
            "rts": pa.array([_ts(0)], pa.timestamp("us")),
            "val": pa.array([3], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="2\\^53"):
        asof_join(
            left, ray.data.from_arrow(right),
            key="k", left_ts="ts", right_ts="rts", num_buckets=1,
        ).to_pandas()


def test_asof_floated_key_at_2pow53_boundary_raises(ray_session):
    # code-review r4: the fold's residual guard must be >= not > -- by
    # the time the guard runs the key column is ALREADY floated, so a
    # true key of 2^53+1 has rounded to exactly 2^53 and a strict >
    # lets it collide silently with a genuine 2^53 key.
    import pytest

    big = 1 << 53
    batch_nulls = pa.table(
        {
            "k": pa.array([None, 7], pa.int64()),
            "ts": pa.array([_ts(1), _ts(2)], pa.timestamp("us")),
        }
    )
    batch_boundary = pa.table(
        {
            "k": pa.array([big, big + 1], pa.int64()),
            "ts": pa.array([_ts(1), _ts(3)], pa.timestamp("us")),
        }
    )
    left = ray.data.from_arrow(batch_nulls).union(ray.data.from_arrow(batch_boundary))
    right = pa.table(
        {
            "k": pa.array([7], pa.int64()),
            "rts": pa.array([_ts(0)], pa.timestamp("us")),
            "val": pa.array([3], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="2\\^53"):
        asof_join(
            left, ray.data.from_arrow(right),
            key="k", left_ts="ts", right_ts="rts", num_buckets=1,
        ).to_pandas()
