"""MERGE INTO semantics (reference ``csv_handler.py:66-97`` /
``tests/unit/test_csv_handler_grouping.py``) under LWW-by-warc_ts,
including the FIXTURES.md F3 table and a DuckDB oracle over the derived
pages table."""

import datetime as dt

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data

from engine.merge import merge_datasets, merge_fold
from engine.pages import PAGES_CTE, read_pages


def _ts(i):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=i)


def f3_table() -> pa.Table:
    return pa.table(
        {
            "url": ["u1", "u1", "u1", "u2", None, None],
            "warc_ts": pa.array([_ts(1), _ts(2), _ts(3), _ts(1), _ts(1), _ts(2)], pa.timestamp("us")),
            "text": ["Alice", "", "Alicia", "Bob", "NoId", "MissingId"],
            "lang": ["en", "", "es", "en", "en", "en"],
        }
    )


def test_f3_fixture_semantics():
    out = merge_datasets(ray.data.from_arrow(f3_table()), num_buckets=4).to_pandas()
    assert len(out) == 4
    u1 = out[out.url == "u1"].iloc[0]
    # latest non-empty wins; empty t2 row must NOT have overwritten
    assert u1.text == "Alicia" and u1.lang == "es"
    assert u1.warc_ts == _ts(3)
    assert out[out.url == "u2"].iloc[0].text == "Bob"
    # null-key rows pass through un-merged (csv_handler.py:81-84)
    assert sorted(out[out.url.isna()].text) == ["MissingId", "NoId"]


def test_empty_never_overwrites_all_empty_keeps_anchor():
    t = pa.table(
        {
            "url": ["u", "u"],
            "warc_ts": pa.array([_ts(1), _ts(2)], pa.timestamp("us")),
            "text": ["", ""],
            "lang": ["en", ""],
        }
    )
    out = merge_datasets(ray.data.from_arrow(t), num_buckets=2).to_pandas()
    assert len(out) == 1
    # all-empty column falls back to the anchor's literal empty value
    assert out.iloc[0].text == ""
    assert out.iloc[0].lang == "en"


def test_empty_string_key_passes_through():
    t = pa.table(
        {
            "url": ["", "", "k"],
            "warc_ts": pa.array([_ts(1), _ts(2), _ts(1)], pa.timestamp("us")),
            "text": ["a", "b", "c"],
            "lang": ["en", "en", "en"],
        }
    )
    out = merge_datasets(ray.data.from_arrow(t), num_buckets=2).to_pandas()
    assert len(out) == 3  # the two ''-key rows are NOT merged


def test_fold_is_order_insensitive():
    df = f3_table().to_pandas()
    shuffled = df.sample(frac=1.0, random_state=7)
    a = merge_fold(df, "url", "warc_ts").sort_values("url", na_position="first").reset_index(drop=True)
    b = (
        merge_fold(shuffled, "url", "warc_ts")
        .sort_values("url", na_position="first")
        .reset_index(drop=True)
    )
    # null-key rows keep arbitrary relative order; compare as sets
    pd.testing.assert_frame_equal(
        a.sort_values(list(a.columns), na_position="first").reset_index(drop=True),
        b.sort_values(list(b.columns), na_position="first").reset_index(drop=True),
    )


def test_merge_matches_duckdb_oracle(sf_dir):
    merged = merge_datasets(read_pages(sf_dir, with_html=False), num_buckets=8)
    got = (
        merged.select_columns(["url", "text", "lang"])
        .to_pandas()
        .sort_values(["url", "text", "lang"], na_position="first")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    exp = (
        con.sql(
            PAGES_CTE
            + """
            , merged AS (
              SELECT url,
                coalesce(arg_max(text, warc_ts) FILTER (text IS NOT NULL AND text <> ''),
                         arg_min(text, warc_ts)) AS text,
                coalesce(arg_max(lang, warc_ts) FILTER (lang IS NOT NULL AND lang <> ''),
                         arg_min(lang, warc_ts)) AS lang
              FROM pages WHERE url IS NOT NULL AND url <> '' GROUP BY url)
            SELECT url, text, lang FROM merged
            UNION ALL
            SELECT url, text, lang FROM pages WHERE url IS NULL OR url = ''
            """
        )
        .df()
        .sort_values(["url", "text", "lang"], na_position="first")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


# --- property test: vectorized fold vs a literal reference-semantics oracle

from hypothesis import given, settings, strategies as st


def _reference_merge(rows, key="url", ts="warc_ts"):
    """Literal re-statement of _group_records_by_id (csv_handler.py:66-97)
    applied to ts-sorted rows (LWW order), row-at-a-time."""
    rows = sorted(rows, key=lambda r: r[ts])
    anchors, ordered = {}, []
    for r in rows:
        rid = r[key]
        if rid is None or rid == "":
            ordered.append(dict(r))
            continue
        if rid not in anchors:
            anchors[rid] = dict(r)
            ordered.append(anchors[rid])
            continue
        for f, v in r.items():
            if f == key:
                continue
            if v not in ("", None):
                anchors[rid][f] = v
    return ordered


_keys = st.one_of(st.none(), st.sampled_from(["", "u1", "u2", "u3", "k"]))
_vals = st.sampled_from(["", "a", "b", "x y", None])


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(_keys, _vals, _vals),
        min_size=1,
        max_size=30,
    )
)
def test_merge_fold_matches_reference_semantics(rows_spec):
    rows = [
        {"url": k, "warc_ts": _ts(i), "text": t, "lang": l}
        for i, (k, t, l) in enumerate(rows_spec)
    ]
    df = pd.DataFrame(rows)
    df["warc_ts"] = pd.to_datetime(df["warc_ts"])
    # mirror merge_datasets' bucket fold: null/empty keys pass through
    null_mask = df["url"].isna() | (df["url"] == "")
    got_df = merge_fold(df[~null_mask], "url", "warc_ts")
    if null_mask.any():
        got_df = pd.concat([got_df, df[null_mask]], ignore_index=True)
    got = {
        (r.url if pd.notna(r.url) else None, r.warc_ts): (
            r.text if pd.notna(r.text) else None,
            r.lang if pd.notna(r.lang) else None,
        )
        for r in got_df.itertuples()
    }
    exp_rows = _reference_merge(rows)
    exp = {
        (r["url"], pd.Timestamp(r["warc_ts"])): (r["text"], r["lang"])
        for r in exp_rows
    }
    assert len(got_df) == len(exp_rows)
    assert got == exp


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(_keys, _vals, _vals),
        min_size=1,
        max_size=30,
    )
)
def test_arrow_fold_matches_reference_semantics(rows_spec):
    from engine.merge import merge_fold_passthrough_arrow

    rows = [
        {"url": k, "warc_ts": _ts(i), "text": t, "lang": l}
        for i, (k, t, l) in enumerate(rows_spec)
    ]
    df = pd.DataFrame(rows)
    df["warc_ts"] = pd.to_datetime(df["warc_ts"]).astype("datetime64[us]")
    got_df = merge_fold_passthrough_arrow(
        pa.Table.from_pandas(df, preserve_index=False), "url", "warc_ts"
    ).to_pandas()
    got = {
        (r.url if pd.notna(r.url) else None, r.warc_ts): (
            r.text if pd.notna(r.text) else None,
            r.lang if pd.notna(r.lang) else None,
        )
        for r in got_df.itertuples()
    }
    exp_rows = _reference_merge(rows)
    exp = {
        (r["url"], pd.Timestamp(r["warc_ts"])): (r["text"], r["lang"])
        for r in exp_rows
    }
    assert len(got_df) == len(exp_rows)
    assert got == exp


def test_arrow_fold_parity_with_pandas_fold_typed_fuzz():
    """Arrow fold == pandas fold on randomized TYPED tables: binary
    payloads, nullable ints, uint64 at full width, NaT and tied
    timestamps, empty strings/bytes, all-empty keys."""
    import numpy as np

    from engine.merge import merge_fold_passthrough, merge_fold_passthrough_arrow

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(1, 400))
        keys = rng.choice(["u1", "u2", "u3", "u4", "hot", ""], size=n).astype(object)
        keys[rng.random(n) < 0.1] = None
        # ties on purpose: ts drawn from a tiny set, some NaT, some pre-epoch
        ts_pool = np.array([-2, -1, 0, 1, 2, 10**6, 10**6], dtype="datetime64[us]")
        ts = ts_pool[rng.integers(0, len(ts_pool), n)].astype("datetime64[us]")
        ts_obj = pd.Series(ts)
        ts_obj[rng.random(n) < 0.15] = pd.NaT
        text = rng.choice(["", "alpha", "beta", None], size=n).astype(object)
        blob = rng.choice([b"", b"\x00\x01", b"payload", None], size=n).astype(object)
        ints = pd.array(rng.integers(0, 100, n), dtype="Int64")
        ints[rng.random(n) < 0.2] = pd.NA
        big = rng.integers(0, 2**63, n, dtype=np.uint64) | np.uint64(1 << 63)
        df = pd.DataFrame(
            {
                "url": keys,
                "warc_ts": ts_obj.astype("datetime64[us]"),
                "text": text,
                "html": blob,
                "rank": ints,
                "simhash": big,
            }
        )
        t = pa.Table.from_pandas(df, preserve_index=False)
        got = merge_fold_passthrough_arrow(t, "url", "warc_ts").to_pandas()
        exp = merge_fold_passthrough(t.to_pandas(), "url", "warc_ts")
        order = list(exp.columns)

        def canon(d):
            d = d[order].copy()
            d["simhash"] = d["simhash"].astype("uint64")
            return d.sort_values(order, na_position="first", key=lambda s: s.astype(str)).reset_index(
                drop=True
            )

        g, e = canon(got), canon(exp)
        assert len(g) == len(e), f"trial {trial}: {len(g)} vs {len(e)} rows"
        for c in order:
            ga, ea = g[c].tolist(), e[c].tolist()
            ga = [None if (not isinstance(v, (bytes, str)) and pd.isna(v)) else v for v in ga]
            ea = [None if (not isinstance(v, (bytes, str)) and pd.isna(v)) else v for v in ea]
            assert ga == ea, f"trial {trial}: column {c} diverged"


def test_numeric_columns_zero_overwrites_nan_skipped():
    # reference rule `value not in ("", None)`: numeric 0 DOES overwrite,
    # missing (None/NaN) does not
    df = pd.DataFrame(
        {
            "url": ["u", "u", "u"],
            "warc_ts": [_ts(1), _ts(2), _ts(3)],
            "score": [5.0, 0.0, None],
        }
    )
    out = merge_fold(df, "url", "warc_ts")
    assert len(out) == 1
    assert out.iloc[0].score == 0.0  # t2's zero won; t3's NaN skipped


def test_arrow_fold_nan_is_a_valid_value():
    """The engine contract (merge_fold_arrow): float NaN is a VALID
    value -- only null and ""/b"" coalesce. A later-ts explicit NaN
    OVERWRITES a real number (Arrow/SQL semantics: pc.is_null(NaN) is
    false), while a later-ts NULL is coalesced past. The pandas fold
    cannot represent this distinction (NaN IS its null), which is why
    it is a test oracle only -- this test pins the divergence."""
    from engine.merge import merge_fold_arrow

    ts = pa.array(
        [pd.Timestamp(f"2024-01-0{i}") for i in (1, 2, 3)],
        type=pa.timestamp("us"),
    )
    t = pa.table(
        {
            "url": pa.array(["u", "u", "u"]),
            "warc_ts": ts,
            "nan_col": pa.array([5.0, float("nan"), None], type=pa.float64()),
            "null_col": pa.array([7.0, None, None], type=pa.float64()),
        }
    )
    out = merge_fold_arrow(t, "url", "warc_ts")
    assert len(out) == 1
    v = out.column("nan_col")[0].as_py()
    assert v != v  # t2's explicit NaN overwrote 5.0; t3's null skipped
    assert out.column("null_col")[0].as_py() == 7.0  # nulls still coalesce


def test_wide_merge_preserves_numeric_dtypes(ray_session):
    # regression: the wide path's union fold used pandas, upcasting
    # every int to float64 and rounding uint64 simhash through a double
    # mantissa -- schema must round-trip exactly
    import numpy as np
    import pyarrow as pa
    import ray.data
    from engine.merge import merge_datasets_wide

    n = 200
    rng = np.random.default_rng(3)
    sig = rng.integers(0, 2**63, n).astype(np.uint64) | (np.uint64(1) << np.uint64(63))
    t = pa.table(
        {
            "url": pa.array([f"u{i % 50}" for i in range(n)]),
            "warc_ts": pa.array(
                np.arange(n).astype("datetime64[us]"), pa.timestamp("us")
            ),
            "html": pa.array([b"<html>%d</html>" % i for i in range(n)], pa.binary()),
            "n_chars": pa.array(np.arange(n), pa.int64()),
            "simhash": pa.array(sig, pa.uint64()),
        }
    )
    out = merge_datasets_wide(
        lambda: ray.data.from_arrow(t).repartition(3), ["html"], num_buckets=4
    )
    got = pa.concat_tables([pa.Table.from_pandas(b) for b in out.iter_batches(batch_format="pandas")], promote_options="default")
    schema = {f.name: str(f.type) for f in got.schema}
    assert schema["n_chars"] == "int64", schema
    assert schema["simhash"] == "uint64", schema
    # every surviving simhash value is one of the originals, bit-exact
    orig = set(sig.tolist())
    assert all(v in orig for v in got.column("simhash").to_pylist())


def test_wide_merge_bloom_filter_matches_exact(ray_session):
    # the scale seam: Bloom winner filter (distributed bitmap, no driver
    # key-set) must produce the identical merged output -- false
    # positives are dropped by the exact (key, winning_ts) attach join
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from engine.merge import merge_datasets_wide

    n = 400
    urls = [None if i % 37 == 0 else f"u{i % 60}" for i in range(n)]
    # include ts ties (two writers at the same instant for the same key)
    ts = np.arange(n) // 2
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
            "html": pa.array(
                [b"" if i % 11 == 0 else b"payload-%d" % i for i in range(n)], pa.binary()
            ),
            "text": pa.array([f"t{i}" if i % 5 else "" for i in range(n)]),
        }
    )

    def run(mode):
        out = merge_datasets_wide(
            lambda: ray.data.from_arrow(t).repartition(4),
            ["html"],
            num_buckets=4,
            winner_filter=mode,
        )
        df = out.to_pandas()
        return df.sort_values(["url", "warc_ts", "text"], na_position="first").reset_index(
            drop=True
        )

    exact, bloom = run("exact"), run("bloom")
    pd.testing.assert_frame_equal(exact, bloom)
    # sanity: merged keys + null passthrough rows all present
    assert exact["url"].notna().sum() == 60


def test_wide_merge_null_ts_matches_single_pass(ray_session):
    # review finding: the wide path crashed on NULL warc_ts (NaN int
    # cast in the winner pair-hash) and sorted NaT LAST, inverting the
    # 'null-ts = oldest writer' invariant. It must match merge_datasets
    # exactly, including ts-tie + empty-payload preference.
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from engine.merge import merge_datasets, merge_datasets_wide

    ts = [None, 5, None, None, 3, 7, 7, None]
    urls = ["u1", "u1", "u2", "u2", "u3", "u3", "u3", None]
    html = [b"NULL-TS", b"TS5", b"A", b"", b"T3", b"", b"T7", b"PASS"]
    text = ["a", "", "x", "y", "p", "q", "", "z"]
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                [None if v is None else np.datetime64(v, "us") for v in ts],
                pa.timestamp("us"),
            ),
            "html": pa.array(html, pa.binary()),
            "text": pa.array(text, pa.string()),
        }
    )

    def norm(ds):
        df = ds.to_pandas()
        return df.sort_values(["url", "warc_ts", "text"], na_position="first").reset_index(
            drop=True
        )

    single = norm(merge_datasets(ray.data.from_arrow(t).repartition(3), num_buckets=4))
    for mode in ("exact", "bloom"):
        wide = norm(
            merge_datasets_wide(
                lambda: ray.data.from_arrow(t).repartition(3),
                ["html"],
                num_buckets=4,
                winner_filter=mode,
            )
        )
        pd.testing.assert_frame_equal(single, wide, check_dtype=False)
    # u1: ts=5 writer wins the payload over the null-ts writer
    u1 = single[single.url == "u1"]
    assert u1.html.tolist() == [b"TS5"]
    # u3: the ts=7 tie must attach the NON-EMPTY payload
    u3 = single[single.url == "u3"]
    assert u3.html.tolist() == [b"T7"]


def test_wide_merge_two_wide_cols_split_payload_ties(ray_session):
    # at a (key, ts) tie the non-empty payloads for the two wide columns
    # live in DIFFERENT source rows: per-column dedup must keep both
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from engine.merge import merge_datasets, merge_datasets_wide

    t = pa.table(
        {
            "url": pa.array(["u", "u", "v"], pa.string()),
            "warc_ts": pa.array(
                [np.datetime64(9, "us")] * 2 + [np.datetime64(1, "us")], pa.timestamp("us")
            ),
            "html": pa.array([b"HTML", b"", b"VH"], pa.binary()),
            "img": pa.array([b"", b"IMG", b"VI"], pa.binary()),
            "text": pa.array(["a", "b", "c"], pa.string()),
        }
    )

    def norm(ds):
        return ds.to_pandas().sort_values("url").reset_index(drop=True)

    single = norm(merge_datasets(ray.data.from_arrow(t).repartition(2), num_buckets=2))
    wide = norm(
        merge_datasets_wide(
            lambda: ray.data.from_arrow(t).repartition(2), ["html", "img"], num_buckets=2
        )
    )
    pd.testing.assert_frame_equal(single, wide, check_dtype=False)
    u = wide[wide.url == "u"].iloc[0]
    assert u.html == b"HTML" and u.img == b"IMG"


def test_wide_merge_ns_unit_source_column(ray_session):
    # ADVICE r2: the fold-side winner ts and the Arrow-side casts must
    # share ONE canonical int64 unit BY CONSTRUCTION. A timestamp[ns]
    # source column previously relied on pandas preserving ns on both
    # sides; a unit mismatch nulls EVERY wide column silently. Also
    # covers the non-timestamp (plain int64 ts) case.
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from engine.merge import merge_datasets, merge_datasets_wide

    n = 120
    urls = [f"u{i % 30}" for i in range(n)]
    for ts_arr in (
        pa.array((np.arange(n) * 1_000_000).astype("datetime64[ns]"), pa.timestamp("ns")),
        pa.array(np.arange(n), pa.int64()),
    ):
        t = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": ts_arr,
                "html": pa.array([b"payload-%d" % i for i in range(n)], pa.binary()),
                "text": pa.array([f"t{i}" for i in range(n)], pa.string()),
            }
        )

        def norm(ds):
            return ds.to_pandas().sort_values("url").reset_index(drop=True)

        single = norm(merge_datasets(ray.data.from_arrow(t).repartition(3), num_buckets=4))
        for mode in ("exact", "bloom"):
            wide = norm(
                merge_datasets_wide(
                    lambda: ray.data.from_arrow(t).repartition(3),
                    ["html"],
                    num_buckets=4,
                    winner_filter=mode,
                )
            )
            # the failure mode is every html coming back null -- assert
            # full equality against the single-pass merge instead
            assert wide["html"].notna().all()
            pd.testing.assert_frame_equal(single, wide, check_dtype=False)


def test_wide_merge_pre_epoch_sub_us_timestamps(ray_session):
    # ADVICE r3 (medium): fold-side pandas astype('datetime64[us]')
    # FLOORS while the payload side's pc.cast(safe=False) truncates
    # toward zero, so pre-epoch ns values with sub-us remainders
    # (-1500ns -> -2us vs -1us) made the (key, __wts) join miss and the
    # wide columns came back silently null. Both sides now share one
    # Arrow cast path.
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from engine.merge import merge_datasets, merge_datasets_wide

    n = 60
    urls = [f"u{i % 15}" for i in range(n)]
    # every value pre-epoch with a NON-ZERO sub-microsecond remainder
    ns = -(np.arange(n, dtype=np.int64) * 1_000_000 + 1_500)
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ns.astype("datetime64[ns]"), pa.timestamp("ns")),
            "html": pa.array([b"payload-%d" % i for i in range(n)], pa.binary()),
            "text": pa.array([f"t{i}" for i in range(n)], pa.string()),
        }
    )

    def norm(ds):
        return ds.to_pandas().sort_values("url").reset_index(drop=True)

    single = norm(merge_datasets(ray.data.from_arrow(t).repartition(3), num_buckets=4))
    for mode in ("exact", "bloom"):
        wide = norm(
            merge_datasets_wide(
                lambda: ray.data.from_arrow(t).repartition(3),
                ["html"],
                num_buckets=4,
                winner_filter=mode,
            )
        )
        assert wide["html"].notna().all()
        pd.testing.assert_frame_equal(single, wide, check_dtype=False)


def test_dedup_key_ts_nonempty_matches_pandas_reference():
    # direct parity with the declared rule: prefer non-empty, ties among
    # equally non-empty rows keep the LAST original row (the same
    # last-writer-wins pick _winner_pick applies to light columns, so
    # the wide path's payload row is the row the phase-A fold chose;
    # review r4 found the old keep-first rule could return an html that
    # co-occurred with no merged text row)
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from engine.merge import _dedup_key_ts_nonempty

    rng = np.random.default_rng(42)
    pool = [None, b"", b"A", b"B", b"CC", b"payload"]
    for trial in range(50):
        n = int(rng.integers(1, 60))
        keys = [f"u{i}" for i in rng.integers(0, 4, n)]
        ts = rng.integers(0, 3, n).astype(np.int64)
        payloads = [pool[i] for i in rng.integers(0, len(pool), n)]
        t = pa.table(
            {
                "url": pa.array(keys, pa.string()),
                "wts": pa.array(ts, pa.int64()),
                "html": pa.array(payloads, pa.binary()),
            }
        )
        got = _dedup_key_ts_nonempty(t, "url", ts, "html").to_pandas()

        df = t.to_pandas()
        df["__e"] = ~(df["html"].map(lambda v: v is not None and len(v) > 0))
        # reverse first: within each emptiness class the LAST original
        # row comes first, so keep="first" picks (min __e, max index)
        ref = (
            df[::-1]
            .sort_values("__e", kind="stable")
            .drop_duplicates(subset=["url", "wts"], keep="first")
            .drop(columns="__e")
        )
        a = got.sort_values(["url", "wts", "html"], na_position="first").reset_index(drop=True)
        b = ref.sort_values(["url", "wts", "html"], na_position="first").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_dedup_key_ts_nonempty_empty_table_is_noop():
    import numpy as np
    import pyarrow as pa

    from engine.merge import _dedup_key_ts_nonempty

    t = pa.table(
        {
            "url": pa.array([], pa.string()),
            "wts": pa.array([], pa.int64()),
            "html": pa.array([], pa.binary()),
        }
    )
    out = _dedup_key_ts_nonempty(t, "url", np.empty(0, np.int64), "html")
    assert len(out) == 0 and out.schema == t.schema


def test_wide_merge_all_passthrough_input(ray_session):
    # every row has a NULL/empty key: merged_light is empty and the
    # exact winner path used to KeyError on the column-less DataFrame
    # before the passthrough rows were emitted
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from engine.merge import merge_datasets_wide

    t = pa.table(
        {
            "url": pa.array([None, "", None], pa.string()),
            "warc_ts": pa.array([1, 2, 3], pa.int64()),
            "html": pa.array([b"a", b"b", None], pa.binary()),
        }
    )
    for wf in ("exact", "bloom", "auto"):
        out = merge_datasets_wide(
            lambda: ray.data.from_arrow(t), ["html"], winner_filter=wf
        ).to_pandas()
        assert len(out) == 3  # all three passthrough rows intact
        assert sorted(out["warc_ts"]) == [1, 2, 3]


def test_ts_i64_arrow_type_contract():
    """The one shared ts->int64 cast: timestamps canonicalize to us,
    integers pass through, ISO-8601 strings parse (the old stream
    path's pd.to_datetime lenience), null -> INT64_MIN (oldest
    writer), and anything else raises a NAMED TypeError instead of a
    cryptic mid-pipeline ArrowInvalid."""
    import pytest

    from engine.merge import TS_I64_MIN, ts_i64_arrow

    out = ts_i64_arrow(pa.array(["2024-01-01T00:00:01", None]))
    assert out.to_pylist() == [1704067201000000, TS_I64_MIN]
    assert ts_i64_arrow(pa.array([7, None], pa.int64())).to_pylist() == [
        7,
        TS_I64_MIN,
    ]
    # pre-epoch sub-us truncates toward zero (-1500ns -> -1us), the
    # documented canonical behavior both join sides share
    ns = pa.array([-1500], pa.timestamp("ns"))
    assert ts_i64_arrow(ns).to_pylist() == [-1]
    with pytest.raises(TypeError, match="timestamp, integer, or ISO"):
        ts_i64_arrow(pa.array([1.5], pa.float64()))


def test_ts_i64_arrow_string_lenience_sub_us_and_zoned():
    """Regression (review): string ts columns with sub-us fractions or
    zone offsets parsed under the old pd.to_datetime stream path and
    must keep parsing through the unified cast (us -> ns -> zoned
    fallbacks); sub-us truncates toward zero like every other path."""
    from engine.merge import ts_i64_arrow

    assert ts_i64_arrow(pa.array(["2020-01-01T00:00:00.123456789"])).to_pylist() == [
        1577836800123456
    ]
    # zone offset converts to UTC epoch micros
    assert ts_i64_arrow(pa.array(["2020-01-01 00:00:00+05:00"])).to_pylist() == [
        1577818800000000
    ]
