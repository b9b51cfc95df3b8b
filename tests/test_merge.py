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
