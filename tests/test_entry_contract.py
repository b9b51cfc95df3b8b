"""Driver-contract hardening: the oracle SQL and the engine queries
must agree on data the sf fixtures do NOT contain -- NULL text, odd
whitespace (the Python ``\\s`` set minus RE2's ASCII ``\\s``), unicode
digits, tied group counts, duplicate/NULL keys.

Two layers:
1. ``test_oracle_ws_class_is_python_s`` proves the explicit RE2
   whitespace class embedded in the oracle SQL matches Python ``re``'s
   ``\\s`` char-for-char over the whole BMP (the engine tokenizes with
   Python ``\\S+``; RE2's own ``\\s`` is ASCII-only).
2. ``test_adversarial_parity`` writes a documents.parquet fixture full
   of those edge cases and runs each documents-only query against its
   DuckDB oracle with the driver's own normalization (sorted columns,
   floats rounded to 2dp, rows sorted na-first).
"""

import re

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entry_mod


def _oracle_ws_class() -> str:
    """Extract the `[^...]+` tokenizer class from the token_stats oracle."""
    sql = entry_mod.oracle_sql()["token_stats"]
    m = re.search(r"\[\^(.+?)\]\+", sql)
    assert m, "token_stats oracle no longer embeds an explicit [^ws]+ class"
    return m.group(1)


def test_oracle_ws_class_is_python_s():
    cls = _oracle_ws_class()
    # all BMP codepoints except NUL and surrogates, plus a few astral
    chars = [chr(i) for i in range(1, 0x10000) if not 0xD800 <= i <= 0xDFFF]
    chars += ["\U0001F600", "\U00010000"]
    df = pd.DataFrame({"ch": chars})
    con = duckdb.connect()
    con.register("t", df)
    got = con.execute(
        f"SELECT ch, regexp_matches(ch, '^[{cls}]$') AS is_ws FROM t"
    ).fetchdf()
    sql_ws = set(got.loc[got.is_ws, "ch"])
    py_ws = {c for c in chars if re.match(r"\s", c)}
    assert sql_ws == py_ws, (
        f"only_sql={sorted(map(ord, sql_ws - py_ws))} "
        f"only_py={sorted(map(ord, py_ws - sql_ws))}"
    )


QUALITY_PASS = (
    "the of and a to in is you that it he was for on are as with his "
    "they at be this have from or more filler words here to pass the gate"
)

ADVERSARIAL_DOCS = [
    # (text, lang)
    (None, "en"),
    (None, "en"),                      # two NULLs: one SQL group
    ("", "en"),                        # '' is a DIFFERENT group from NULL
    ("=SUM(A1:A3)", "en"),
    ("+plus prefix", "fr"),
    ("\x0bw1\x1cw2\x1dw3\x1ew4\x1fw5", "fr"),   # Python-\s controls RE2 misses
    ("    　", "de"),   # all-unicode-whitespace text
    ("٠١٢", "de"),               # Arabic-Indic digits: \d vs \p{Nd}
    ("  -42　", "de"),                      # strip -> integer pattern
    ("3,14e+5", None),                          # NULL lang
    (QUALITY_PASS, "en"),
    (QUALITY_PASS.replace("filler", "stuffing"), "en"),  # near-dup pair
    ("N/a", "es"),
    ("https://example.com/path?q=1", "es"),
    ("user.name+tag@example-host.co", "es"),
    ("2024-01-02T03:04", "zh"),
    ("12/31/1999", "zh"),
    ("https://example.com/path?q=1", "zh"),     # exact dup of doc 14
    ("¡Hola! ¿Qué tal? 北京 écran — dash…", "es"),
    ("tab\tsep\nnl\rcr\fff\x0bvt", "en"),
    ("mixed           spaces", "fr"),
]

# documents-only queries with a hard SQL oracle
PARITY_QUERIES = [
    "token_stats",
    "quality_ratios",
    "quality_filter",
    "type_score",
    "lang_counts",
    "top_langs",
    "distinct_ratio",
    "sanitize_text",
    "salted_lang_counts",
    "exact_dedup",
    "minhash_pairs",
    "simhash_pairs",
    "lang_id",
    "fingerprint",
]


@pytest.fixture(scope="module")
def adversarial_sf(tmp_path_factory):
    root = tmp_path_factory.mktemp("advsf")
    texts = [t for t, _ in ADVERSARIAL_DOCS]
    langs = [lang for _, lang in ADVERSARIAL_DOCS]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "source": pa.array(["fixture"] * len(texts), type=pa.string()),
            "n_chars": pa.array(
                [len(t) if t is not None else 0 for t in texts], type=pa.int64()
            ),
        }
    )
    pq.write_table(tbl, str(root / "documents.parquet"))
    return str(root)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """The driver's compare: sorted column names, floats to 2dp, rows
    sorted by all columns with NaN/None first."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(2)
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


@pytest.mark.parametrize("name", PARITY_QUERIES)
def test_adversarial_parity(adversarial_sf, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got = q(adversarial_sf)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{adversarial_sf}/documents.parquet')"
    )
    want = con.execute(sql).fetchdf()
    g, w = _normalize(got), _normalize(want)
    assert list(g.columns) == list(w.columns), (list(g.columns), list(w.columns))
    assert len(g) == len(w), f"{name}: rows {len(g)} vs oracle {len(w)}"
    pd.testing.assert_frame_equal(
        g, w, check_dtype=False, check_exact=False, rtol=0, atol=5e-3
    )


def test_exact_dedup_null_vs_empty_are_distinct_groups(adversarial_sf):
    """Two NULL texts collapse to ONE survivor; '' survives separately
    (SQL GROUP BY semantics -- NULL is not '')."""
    got = entry_mod.queries()["exact_dedup"](adversarial_sf).to_pandas()
    nulls = got[got.text.isna()]
    empties = got[got.text == ""]
    assert len(nulls) == 1 and int(nulls.doc_id.iloc[0]) == 1
    assert len(empties) == 1 and int(empties.doc_id.iloc[0]) == 3
