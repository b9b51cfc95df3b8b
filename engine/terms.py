"""Per-language term-frequency analysis (top terms per lang).

The corpus-analysis member of the aggregate family: tokenize every
document (same token notion as ``engine.textstats`` -- runs of
non-Python-whitespace over the lowercased text), drop stopwords, count
``(lang, term)`` pairs, and keep the top-k terms per language.

Dataflow: one vectorized Arrow pass per batch (lower -> regex split ->
flatten with ``np.repeat``-ed lang ids -> stopword ``is_in`` filter ->
Arrow ``group_by`` partial counts), then a Ray groupby folds partials
(the exchange moves O(distinct (lang, term) per batch) tiny rows, not
tokens), and :func:`engine.aggregates.grouped_topk` finishes with its
per-batch prune + bucketed fold. Zero per-row Python anywhere.

NULL langs form one group (``null_safe_key`` composite, CLAUDE.md
invariant); NULL text counts as '' like every engine text kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from engine.aggregates import grouped_topk, null_safe_key
from engine.redact import RE2_WS
from engine.textstats import STOPWORDS


def term_counts(ds, text_col: str = "text", lang_col: str = "lang"):
    """Dataset of exact ``(lang, term, n)`` counts, stopwords excluded.
    NULL lang is a real NULL in the output (one group)."""
    stop = pa.array(STOPWORDS, type=pa.string())

    def partial(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t.column(text_col), "")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_lower(txt), pattern=f"[{RE2_WS}]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        # lang id per token: repeat each row's lang by its token count
        reps = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        filled, isnull = null_safe_key(t.column(lang_col))
        idx = pa.array(np.repeat(np.arange(len(t)), reps))
        lang_rep = pc.take(filled, idx)
        null_rep = pc.take(isnull, idx)
        # split() emits '' at run boundaries; drop those and stopwords
        keep = pc.and_(
            pc.not_equal(flat, ""), pc.invert(pc.is_in(flat, value_set=stop))
        )
        comp = pa.table(
            {
                lang_col: lang_rep,
                "__isnull": null_rep,
                "term": flat,
            }
        ).filter(keep)
        return comp.group_by([lang_col, "__isnull", "term"]).aggregate(
            [([], "count_all")]
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # the groupby's sample pass re-executes a lazy upstream: pin the
    # (vocab x batches)-sized partials so tokenization runs ONCE
    # (measured 24.4 s -> one 13 s pass at 6 M rows / 8 CPUs)
    parts = parts.materialize()
    agg = parts.groupby([lang_col, "__isnull", "term"]).sum("count_all")

    def restore(t: pa.Table) -> pa.Table:
        lang = pc.if_else(
            pc.equal(t.column("__isnull"), 1),
            pa.scalar(None, type=t.schema.field(lang_col).type),
            t.column(lang_col),
        )
        return pa.table(
            {
                lang_col: lang,
                "term": t.column("term"),
                "n": t.column("sum(count_all)").cast(pa.int64()),
            }
        )

    return agg.map_batches(restore, batch_format="pyarrow", zero_copy_batch=True)


def top_terms_per_lang(ds, k: int = 5, text_col: str = "text", lang_col: str = "lang"):
    """Top-k terms per language by exact count (ties broken by term
    ascending -- deterministic). Returns a Dataset (lang, term, n)."""
    counts = term_counts(ds, text_col=text_col, lang_col=lang_col)
    return grouped_topk(counts, lang_col, "n", k, tie_cols=("term",))


def doc_frequency(ds, text_col: str = "text"):
    """Exact document frequency per term (number of docs containing the
    term at least once, stopwords excluded): per batch, the (row, term)
    pairs dedupe via one np.unique over (row_idx * |vocab_batch| +
    term_code) composites -- each doc is one row, so within-batch
    distinct IS global distinct -- then partial counts fold through one
    groupby of (term, df) rows."""
    stop = pa.array(STOPWORDS, type=pa.string())

    def partial(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t.column(text_col), "")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_lower(txt), pattern=f"[{RE2_WS}]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        keep = pc.and_(
            pc.not_equal(flat, ""), pc.invert(pc.is_in(flat, value_set=stop))
        )
        reps = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        rows = np.repeat(np.arange(len(t), dtype=np.int64), reps)
        kept = keep.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep)
        rows = rows[kept]
        codes = pc.dictionary_encode(flat)
        if isinstance(codes, pa.ChunkedArray):
            codes = codes.combine_chunks()
        vocab = codes.dictionary
        ci = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        comp = np.unique(rows * np.int64(max(len(vocab), 1)) + ci)
        df_per_code = np.bincount(
            (comp % np.int64(max(len(vocab), 1))).astype(np.int64),
            minlength=len(vocab),
        )
        return pa.table(
            {"term": vocab, "df": pa.array(df_per_code.astype(np.int64))}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # pin the (vocab x batches) partials: the sample pass of the sort
    # groupby would re-tokenize otherwise (ARCHITECTURE §2)
    agg = parts.materialize().groupby("term").sum("df")
    return agg.map_batches(
        lambda t: pa.table(
            {"term": t.column("term"), "df": t.column("sum(df)").cast(pa.int64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def tfidf_top_terms(
    ds, k: int = 5, text_col: str = "text", lang_col: str = "lang"
):
    """Top-k terms per language ranked by exact integer tf (so the
    SELECTION is float-free and deterministic), annotated with document
    frequency and ``tfidf = round(tf * ln(1 + N/df), 2)`` where N is
    the total doc count. The df lookup joins only the SELECTED k x
    langs terms (semi-join filter on the vocab-sized df Dataset), never
    the full vocabulary. Returns a pandas frame
    (lang, term, tf, df, tfidf)."""
    import pandas as pd

    n_docs = ds.count()
    top = top_terms_per_lang(ds, k=k, text_col=text_col, lang_col=lang_col).to_pandas()
    if top.empty:
        return pd.DataFrame(
            columns=[lang_col, "term", "tf", "df", "tfidf"]
        )
    sel = pa.array(sorted(set(top["term"])), type=pa.string())
    dfs = (
        doc_frequency(ds, text_col=text_col)
        .map_batches(
            lambda t: t.filter(pc.is_in(t.column("term"), value_set=sel)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()
    )
    out = top.rename(columns={"n": "tf"}).merge(dfs, on="term", how="left")
    out["tfidf"] = (
        out["tf"] * np.log(1.0 + n_docs / out["df"].to_numpy())
    ).round(2)
    return out[[lang_col, "term", "tf", "df", "tfidf"]]
