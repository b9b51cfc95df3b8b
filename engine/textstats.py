"""Text analysis stages over the ``documents``/pages text column:
token counting, quality scoring (SQL-mirrorable so DuckDB can oracle
them) -- all vectorized pandas/numpy inside ``map_batches``.

Definitions are chosen to be *exactly* expressible in DuckDB (see
``__ray_entry__.oracle_sql``):

- ``n_tokens``     number of ``\\S+`` runs
- ``n_words``      number of ``[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]`` matches
  (a BPE-ish pre-tokenization without unicode classes, so Python `re`
  and DuckDB RE2 agree)
- ``n_chars``      length in characters
- ``alpha_ratio``  alphabetic chars / n_chars (0 for empty)
- ``punct_ratio``  non-alnum-non-space chars / n_chars (0 for empty)
- ``stop_ratio``   tokens in a fixed 25-word English stopword list /
  n_tokens (0 for empty) -- the quality heuristic of C4-style filters
- ``quality``      composite in [0,1]
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

TOKEN_PATTERN = r"\S+"
WORD_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
ALPHA_PATTERN = r"[A-Za-z]"
PUNCT_PATTERN = r"[^A-Za-z0-9\s]"

#: fixed, tiny, fully deterministic stopword list (public knowledge)
STOPWORDS = (
    "the of and a to in is you that it he was for on are as with his they at"
).split() + ["be", "this", "have", "from", "or"]

assert len(STOPWORDS) == 25


class TextStats:
    """Actor-pool stage: regexes compiled once per actor (T3 pattern)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.tok = re.compile(TOKEN_PATTERN)
        self.word = re.compile(WORD_PATTERN)
        self.alpha = re.compile(ALPHA_PATTERN)
        self.punct = re.compile(PUNCT_PATTERN)
        self.stops = set(STOPWORDS)
        # one C-regex alternation counting whole \S+ tokens equal to a
        # stopword -- replaces a per-row Python membership loop
        alt = "|".join(sorted(STOPWORDS, key=len, reverse=True))
        self.stop_rx = re.compile(rf"(?<![^\s])(?:{alt})(?![^\s])")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        n_chars = s.str.len().astype("int64")
        n_tokens = s.str.count(self.tok).astype("int64")
        n_words = s.str.count(self.word).astype("int64")
        n_alpha = s.str.count(self.alpha).astype("int64")
        n_punct = s.str.count(self.punct).astype("int64")
        n_stop = s.str.lower().str.count(self.stop_rx).astype("int64")

        nc = n_chars.to_numpy().astype(np.float64)
        nt = n_tokens.to_numpy().astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            alpha_ratio = np.where(nc > 0, n_alpha / nc, 0.0)
            punct_ratio = np.where(nc > 0, n_punct / nc, 0.0)
            stop_ratio = np.where(nt > 0, n_stop / nt, 0.0)
        batch = batch.assign(
            n_chars=n_chars,
            n_tokens=n_tokens,
            n_words=n_words,
            alpha_ratio=alpha_ratio,
            punct_ratio=punct_ratio,
            stop_ratio=stop_ratio,
        )
        batch["quality"] = quality_score(
            batch["n_tokens"].to_numpy(), alpha_ratio, punct_ratio, stop_ratio
        )
        return batch


def quality_score(n_tokens, alpha_ratio, punct_ratio, stop_ratio) -> np.ndarray:
    """Composite [0,1] heuristic: long-enough, mostly alphabetic, not
    punctuation-soup, some stopwords (C4/Gopher-style signals)."""
    length_ok = np.clip(np.asarray(n_tokens, dtype=np.float64) / 50.0, 0.0, 1.0)
    return np.round(
        0.25 * length_ok
        + 0.35 * np.asarray(alpha_ratio, dtype=np.float64)
        + 0.25 * (1.0 - np.clip(np.asarray(punct_ratio, dtype=np.float64) * 4, 0, 1))
        + 0.15 * np.clip(np.asarray(stop_ratio, dtype=np.float64) * 5, 0, 1),
        6,
    )


_PROC_CACHE: dict = {}


def _stats_fn(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Task-based variant: state built once per worker process (module
    cache) -- elastic like tasks, amortized like an actor."""
    st = _PROC_CACHE.get(text_col)
    if st is None:
        st = _PROC_CACHE[text_col] = TextStats(text_col)
    return st(batch)


def text_stats(ds, text_col: str = "text", concurrency=None, batch_size: int = 4096):
    """concurrency=None -> elastic stateless tasks with per-process
    cached state; an int/tuple -> a fixed actor pool (use when setup is
    genuinely heavy, e.g. model loads)."""
    if concurrency is None:
        return ds.map_batches(
            _stats_fn,
            batch_format="pandas",
            fn_kwargs={"text_col": text_col},
            batch_size=batch_size,
        )
    return ds.map_batches(
        TextStats,
        batch_format="pandas",
        fn_constructor_kwargs={"text_col": text_col},
        concurrency=concurrency,
        batch_size=batch_size,
    )
