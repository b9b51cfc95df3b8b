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
import pyarrow as pa

TOKEN_PATTERN = r"\S+"
WORD_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
ALPHA_PATTERN = r"[A-Za-z]"
PUNCT_PATTERN = r"[^A-Za-z0-9\s]"

#: fixed, tiny, fully deterministic stopword list (public knowledge)
STOPWORDS = (
    "the of and a to in is you that it he was for on are as with his they at"
).split() + ["be", "this", "have", "from", "or"]

assert len(STOPWORDS) == 25
assert all(len(w) <= 4 for w in STOPWORDS)

#: stopwords as little-endian uint32 packs of their (<=4) bytes --
#: enables a fully vectorized token==stopword compare
_STOP_PACKS = np.sort(
    np.array(
        [int.from_bytes(w.encode().ljust(4, b"\0"), "little") for w in STOPWORDS],
        dtype=np.uint32,
    )
)


def _ascii_fast_counts(s: pd.Series):
    """All six counts in O(bytes) numpy over the utf-8 buffer -- no
    regex. Returns None when the block contains any non-ASCII byte
    (callers fall back to the regex path; byte-level char classes and
    Python's unicode ``\\s``/token semantics only coincide on ASCII).

    Definitions mirror the regex path EXACTLY (fuzz-tested): token =
    ``\\S+`` run, word = letter-run | digit-run | single other-non-ws
    char, stopword = whole token equal to one of the 25 words after
    ASCII lowercasing."""
    import pyarrow.compute as pc

    arr = pa.array(s, type=pa.string())
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    off_buf, data_buf = arr.buffers()[1], arr.buffers()[2]
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(off_buf, dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1]
    lo, hi = int(off[0]), int(off[-1])
    b = np.frombuffer(data_buf, dtype=np.uint8)[lo:hi] if data_buf is not None else np.zeros(0, np.uint8)
    if len(b) and int(b.max()) >= 0x80:
        return None
    off = (off.astype(np.int64) - lo)
    n = len(arr)

    upper = (b >= 65) & (b <= 90)
    loweralpha = (b >= 97) & (b <= 122)
    alpha = upper | loweralpha
    digit = (b >= 48) & (b <= 57)
    ws = (b == 32) | ((b >= 9) & (b <= 13))
    punct = ~(alpha | digit | ws)
    nonws = ~ws

    def per_row(mask):
        # np.add.reduceat, NOT cumsum: this numpy's cumsum runs ~100x
        # slower than reduceat on bool/int inputs (measured); int64 cast
        # avoids int8 overflow on long rows. reduceat quirks handled:
        # empty segments return mask[idx] -> zeroed; trailing empty rows
        # index past the end -> clipped then zeroed.
        if n == 0 or len(mask) == 0:
            return np.zeros(n, np.int64)
        # sentinel element so trailing-empty-row offsets (== len) stay
        # valid WITHOUT clipping (clipping would truncate the previous
        # segment by one element)
        m = np.empty(len(mask) + 1, np.int64)
        m[:-1] = mask
        m[-1] = 0
        r = np.add.reduceat(m, off[:-1])
        r[off[:-1] == off[1:]] = 0
        return r

    def run_starts(mask):
        prev = np.empty_like(mask)
        if len(mask):
            prev[0] = False
            prev[1:] = mask[:-1]
            idx = off[:-1]
            prev[idx[idx < len(mask)]] = False  # row boundary: no prev char
        return mask & ~prev

    tok_starts = run_starts(nonws)
    n_chars = (off[1:] - off[:-1]).astype(np.int64)
    n_alpha = per_row(alpha)
    n_punct = per_row(punct)
    n_tokens = per_row(tok_starts)
    n_words = per_row(run_starts(alpha)) + per_row(run_starts(digit)) + n_punct

    # stopword count: token length from starts/ends, short tokens packed
    # into uint32 and compared against the precomputed stopword packs
    si = np.flatnonzero(tok_starts)
    if len(si):
        nxt = np.empty_like(nonws)
        nxt[-1] = False
        nxt[:-1] = nonws[1:]
        idx = off[1:] - 1  # last char of each row has no next char
        nxt[idx[(idx >= 0) & (idx < len(nxt))]] = False
        ei = np.flatnonzero(nonws & ~nxt)
        lengths = ei - si + 1
        short = lengths <= 4
        si_s, len_s = si[short], lengths[short]
        bp = np.concatenate([b, np.zeros(4, np.uint8)])
        g = bp[si_s[:, None] + np.arange(4)[None, :]]
        g = np.where(np.arange(4)[None, :] < len_s[:, None], g, 0)
        g = np.where((g >= 65) & (g <= 90), g | 32, g).astype(np.uint32)
        packs = g[:, 0] | (g[:, 1] << 8) | (g[:, 2] << 16) | (g[:, 3] << 24)
        is_stop = np.isin(packs, _STOP_PACKS)
        rows = np.searchsorted(off, si_s[is_stop], side="right") - 1
        n_stop = np.bincount(rows, minlength=n).astype(np.int64)
    else:
        n_stop = np.zeros(n, np.int64)
    return n_chars, n_tokens, n_words, n_alpha, n_punct, n_stop


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
        fast = _ascii_fast_counts(s)
        if fast is not None:
            n_chars, n_tokens, n_words, n_alpha, n_punct, n_stop = (
                pd.Series(a, index=s.index) for a in fast
            )
        else:
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
