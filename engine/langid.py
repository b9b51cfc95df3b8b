"""Language identification heuristic (n-gram/stopword + script ranges).

Deterministic, self-contained (no external models -- the profiles below
are small hard-coded stopword/function-word lists, public knowledge).
Script detection handles the non-Latin cases (CJK, Cyrillic, Arabic,
kana); Latin-script languages are scored by function-word hit rate.

Output: ``lang_pred`` (ISO-ish code or 'und') + ``lang_conf`` in [0,1].
This is an actor-pool stage: profiles and regexes are built once per
actor (reference pattern T3, ``security.py:11-26``).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

PROFILES = {
    "en": "the of and to a in is you that it for on are with as at be this have from or by one had not but what all were".split(),
    "es": "de la que el en y a los se del las un por con no una su para es al lo como mas pero sus le ya o".split(),
    "de": "der die und in den von zu das mit sich des auf ist im dem nicht ein eine als auch es an werden aus er".split(),
    "fr": "de la le et les des en un du une que est pour qui dans a par plus pas au sur ne se ce il sont".split(),
    "pt": "de a o que e do da em um para com nao uma os no se na por mais as dos como mas foi ao ele".split(),
    "it": "di e il la che in a per un del con non una le si dei sono come dalla lo alla piu o anche ha".split(),
    "nl": "de van het een en in is dat op te zijn met voor niet aan er ook als bij maar om uit nog door".split(),
}

_SCRIPT_RANGES = [
    # kana MUST precede han: Japanese prose is ~25-40% kanji, so a
    # han-first check would classify virtually all Japanese as zh
    ("ja", re.compile(r"[぀-ヿ]")),
    ("zh", re.compile(r"[一-鿿㐀-䶿]")),
    ("ko", re.compile(r"[가-힯]")),
    ("ru", re.compile(r"[Ѐ-ӿ]")),
    ("ar", re.compile(r"[؀-ۿ]")),
    ("el", re.compile(r"[Ͱ-Ͽ]")),
]

_TOKEN = re.compile(r"[a-zà-ÿäöüßñç]+")

_LANGS = list(PROFILES)
assert all(len(w) <= 8 for ws in PROFILES.values() for w in ws)

#: per-language profile words as sorted uint64 packs of their (<=8)
#: bytes -- the vectorized token==word compare of the ASCII fast path
_PROFILE_PACKS = {
    lang: np.sort(
        np.array(
            [int.from_bytes(w.encode().ljust(8, b"\0"), "little") for w in words],
            dtype=np.uint64,
        )
    )
    for lang, words in PROFILES.items()
}

_SAMPLE_CAP = 4000


def _span_langid(b: np.ndarray, off: np.ndarray):
    """(ntok, hitmat) for one row span (off normalized to b)."""
    from engine.textstats import _LOWER

    n = len(off) - 1
    bl = _LOWER[b]
    letter = (bl >= 97) & (bl <= 122)
    # sample cap: positions past row_start+4000 don't participate --
    # built only when some row actually exceeds the cap (the index
    # machinery is 3 span-sized int64 temporaries)
    if len(b) and int((off[1:] - off[:-1]).max()) > _SAMPLE_CAP:
        row_starts = np.repeat(off[:-1], np.diff(off))
        letter &= np.arange(len(b)) < row_starts + _SAMPLE_CAP

    prev = np.empty_like(letter)
    if len(letter):
        prev[0] = False
        prev[1:] = letter[:-1]
        idx = off[:-1]
        prev[idx[idx < len(letter)]] = False
    starts = letter & ~prev
    nxt = np.empty_like(letter)
    if len(letter):
        nxt[-1] = False
        nxt[:-1] = letter[1:]
        idx = off[1:] - 1
        nxt[idx[(idx >= 0) & (idx < len(letter))]] = False
    ends = letter & ~nxt

    si = np.flatnonzero(starts)
    ei = np.flatnonzero(ends)
    rows = np.searchsorted(off, si, side="right") - 1
    ntok = np.bincount(rows, minlength=n).astype(np.int64)

    hitmat = np.zeros((n, len(_LANGS)), np.int64)
    if len(si):
        lengths = ei - si + 1
        short = lengths <= 8
        si_s, len_s, rows_s = si[short], lengths[short], rows[short]
        bp = np.concatenate([bl, np.zeros(8, np.uint8)])
        g = bp[si_s[:, None] + np.arange(8)[None, :]]
        g = np.where(np.arange(8)[None, :] < len_s[:, None], g, 0).astype(np.uint64)
        packs = np.zeros(len(si_s), np.uint64)
        for j in range(8):
            packs |= g[:, j] << np.uint64(8 * j)
        for li, lang in enumerate(_LANGS):
            m = np.isin(packs, _PROFILE_PACKS[lang])
            if m.any():
                hitmat[:, li] = np.bincount(rows_s[m], minlength=n)
    return ntok, hitmat


def _ascii_langid(s: pd.Series):
    """Vectorized (lang_pred, lang_conf) for an all-ASCII batch, exactly
    mirroring :meth:`LangId.classify`: on ASCII text no script range can
    match, tokens are lowercase-letter runs of the first 4000 chars, and
    profile scoring is hit-count argmax (dict order breaks ties, first
    strictly-greater wins -- np.argmax's first-wins matches). Returns
    None when the batch has any non-ASCII byte (callers fall back to
    the per-row path). Cache-blocked like engine.textstats, and OPT-IN
    via ``GRAFT_FAST_KERNELS=1`` for the same reason (see
    engine.textstats._ascii_fast_counts: bandwidth-bound vs the stable
    compute-bound loop path)."""
    import os

    if os.environ.get("GRAFT_FAST_KERNELS") != "1":
        return None
    from engine.textstats import iter_spans, string_buffer

    buf = string_buffer(s)
    if buf is None:
        return None
    b, off = buf
    n = len(off) - 1
    if n == 0:
        return np.array([], object), np.array([], np.float64)
    parts = [
        _span_langid(b[off[r0] : off[r1]], off[r0 : r1 + 1] - off[r0])
        for r0, r1 in iter_spans(off)
    ]
    ntok = np.concatenate([p[0] for p in parts])
    hitmat = np.concatenate([p[1] for p in parts])

    best_idx = np.argmax(hitmat, axis=1)
    best_hits = hitmat[np.arange(n), best_idx]
    und = (best_hits == 0) | (ntok == 0)
    preds = np.array(_LANGS, object)[best_idx]
    preds[und] = "und"
    with np.errstate(divide="ignore", invalid="ignore"):
        conf = np.where(und, 0.0, np.minimum(1.0, best_hits / np.maximum(ntok, 1) * 2))
    return preds, np.round(conf, 6)


class LangId:
    """map_batches callable class: one profile build per actor."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.profiles = {lang: frozenset(words) for lang, words in PROFILES.items()}
        self.scripts = _SCRIPT_RANGES
        self.token = _TOKEN

    def classify(self, text: str):
        if not text:
            return "und", 0.0
        # script-range vote first (non-Latin scripts)
        n = min(len(text), 4000)
        sample = text[:n]
        for lang, rx in self.scripts:
            hits = len(rx.findall(sample))
            if hits / max(1, n) > 0.05:
                return lang, min(1.0, hits / max(1, n) * 4)
        toks = self.token.findall(sample.lower())
        if not toks:
            return "und", 0.0
        best, best_hits = "und", 0
        for lang, words in self.profiles.items():
            hits = sum(1 for t in toks if t in words)
            if hits > best_hits:
                best, best_hits = lang, hits
        if best_hits == 0:
            return "und", 0.0
        return best, min(1.0, best_hits / len(toks) * 2)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        fast = _ascii_langid(s)
        if fast is not None:
            # all-ASCII batch: script ranges cannot match, so the whole
            # classify collapses to vectorized token scoring
            return batch.assign(lang_pred=fast[0], lang_conf=fast[1])
        # per-row loop for batches with non-ASCII rows: the script check
        # early-exits and the profile sets are probed on ONE
        # tokenization; per-language regex-alternation counting
        # measured 2x slower on real text
        preds = [self.classify(t or "") for t in s]
        batch = batch.assign(
            lang_pred=[p[0] for p in preds],
            lang_conf=np.round([p[1] for p in preds], 6),
        )
        return batch


_PROC_CACHE: dict = {}


def _langid_fn(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    li = _PROC_CACHE.get(text_col)
    if li is None:
        li = _PROC_CACHE[text_col] = LangId(text_col)
    return li(batch)


def lang_id(ds, text_col: str = "text", concurrency=None, batch_size: int = 4096):
    """concurrency=None -> elastic tasks with per-process cached
    profiles; an int/tuple -> fixed actor pool."""
    if concurrency is None:
        return ds.map_batches(
            _langid_fn, batch_format="pandas", fn_kwargs={"text_col": text_col}, batch_size=batch_size
        )
    return ds.map_batches(
        LangId,
        batch_format="pandas",
        fn_constructor_kwargs={"text_col": text_col},
        concurrency=concurrency,
        batch_size=batch_size,
    )
