"""Document fingerprinting via rolling-hash winnowing (Schleimer et al.,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003
-- public method).

- :func:`rolling_hashes`  Rabin-Karp polynomial hashes of all k-grams,
  computed with a vectorized numpy recurrence (k multiply-adds total,
  each over the whole document -- no per-gram Python loop).
- :func:`winnow`          minimum hash per sliding window of w k-gram
  hashes (rightmost-min tie-break) -> the fingerprint set.
- :func:`fingerprint64`   order-independent 64-bit digest of the
  fingerprint set (xor-fold), a compact per-document identity that is
  robust to small edits outside selected windows.
- :func:`fingerprint_stage`  map_batches stage emitting
  ``(id, fingerprint, n_grams)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_BASE = np.uint64(1_000_003)
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)  # mod 2^64 arithmetic


def rolling_hashes(text, k: int = 5) -> np.ndarray:
    """Polynomial rolling hashes of every k-char gram (mod 2^64).
    Accepts ``str`` or pre-encoded utf-8 ``bytes`` (batch callers encode
    once and reuse the bytes for the gram count)."""
    raw = text if isinstance(text, bytes) else text.encode("utf-8")
    data = np.frombuffer(raw, dtype=np.uint8).astype(np.uint64)
    n = len(data)
    if n < k:
        return np.array([], dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = np.zeros(n - k + 1, dtype=np.uint64)
        for j in range(k):
            h = h * _BASE + data[j : n - k + 1 + j]
    return h


def winnow(hashes: np.ndarray, w: int = 4) -> np.ndarray:
    """Winnowing: pick the min hash of each window of w consecutive
    k-gram hashes (rightmost on ties), dedup'd. Vectorized via a
    sliding-window-view argmin."""
    if len(hashes) == 0:
        return hashes
    if len(hashes) <= w:
        return np.array([hashes.min()], dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(hashes, w)
    # rightmost min: reverse, argmin picks first (== rightmost original)
    rev = win[:, ::-1]
    idx = (w - 1) - rev.argmin(axis=1)
    mins = win[np.arange(len(win)), idx]
    pos = np.arange(len(win)) + idx
    _, first = np.unique(pos, return_index=True)
    return mins[first]


def fingerprint64(text, k: int = 5, w: int = 4) -> int:
    """Order-independent xor-fold of the winnowed hash set."""
    fp = winnow(rolling_hashes(text, k), w)
    if len(fp) == 0:
        return 0
    out = np.uint64(0)
    with np.errstate(over="ignore"):
        for v in np.unique(fp):
            out ^= v * _BASE + np.uint64(1)
    return int(out)


def fingerprint_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id", k: int = 5, w: int = 4
) -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    # encode ONCE per row: the bytes feed both the hash and the gram count
    bs = [(t or "").encode("utf-8") for t in texts]
    fps = np.array([fingerprint64(b, k, w) for b in bs], dtype=np.uint64)
    n_grams = np.array([max(0, len(b) - k + 1) for b in bs], dtype=np.int64)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "fingerprint": pa.array(fps, type=pa.uint64()),
            "n_grams": pa.array(n_grams),
        }
    )


def fingerprint_stage(ds, text_col: str = "text", id_col: str = "doc_id", k: int = 5, w: int = 4):
    return ds.map_batches(
        fingerprint_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"text_col": text_col, "id_col": id_col, "k": k, "w": w},
    )
