"""Z-order / Hilbert clustering keys on ``(lang, url)`` (L6, north_rule).

The cluster key is a 64-bit space-filling-curve index over

- ``x`` = dictionary code of ``lang`` (driver collects the distinct set
  once -- tiny -- and broadcasts it into the map tasks), and
- ``y`` = the first 4 bytes of the url after its scheme and any
  leading "www.", interpreted big-endian (lexicographic order
  preserved -> min/max url stats of the clustered files are tight,
  enabling manifest-level pruning).

Both the bit-interleave (Morton) and the Hilbert index are computed with
numpy uint64 kernels inside ``map_batches(zero_copy_batch=True)`` -- no
Python per-row work. Clustering itself is ``ds.sort("__zkey")``: Ray
Data's sort samples range boundaries and range-partitions the exchange
(shuffle #2 of the engine, SURVEY 7.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

ZKEY_COL = "__zkey"

_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M8 = np.uint64(0x00FF00FF00FF00FF)
_M16 = np.uint64(0x0000FFFF0000FFFF)


def _spread_bits(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 into the even bit positions."""
    x = x.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & _M16
    x = (x | (x << np.uint64(8))) & _M8
    x = (x | (x << np.uint64(4))) & _M4
    x = (x | (x << np.uint64(2))) & _M2
    x = (x | (x << np.uint64(1))) & _M1
    return x


def morton_interleave(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """64-bit Z-order index of two 32-bit coordinates (x in odd bits)."""
    return (_spread_bits(x) << np.uint64(1)) | _spread_bits(y)


def hilbert_index(x: np.ndarray, y: np.ndarray, order: int = 32) -> np.ndarray:
    """Vectorized 2-D Hilbert curve index (order<=32 -> 64-bit result).

    Classic bottom-up rotate-and-accumulate formulation; the loop is over
    bit levels (32 iterations), each level a numpy kernel over all rows.
    """
    x = x.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    y = y.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    rx = np.zeros_like(x)
    ry = np.zeros_like(y)
    d = np.zeros_like(x)
    s = np.uint64(1) << np.uint64(order - 1)
    while int(s) > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        xf = x[flip]
        x[flip] = (s - np.uint64(1)) - xf
        y_f = y[flip]
        y[flip] = (s - np.uint64(1)) - y_f
        # swap x and y where ry == 0
        xs = x[swap].copy()
        x[swap] = y[swap]
        y[swap] = xs
        s >>= np.uint64(1)
    return d


def url_sort_key32(url_arr) -> np.ndarray:
    """First 4 bytes of each url AFTER scheme and "www." -- big-endian
    uint32, so lexicographic url order is preserved within the prefix
    and z-clustered files carry tight url min/max stats for pruning.

    Stripping "www." matters: on real web corpora most urls share it,
    which would collapse the url coordinate to a constant and degrade
    the curve to lang-only clustering.
    """
    stripped = pc.replace_substring_regex(
        url_arr, pattern="^https?://(www\\.)?", replacement=""
    )
    sliced = pc.utf8_slice_codeunits(pc.fill_null(stripped, ""), 0, 8)
    # vectorized 4-byte big-endian prefix straight from the Arrow utf-8
    # buffer (only the top 32 of the old S8/u64 key survived the >>32,
    # so the first FOUR bytes fully determine it -- bit-identical). The
    # previous to_pandas + str.encode + tolist built one PyObject + one
    # bytes per row inside the clustering hot path.
    if isinstance(sliced, pa.ChunkedArray):
        sliced = sliced.combine_chunks()
    n = len(sliced)
    if n == 0:
        return np.zeros(0, np.uint64)
    off_dtype = np.int64 if pa.types.is_large_string(sliced.type) else np.int32
    off = np.frombuffer(sliced.buffers()[1], dtype=off_dtype)[
        sliced.offset : sliced.offset + n + 1
    ].astype(np.int64)
    data_buf = sliced.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.zeros(0, np.uint8)
    )
    B = np.concatenate([data, np.zeros(4, np.uint8)])
    lens = np.minimum(off[1:] - off[:-1], 4)
    g = B[off[:-1, None] + np.arange(4)[None, :]]
    g = np.where(np.arange(4)[None, :] < lens[:, None], g, 0).astype(np.uint64)
    return (g[:, 0] << np.uint64(24)) | (g[:, 1] << np.uint64(16)) | (
        g[:, 2] << np.uint64(8)
    ) | g[:, 3]


def add_cluster_key(
    batch: pa.Table, lang_codes: dict, curve: str = "zorder",
    cols: tuple = ("lang", "url"),
) -> pa.Table:
    """map_batches body: append the 64-bit cluster key column.

    ``cols`` = (dictionary-coded column, string-prefix column); defaults
    to the north_rule's (lang, url)."""
    code_col, str_col = cols
    # dictionary-encode the (low-cardinality) code column so the
    # lang->code dict is consulted once per DISTINCT value and rows
    # ride one np.take -- the old object-dtype Series.map paid a Python
    # dict lookup per ROW of every cluster job (round-4 VERDICT #2)
    col = batch.column(code_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = col if pa.types.is_dictionary(col.type) else pc.dictionary_encode(col)
    sentinel = np.uint64(len(lang_codes))  # unseen values AND nulls
    codes = np.array(
        [lang_codes.get(v, sentinel) for v in enc.dictionary.to_pylist()]
        + [sentinel],
        dtype=np.uint64,
    )
    idx = pc.fill_null(enc.indices, len(enc.dictionary)).to_numpy(
        zero_copy_only=False
    )
    x = codes[idx]
    y = url_sort_key32(batch.column(str_col))
    if curve == "hilbert":
        key = hilbert_index(x, y)
    else:
        key = morton_interleave(x, y)
    return batch.append_column(ZKEY_COL, pa.array(key, type=pa.uint64()))


def collect_lang_codes(ds, col: str = "lang") -> dict:
    """Driver-side: distinct codes of the dictionary column -> dense
    ints (broadcast to tasks). The distinct set is tiny (ISO codes);
    ``unique`` is a shuffle of pre-aggregated partials, cheap at any
    scale.
    """
    # ds.unique returns None (not []) on a zero-row dataset, e.g. a
    # fresh table's scan -- clustering an empty table is a no-op, not
    # an error
    vals = sorted(v for v in (ds.unique(col) or []) if v is not None)
    return {v: i for i, v in enumerate(vals)}


def cluster_dataset(ds, lang_codes: dict, curve: str = "zorder", cols: tuple = ("lang", "url")):
    """Attach key computation + range-partitioning sort; key column is
    kept so the writer can record per-file zkey stats (dropped at scan)."""
    keyed = ds.map_batches(
        add_cluster_key,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"lang_codes": lang_codes, "curve": curve, "cols": cols},
    )
    return keyed.sort(ZKEY_COL)
