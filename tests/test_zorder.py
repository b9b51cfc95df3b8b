"""Z-order / Hilbert kernels and the clustering job (L6)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from engine.zorder import (
    hilbert_index,
    morton_interleave,
    url_sort_key32,
)


def _morton_scalar(x, y):
    out = 0
    for i in range(32):
        out |= ((y >> i) & 1) << (2 * i)
        out |= ((x >> i) & 1) << (2 * i + 1)
    return out


def _hilbert_scalar(x, y, order):
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def test_morton_matches_scalar():
    rng = np.random.default_rng(1)
    xs = rng.integers(0, 2**32, 256, dtype=np.uint64)
    ys = rng.integers(0, 2**32, 256, dtype=np.uint64)
    got = morton_interleave(xs, ys)
    for i in range(256):
        assert int(got[i]) == _morton_scalar(int(xs[i]), int(ys[i]))


def test_hilbert_matches_scalar():
    rng = np.random.default_rng(2)
    xs = rng.integers(0, 2**10, 128, dtype=np.uint64)
    ys = rng.integers(0, 2**10, 128, dtype=np.uint64)
    got = hilbert_index(xs.copy(), ys.copy(), order=10)
    for i in range(128):
        assert int(got[i]) == _hilbert_scalar(int(xs[i]), int(ys[i]), 10)


def test_hilbert_locality():
    # consecutive indices along the curve are adjacent cells in space
    n = 4
    coords = {}
    for x in range(2**n):
        for y in range(2**n):
            d = _hilbert_scalar(x, y, n)
            coords[d] = (x, y)
    for d in range(1, 4**n):
        (x0, y0), (x1, y1) = coords[d - 1], coords[d]
        assert abs(x0 - x1) + abs(y0 - y1) == 1


def test_url_key_preserves_order():
    urls = pa.array(
        ["https://aaa.com/1", "https://abb.com/1", "http://zzz.io/x", "https://aaa.com/2", None]
    )
    k = url_sort_key32(urls)
    assert k[0] < k[1] < k[2]
    assert k[4] == 0  # null -> 0


def test_zorder_groups_langs(ray_session):
    # after clustering, rows of the same lang are contiguous in zkey order
    import ray.data
    from engine.zorder import cluster_dataset, collect_lang_codes

    n = 400
    rng = np.random.default_rng(3)
    langs = np.array(["en", "zh", "es", "de"])[rng.integers(0, 4, n)]
    t = pa.table(
        {
            "url": [f"https://site{i % 37}.com/p/{i}" for i in range(n)],
            "lang": pa.array(langs.astype(object), type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    codes = collect_lang_codes(ds)
    assert codes == {"de": 0, "en": 1, "es": 2, "zh": 3}
    out = cluster_dataset(ds, codes).to_pandas()
    # lang is the high-order interleave bit source -> langs form contiguous runs
    runs = (out["lang"] != out["lang"].shift()).sum()
    assert runs <= len(codes) + 1
