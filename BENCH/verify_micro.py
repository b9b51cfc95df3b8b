#!/usr/bin/env python
"""Micro-benchmark of the minhash VERIFY fold in isolation (round-4
VERDICT #1): old per-pair Python set intersection vs the vectorized
sorted-hash-array fold, on an identical candidate-pair batch with
realistic dup-cluster structure (each doc appears in many pairs, so
per-doc memoization matters in both versions). Asserts value equality
(same jaccard per pair after both-empty handling) before timing.

Run:  python BENCH/verify_micro.py [--docs 20000] [--pairs 200000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--pairs", type=int, default=200000)
    ap.add_argument("--tokens", type=int, default=120)
    args = ap.parse_args()

    from engine.dedup import (
        word_shingles,
        _doc_shingle_hash_sets,
        _pairwise_jaccard,
    )

    rng = np.random.default_rng(42)
    vocab = np.array([f"tok{i}" for i in range(5000)])
    # dup clusters of ~8: cluster base text + per-doc few-token edits
    texts = []
    base = None
    for i in range(args.docs):
        if i % 8 == 0 or base is None:
            base = list(rng.choice(vocab, args.tokens))
        t = list(base)
        for _ in range(int(rng.integers(0, 4))):
            t[int(rng.integers(0, len(t)))] = str(rng.choice(vocab))
        texts.append(" ".join(t))
    # candidate pairs biased inside clusters (like LSH output)
    a = rng.integers(0, args.docs, args.pairs)
    off = rng.integers(1, 8, args.pairs)
    b = np.minimum(a // 8 * 8 + (a % 8 + off) % 8, args.docs - 1)
    a, b = np.minimum(a, b), np.maximum(a, b)
    keep = a != b
    a, b = a[keep], b[keep]
    df = pd.DataFrame({
        "id_a": a.astype(np.int64), "id_b": b.astype(np.int64),
        "text_a": [texts[i] for i in a], "text_b": [texts[i] for i in b],
    })
    k = 3

    def old_fold(df: pd.DataFrame) -> np.ndarray:
        sets: dict = {}

        def doc_set(doc_id, text):
            s = sets.get(doc_id)
            if s is None:
                s = set(word_shingles(text if isinstance(text, str) else "", k))
                sets[doc_id] = s
            return s

        def jac_pair(ga, gb):
            if not ga and not gb:
                return 1.0
            inter = len(ga & gb)
            return inter / (len(ga) + len(gb) - inter)

        return np.array([
            jac_pair(doc_set(ia, ta), doc_set(ib, tb))
            for ia, ib, ta, tb in zip(df["id_a"], df["id_b"], df["text_a"], df["text_b"])
        ])

    def new_fold(df: pd.DataFrame) -> np.ndarray:
        # the engine's verify body (engine/dedup.py minhash_dedup_pairs)
        ids = np.concatenate([df["id_a"].to_numpy(), df["id_b"].to_numpy()])
        tx = pd.concat([df["text_a"], df["text_b"]]).to_numpy(dtype=object)
        uids, first = np.unique(ids, return_index=True)
        u, u_off = _doc_shingle_hash_sets(tx[first], k)
        ia = np.searchsorted(uids, df["id_a"].to_numpy())
        ib = np.searchsorted(uids, df["id_b"].to_numpy())
        return _pairwise_jaccard(u, u_off, ia, ib)

    # equality first (on a slice to keep the old fold affordable)
    head = df.head(20000)
    assert np.array_equal(old_fold(head), new_fold(head)), "fold divergence"

    def best_of(f, n=2):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f(df)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_new = best_of(new_fold)
    t_old = best_of(old_fold)
    print(json.dumps({
        "what": "minhash verify fold micro-bench (one process, identical batch)",
        "docs": args.docs, "pairs": int(len(df)), "tokens_per_doc": args.tokens,
        "sec_old_set_fold": round(t_old, 3),
        "sec_new_vectorized": round(t_new, 3),
        "speedup": round(t_old / t_new, 2),
    }))


if __name__ == "__main__":
    main()
