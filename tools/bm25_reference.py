#!/usr/bin/env python3
"""Independent reference implementation of Okapi BM25 as specified in
graft.operators.Relevance (Lucene-style +1-floored IDF), used to generate
the literal expected VALUES in SparkEntry's `bm25_pinned` oracle.

Deliberately NOT generated from the Scala or the DuckDB renderings — a
third, hand-maintained statement of the formula, so a bug in one rendering
fails the pinned oracle instead of being echoed by the dual-rendered ones.

Usage: python3 tools/bm25_reference.py   # prints the VALUES rows
"""
import math

K1 = 1.2
B = 0.75

CORPUS = [
    (1, "cat sat on the mat"),
    (2, "dog and cat and dog play"),
    (3, "fish swim in deep water"),
    (4, "dog dog dog dog dog dog dog dog"),
]
QUERY = ["cat", "dog"]
TOP_K = 3


def tokens(text):
    return [t for t in text.split(" ") if t != ""]


def bm25(corpus, query, k1=K1, b=B):
    docs = {i: tokens(t) for i, t in corpus}
    n = float(len(docs))
    avgdl = sum(len(t) for t in docs.values()) / n
    dfq = {q: float(sum(1 for t in docs.values() if q in t)) for q in query}
    out = {}
    for i, toks in docs.items():
        dl = float(len(toks))
        score = 0.0
        for q in query:
            tf = float(toks.count(q))
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - dfq[q] + 0.5) / (dfq[q] + 0.5))
            score += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * dl / avgdl))
        if score > 0.0:
            out[i] = round(score, 6)
    return out


if __name__ == "__main__":
    scores = bm25(CORPUS, QUERY)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_K]
    for i, s in ranked:
        print(f"  ({i}, {s:.6f}),")
