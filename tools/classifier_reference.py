#!/usr/bin/env python3
"""Independent reference implementation of the hashed linear classifier in
graft.functions.QualityOps.classifierScore, used to generate the literal
expected VALUES in SparkEntry's `classifier_pinned` oracle.

Recomputes the token hashes (polynomial rolling hash mod TOKEN_MOD) AND the
cell weights from scratch: score = (Σ (h·MULT mod B)) / B / n_tokens − 0.5,
0.0 for an empty document.

Usage: python3 tools/classifier_reference.py   # prints the VALUES rows
"""

TOKEN_MOD = 1000003
MULT = 2654435761
BUCKETS = 1048576  # 2^20

CORPUS = [
    (1, "cat sat on the mat"),
    (2, "dog and cat and dog play"),
    (3, ""),
]


def poly_hash(s):
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % TOKEN_MOD
    return acc


def score(text):
    toks = [t for t in text.split(" ") if t != ""]
    if not toks:
        return 0.0
    cell_sum = sum(poly_hash(t) * MULT % BUCKETS for t in toks)
    return round(cell_sum / float(BUCKETS) / len(toks) - 0.5, 6)


if __name__ == "__main__":
    for i, text in CORPUS:
        print(f"  ({i}, {score(text):.6f}),")
