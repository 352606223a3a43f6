#!/usr/bin/env python3
"""Independent reference implementation of graft.operators.Bpe (byte-pair
encoding trainer + encoder), used to generate the literal expected VALUES in
SparkEntry's `bpe_pinned` oracle.

Deliberately NOT generated from the Scala or the DuckDB renderings: a third,
hand-maintained statement of the intended algorithm (list-based, no string
replace), so a bug in one rendering fails the pinned oracle instead of being
echoed by the dual-rendered ones.

Semantics pinned here:
 - training corpus = (word, frequency) pairs; a word starts as its sequence
   of single characters (NO end-of-word marker — the operator works per
   whitespace word, so word boundaries are already explicit);
 - each round counts adjacent symbol pairs weighted by word frequency and
   merges the single most frequent pair, ties broken by the
   lexicographically SMALLEST (left, right) pair;
 - merging replaces left-to-right NON-OVERLAPPING occurrences in one pass
   ("a a a" with merge (a,a) -> ["aa", "a"]);
 - encoding applies the learned merges in rank order with the same
   non-overlapping scan.

Usage: python3 tools/bpe_reference.py   # prints the VALUES rows
"""

from collections import Counter

# The classic Sennrich et al. (2016) worked example, plus one word ("lowest")
# that exercises merge reuse across words.
PINNED_VOCAB = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
                ("lowest", 4)]
PINNED_MERGES = 8


def merge_word(sym, left, right):
    """Left-to-right non-overlapping replacement of (left, right) pairs."""
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def train(vocab, k):
    """vocab: [(word, freq)]; returns [(rank, left, right, pair_freq)]."""
    words = [(list(w), f) for w, f in vocab]
    merges = []
    for rank in range(1, k + 1):
        counts = Counter()
        for sym, f in words:
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        # max count, ties -> lexicographically smallest pair
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        merges.append((rank, left, right, cnt))
        words = [(merge_word(sym, left, right), f) for sym, f in words]
    return merges


def encode(word, merges):
    sym = list(word)
    for _, left, right, _ in merges:
        sym = merge_word(sym, left, right)
    return sym


if __name__ == "__main__":
    merges = train(PINNED_VOCAB, PINNED_MERGES)
    print("-- bpe_pinned merge rows (rank, left, right, pair_freq):")
    for rank, left, right, cnt in merges:
        print(f"  ({rank}, '{left}', '{right}', {cnt}),")
    print("-- encodings with the learned merges (word -> pieces, n_pieces):")
    for w in ["lowest", "newest", "wider", "low"]:
        pieces = encode(w, merges)
        print(f"  ('{w}', '{' '.join(pieces)}', {len(pieces)}),")
