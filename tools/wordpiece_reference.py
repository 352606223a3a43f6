#!/usr/bin/env python3
"""Independent reference implementation of graft.operators.WordPiece (the
BERT-style likelihood-scored merge trainer + greedy longest-match-first
encoder, Schuster & Nakajima 2012), used to generate the literal expected
VALUES in SparkEntry's `wordpiece_pinned` / `wordpiece_encode_pinned`
oracles.

Deliberately NOT generated from the Scala: a second hand-maintained
statement of the intended algorithm (naive full recount per round — no
incremental counts, nothing shared with the Scala trainer's plan), so a
bug in one implementation fails the pinned oracle instead of being
echoed.

Semantics pinned here:

 - SYMBOLS: a word's first code point plain, every later one
   '##'-prefixed (["l", "##o", "##w"] for "low").
 - COUNTS: weighted per-occurrence counts over the current vocabulary —
   c(sym) and c(pair) both sum word freq per occurrence.
 - SCORE: score(a, b) = c(a,b) / (c(a) * c(b)) as ONE IEEE double
   division of exact integers (identical in CPython, the JVM and
   DuckDB); per round the argmax is (score desc, pair asc) where the
   pair string is "left  right" compared in UTF-8 byte order (ASCII
   here, so plain string order).
 - MERGE: (a, b) -> a + b-without-'##' prefix; rewrite each word's
   symbol list left-to-right non-overlapping.
 - ENCODE (greedy, BERT rule): from each position take the longest
   substring whose piece form (plain at position 0, '##'+sub after) is
   in the trained piece set (initial alphabet + merge products); any
   unmatchable position collapses the WHOLE word to one '[UNK]'.

Usage: python3 tools/wordpiece_reference.py   # prints the VALUES rows
"""

PINNED_VOCAB = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
                ("lowest", 4)]
K = 8
PINNED_WORDS = ["lowest", "newest", "low", "wider", "newlow", "elow", "zzz"]
UNK = "[UNK]"


def symbols(word):
    return [word[0]] + ["##" + c for c in word[1:]]


def train(vocab, k):
    words = [(symbols(w), f) for w, f in vocab]
    merges = []
    for rank in range(1, k + 1):
        sym_cnt, pair_cnt = {}, {}
        for sy, f in words:
            for s in sy:
                sym_cnt[s] = sym_cnt.get(s, 0) + f
            for a, b in zip(sy, sy[1:]):
                pair_cnt[(a, b)] = pair_cnt.get((a, b), 0) + f
        if not pair_cnt:
            break
        best, bc, bs = None, 0, 0.0
        for (a, b), c in pair_cnt.items():
            s = c / (sym_cnt[a] * sym_cnt[b])
            key = a + "  " + b
            if best is None or s > bs or (s == bs and key < best[0] + "  " + best[1]):
                best, bc, bs = (a, b), c, s
        a, b = best
        merged = a + (b[2:] if b.startswith("##") else b)
        merges.append((rank, a, b, bc, bs))
        nw = []
        for sy, f in words:
            out, i = [], 0
            while i < len(sy):
                if i + 1 < len(sy) and sy[i] == a and sy[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sy[i])
                    i += 1
            nw.append((out, f))
        words = nw
    return merges


def pieces(vocab, merges):
    out = set()
    for w, _ in vocab:
        out.update(symbols(w))
    for _, a, b, _, _ in merges:
        out.add(a + (b[2:] if b.startswith("##") else b))
    return out


def encode(word, piece_set):
    max_len = max(len(p[2:] if p.startswith("##") else p) for p in piece_set)
    out, i = [], 0
    while i < len(word):
        hit = None
        for l in range(min(max_len, len(word) - i), 0, -1):
            sub = word[i:i + l]
            cand = sub if i == 0 else "##" + sub
            if cand in piece_set:
                hit = cand
                i += l
                break
        if hit is None:
            return [UNK]
        out.append(hit)
    return out


if __name__ == "__main__":
    merges = train(PINNED_VOCAB, K)
    print("-- wordpiece_pinned VALUES (rank, left_sym, right_sym, pair_freq, score):")
    for rank, a, b, c, s in merges:
        print(f"  ({rank}, '{a}', '{b}', {c}, {round(s, 9)!r}),")
    ps = pieces(PINNED_VOCAB, merges)
    print("-- wordpiece_encode_pinned VALUES (word, pieces):")
    for w in PINNED_WORDS:
        print(f"  ('{w}', '{' '.join(encode(w, ps))}'),")
