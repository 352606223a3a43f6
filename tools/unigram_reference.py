#!/usr/bin/env python3
"""Independent reference implementation of graft.operators.Unigram (the
SentencePiece-style unigram-LM tokenizer trainer + Viterbi encoder, Kudo
2018 "Subword Regularization", arXiv:1804.10959), used to generate the
literal expected VALUES in SparkEntry's `unigram_tokenizer` /
`unigram_encode_pinned` oracles.

Deliberately NOT generated from the Scala: a second hand-maintained
statement of the intended algorithm, so a bug in one implementation fails
the pinned oracle instead of being echoed.

Semantics pinned here (all arithmetic in RAW probability space — only
+ * / on IEEE doubles, no log/exp, so the op sequence is bit-identical
between CPython and the JVM; results round to 9 decimals):

 - SEED: every substring of length <= maxLen of every vocab word, counted
   once per occurrence position weighted by the word's frequency. The
   seed vocabulary is all single characters plus the top (seedSize -
   #chars) multi-char substrings by (count desc, piece asc).
 - INIT: p(piece) = count/total, total summed in piece-sorted order.
 - EM (emIters rounds): E-step runs forward-backward over each word's
   segmentation lattice (spans of length <= maxLen whose piece is in the
   model; alpha/beta position loops ascending, span starts ascending) and
   accumulates expected counts weighted by word frequency, words visited
   in sorted order; M-step renormalizes (total in piece-sorted order).
 - PRUNE: keep all single chars plus the top (vocabSize - #chars)
   multi-char pieces by (p desc, piece asc); renormalize.
 - VITERBI: best[i] maximizes best[j] * p(w[j:i]) scanning j ascending
   with strict >, so the LONGEST last piece wins ties; characters absent
   from the model act as singleton pieces with p = 1e-9.

Usage: python3 tools/unigram_reference.py   # prints the VALUES rows
"""

PINNED_VOCAB = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
                ("lowest", 4)]
MAX_LEN = 4
SEED_SIZE = 30
EM_ITERS = 2
VOCAB_SIZE = 15
PINNED_WORDS = ["lowest", "newest", "low", "wider", "newlow"]
P_UNK = 1e-9


def seed(vocab, max_len, seed_size):
    counts = {}
    for w, f in sorted(vocab):
        for i in range(len(w)):
            for l in range(1, min(max_len, len(w) - i) + 1):
                s = w[i:i + l]
                counts[s] = counts.get(s, 0) + f
    singles = sorted(s for s in counts if len(s) == 1)
    multi = sorted((s for s in counts if len(s) > 1),
                   key=lambda s: (-counts[s], s))[:max(0, seed_size - len(singles))]
    return {s: counts[s] for s in sorted(singles + multi)}


def lattice_em(vocab, probs, max_len):
    expected = {s: 0.0 for s in sorted(probs)}
    for w, f in sorted(vocab):
        n = len(w)
        alpha = [0.0] * (n + 1)
        alpha[0] = 1.0
        for i in range(1, n + 1):
            for j in range(max(0, i - max_len), i):
                s = w[j:i]
                if s in probs:
                    alpha[i] += alpha[j] * probs[s]
        beta = [0.0] * (n + 1)
        beta[n] = 1.0
        for i in range(n - 1, -1, -1):
            for j in range(i + 1, min(n, i + max_len) + 1):
                s = w[i:j]
                if s in probs:
                    beta[i] += probs[s] * beta[j]
        z = alpha[n]
        if z <= 0.0:
            continue
        for i in range(n):
            for j in range(i + 1, min(n, i + max_len) + 1):
                s = w[i:j]
                if s in probs:
                    expected[s] += f * (alpha[i] * probs[s] * beta[j] / z)
    return expected


def train(vocab, max_len, seed_size, em_iters, vocab_size):
    counts = seed(vocab, max_len, seed_size)
    total = 0.0
    for s in sorted(counts):
        total += float(counts[s])
    probs = {s: counts[s] / total for s in sorted(counts)}
    for _ in range(em_iters):
        expected = lattice_em(vocab, probs, max_len)
        total = 0.0
        for s in sorted(expected):
            total += expected[s]
        probs = {s: expected[s] / total for s in sorted(expected)}
    singles = sorted(s for s in probs if len(s) == 1)
    multi = sorted((s for s in probs if len(s) > 1),
                   key=lambda s: (-probs[s], s))[:max(0, vocab_size - len(singles))]
    kept = sorted(singles + multi)
    total = 0.0
    for s in kept:
        total += probs[s]
    return {s: probs[s] / total for s in kept}


def viterbi(word, probs, max_len):
    """Raw-space DP with the EXACT underflow rescale the Scala expression
    applies: when the frontier drops below 2^-600 the live window (the
    only cells a later position reads) shifts up by 2^600 via ldexp — a
    pure exponent change, so every comparison matches unbounded
    precision and arbitrarily long words segment correctly."""
    import math
    n = len(word)
    best = [0.0] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 1.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            s = word[j:i]
            p = probs.get(s, P_UNK if len(s) == 1 else None)
            if p is None:
                continue
            cand = best[j] * p
            if cand > best[i]:
                best[i] = cand
                back[i] = j
        if 0.0 < best[i] < math.ldexp(1.0, -600):
            for k in range(max(0, i - max_len + 1), i + 1):
                best[k] = math.ldexp(best[k], 600)
    pieces = []
    i = n
    while i > 0:
        pieces.append(word[back[i]:i])
        i = back[i]
    return list(reversed(pieces))


def main():
    probs = train(PINNED_VOCAB, MAX_LEN, SEED_SIZE, EM_ITERS, VOCAB_SIZE)
    print("-- unigram_tokenizer VALUES (piece, prob) --")
    for s in sorted(probs):
        print(f"  ('{s}', {round(probs[s], 9):.9f}),")
    print("-- unigram_encode_pinned VALUES (word, pieces) --")
    for w in PINNED_WORDS:
        print(f"  ('{w}', '{' '.join(viterbi(w, probs, MAX_LEN))}'),")


if __name__ == "__main__":
    main()
