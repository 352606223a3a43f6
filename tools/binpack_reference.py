#!/usr/bin/env python3
"""Independent reference implementation of graft.operators.Sampling
.packBestFit (best-fit-decreasing whole-document packing — Ding et al.
2024, "Fewer Truncations Improve Language Modeling", arXiv:2404.10830),
used to generate the literal expected VALUES in SparkEntry's
`pack_bestfit_pinned` oracle.

Deliberately NOT generated from the Scala: a second hand-maintained
statement of the intended algorithm, so a bug in one implementation
fails the pinned oracle instead of being echoed.

Semantics pinned here:
 - SPLIT: a document of n > 0 tokens becomes ceil(n/seqLen) pieces;
   piece i (0-based) has length min(seqLen, n - i*seqLen).
 - ORDER: pieces sort by (len desc, id asc, piece asc) within a group.
 - PLACE: each piece lands in the open bin with the SMALLEST remaining
   capacity >= len (ties -> lowest bin id), else opens bin id
   `next_counter` (ids issued 0,1,2,... per group). Offset = seqLen -
   remaining-before-placement.

Run: python3 tools/binpack_reference.py  -> prints the pinned fixture's
placement as SQL VALUES rows.
"""

SEQ_LEN = 10

# the pinned fixture: (id, n_tokens) — mixed sizes, one over-long doc
# (23 -> pieces 10+10+3), duplicates, and an exact-fill length
FIXTURE = [
    (1, 7),
    (2, 23),
    (3, 4),
    (4, 4),
    (5, 10),
    (6, 3),
    (7, 6),
    (8, 2),
    (9, 5),
]


def pieces(fixture, seq_len):
    out = []
    for doc_id, n in fixture:
        if n <= 0:
            continue
        i = 0
        left = n
        while left > 0:
            out.append((doc_id, i, min(seq_len, left)))
            left -= seq_len
            i += 1
    return out


def pack(fixture, seq_len):
    ps = sorted(pieces(fixture, seq_len),
                key=lambda p: (-p[2], p[0], p[1]))
    bins = []  # list of (remaining, bin_id) kept unsorted; scan for best
    next_bin = 0
    placed = []
    for doc_id, piece, ln in ps:
        best = None
        for j, (rem, bid) in enumerate(bins):
            if rem >= ln and (best is None or
                              (rem, bid) < (bins[best][0], bins[best][1])):
                best = j
        if best is None:
            bins.append((seq_len - ln, next_bin))
            placed.append((doc_id, piece, ln, next_bin, 0))
            next_bin += 1
        else:
            rem, bid = bins[best]
            bins[best] = (rem - ln, bid)
            placed.append((doc_id, piece, ln, bid, seq_len - rem))
    return placed


def main():
    placed = pack(FIXTURE, SEQ_LEN)
    placed.sort()
    print("-- (id, piece, len, seq_id, offset) for seqLen=%d" % SEQ_LEN)
    rows = ",\n".join("  (%d, %d, %d, %d, %d)" % p for p in placed)
    print("VALUES\n%s" % rows)


if __name__ == "__main__":
    main()
