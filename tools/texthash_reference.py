#!/usr/bin/env python3
"""Independent reference implementation of the graft.functions.TextOps hash
family (polynomial rolling hash, wide token prints, word-shingle hashes,
MinHash signatures + band hashes, SimHash), used to generate the literal
expected VALUES in SparkEntry's `text_hash_pinned` oracle.

Deliberately NOT generated from the Scala or the DuckDB renderings: a third,
hand-maintained statement of the intended arithmetic, so a bug in one
rendering fails the pinned oracle instead of being echoed by the
dual-rendered ones (the round-7 lesson: engine-equivalent is not correct).

Usage: python3 tools/texthash_reference.py   # prints the VALUES rows
"""

TOKEN_MOD = 1000003
HASH_MOD = 2147483647  # 2^31 - 1
NUM_HASHES = 16
ROWS_PER_BAND = 4
SIMHASH_BITS = 63


def poly_hash(s: str, mult: int = 31, mod: int = TOKEN_MOD) -> int:
    """(acc*mult + codepoint) % mod over the string's code points (Python
    strings iterate code points natively, matching the Scala codePointAt
    loop); 0 for the empty string."""
    acc = 0
    for ch in s:
        acc = (acc * mult + ord(ch)) % mod
    return acc


def tokens(text: str):
    return [t for t in text.split(" ") if t != ""]


def token_hashes(toks):
    return [poly_hash(t) for t in toks]


def token_hashes_wide(toks):
    return [poly_hash(t, 31, HASH_MOD) * HASH_MOD + poly_hash(t, 131, HASH_MOD)
            for t in toks]


def shingle_hashes(th, k: int = 3):
    if len(th) < k:
        return []
    w = [pow(TOKEN_MOD, k - 1 - d, HASH_MOD) for d in range(k)]
    return [sum(th[i + d] * w[d] for d in range(k)) % HASH_MOD
            for i in range(len(th) - k + 1)]


def hash_a(j: int) -> int:
    return (1103515245 * (j + 1) + 12345) % HASH_MOD


def hash_b(j: int) -> int:
    return (12345 + 1013904223 * j) % HASH_MOD


def minhash_sig(shingles):
    return [min(((hash_a(j) * s + hash_b(j)) % HASH_MOD for s in shingles),
                default=None)
            for j in range(NUM_HASHES)]


def band_hash(sig, band: int) -> int:
    acc = 0
    for r in range(ROWS_PER_BAND):
        v = sig[band * ROWS_PER_BAND + r]
        if v is None:
            return None
        acc = (acc * 31 + v) % HASH_MOD
    return acc


def simhash(prints, bits: int = SIMHASH_BITS) -> int:
    out = 0
    for b in range(bits):
        votes = sum(((t >> b) % 2) * 2 - 1 for t in prints)
        if votes > 0:
            out |= 1 << b
    return out


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "héllo wörld 日本語 mixed"),
    (3, "a b"),
    (4, ""),
    (5, "aa aa aa aa"),
]

if __name__ == "__main__":
    def sql(v):
        return "NULL" if v is None else str(v)
    for cid, text in CORPUS:
        tk = tokens(text)
        th = token_hashes(tk)
        sh = shingle_hashes(th)
        sig = minhash_sig(sh)
        print(f"  ({cid}, {poly_hash(text)}, "
              f"{simhash(token_hashes_wide(tk))}, "
              f"{len(sh)}, {sql(sh[0] if sh else None)}, "
              f"{sql(band_hash(sig, 0))}, {sql(band_hash(sig, 3))}),")
