#!/usr/bin/env python3
"""Independent reference implementation of graft.operators.Sampling.hash16,
used to generate the literal expected VALUES in SparkEntry's `sample_pinned`
oracle. Deliberately NOT generated from the Scala or SQL renderings: this
file is the third, hand-maintained statement of the intended arithmetic, so
a bug introduced in one rendering fails the pinned oracle instead of being
echoed by a dual-rendered one.

Usage: python3 tools/hash16_reference.py   # prints the VALUES rows
"""

M32 = 2 ** 32
BUCKETS = 65536
MULT = 40503  # 16-bit golden-ratio (Fibonacci) multiplier


def seed_mult(seed: int) -> int:
    """Seed-derived ODD multiplier (< 2^17) so the seed interacts
    multiplicatively with the id — an additive seed only shifts the hash."""
    return MULT + 2 * ((seed * MULT + 14029) % 32768)


def hash16(i: int, seed: int = 0) -> int:
    """Three multiply-fold rounds over 32-bit state; every round folds the
    high half back in, so no output bit is affine in the id."""
    assert i >= 0 and seed >= 0
    a = ((i % M32) * seed_mult(seed) + (i >> 32) + 14029 + seed) % M32
    b = ((a % BUCKETS) * MULT + (a >> 16)) % M32
    return ((b % BUCKETS) * MULT + (b >> 16)) % BUCKETS


def assign_split(i: int, splits, seed: int = 0) -> str:
    h = hash16(i, seed)
    acc = 0
    for name, frac in splits[:-1]:
        acc += round(frac * BUCKETS)
        if h < acc:
            return name
    return splits[-1][0]


if __name__ == "__main__":
    rows = []
    for i in range(64):
        split = assign_split(
            i, [("train", 0.8), ("val", 0.1), ("test", 0.1)], seed=7)
        sampled = "TRUE" if hash16(i, 3) < round(0.2 * BUCKETS) else "FALSE"
        key = hash16(i, 5)
        rows.append(f"  ({i}, '{split}', {sampled}, {key}, {key % 8})")
    print(",\n".join(rows))
