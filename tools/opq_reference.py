#!/usr/bin/env python3
"""Independent reference for the seeded OPQ rotation
(`Opq.seededRotation`): pure-Python implementation of the generator's
CONTRACT — a 64-bit LCG (wrap = mask to 64 bits; draws = top 31 bits)
driving 192 Givens plane rotations with rational sine/cosine
(c = p/h, s = q/h, h = sqrt(p^2 + q^2), p,q integer draws in [1, 1000]),
applied to the identity in fixed ascending-column order. Every
floating-point step is a correctly-rounded IEEE-754 primitive in a fixed
order, so this must equal the Scala matrix BIT FOR BIT. The printed
sample entries and the xor-of-bits checksum are pasted as literals into
OpqSpec, so a shared misunderstanding between the two renderings of the
same arithmetic cannot echo.

Run: python3 tools/opq_reference.py
"""
import math
import struct

M64 = (1 << 64) - 1
D = 64
SEED = 7
N_ROT = 192


def seeded_rotation(d=D, seed=SEED, n_rot=N_ROT):
    state = seed & M64

    def nxt():
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) & M64
        return state >> 33

    r = [[1.0 if i == j else 0.0 for j in range(d)] for i in range(d)]
    for _ in range(n_rot):
        i = nxt() % d
        j = nxt() % d
        p = float(nxt() % 1000 + 1)
        q = float(nxt() % 1000 + 1)
        if i != j:
            h = math.sqrt(p * p + q * q)
            c = p / h
            s = q / h
            for t in range(d):
                a = r[i][t]
                b = r[j][t]
                r[i][t] = c * a - s * b
                r[j][t] = s * a + c * b
    return r


def bits(v):
    return struct.unpack("<Q", struct.pack("<d", v))[0]


def main():
    r = seeded_rotation()
    csum = 0
    for row in r:
        for v in row:
            csum ^= bits(v)
    # orthogonality drift check (not pasted; sanity only)
    worst = 0.0
    for i in range(D):
        for j in range(D):
            dot = sum(r[i][t] * r[j][t] for t in range(D))
            worst = max(worst, abs(dot - (1.0 if i == j else 0.0)))
    print(f"d={D} seed={SEED} nRot={N_ROT}")
    print(f"checksum_xor_bits=0x{csum:016x}")
    for (i, j) in [(0, 0), (1, 7), (17, 42), (32, 32), (47, 2), (63, 63)]:
        print(f"r[{i}][{j}]={r[i][j]!r}  bits=0x{bits(r[i][j]):016x}")
    print(f"max_orthogonality_drift={worst:.3e}")


if __name__ == "__main__":
    main()
