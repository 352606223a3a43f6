#!/usr/bin/env python3
"""Independent reference for the quantized power-iteration PCA intent pin
(`pca_pinned`): pure-Python implementation of the operator's CONTRACT —
fixed-order left-fold dots, per-row contributions quantized to integer
micro-units (floor((x*dot) * 2^20) as int), fixed-order norm fold — on the
pinned 5-point, 2-dim dataset. The printed loadings are pasted as literal
VALUES into the oracle, so a shared misunderstanding between the Spark and
DuckDB renderings of the same arithmetic cannot echo.

Run: python3 tools/pca_reference.py
"""
import math

PTS = [(3.0, 4.0), (6.0, 8.0), (-3.0, -4.0), (1.0, 0.0), (0.0, 1.0)]
SCALE = 1 << 20
ITERS = 3
DIM = 2


def main():
    v = [1.0 / math.sqrt(DIM)] * DIM
    for _ in range(ITERS):
        w = [0] * DIM
        for x in PTS:
            dot = 0.0
            for j in range(DIM):          # fixed-order left fold
                dot = dot + x[j] * v[j]
            for j in range(DIM):
                w[j] += math.floor((x[j] * dot) * SCALE)
        norm2 = 0.0
        for j in range(DIM):              # fixed-order fold of squares
            norm2 = norm2 + float(w[j]) * float(w[j])
        nrm = math.sqrt(norm2)
        v = [float(w[j]) / nrm for j in range(DIM)]
    for j, x in enumerate(v, start=1):
        print(f"dim {j}: {round(x, 6)}")


if __name__ == "__main__":
    main()
