#!/usr/bin/env python3
"""Reference generator for the text_nfkc oracle literals.

The Spark side normalizes with java.text.Normalizer NFKC; DuckDB has no
NFKC function, so the oracle states the expected output FROM CONSTRUCTION:
the suffix below (one representative per compatibility class) was run
through CPython's unicodedata.normalize('NFKC', ...) — an independent
implementation of UAX #15 — and the resulting literal is embedded in the
oracle SQL. Re-run this script to regenerate/verify the literal.
"""
import unicodedata

RAW = (" ﬁle ＦＵＬＬ ½ x² ㎞"
       " ℕ Ⅳ café no brk")
EXPECTED = ' file FULL 1⁄2 x2 km N IV café no brk'

out = unicodedata.normalize("NFKC", RAW)
assert out == EXPECTED, (repr(out), repr(EXPECTED))
print("raw      :", repr(RAW))
print("expected :", repr(EXPECTED))
print("OK: CPython NFKC matches the embedded literal")
