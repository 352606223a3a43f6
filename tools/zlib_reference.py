#!/usr/bin/env python3
"""Independent reference for the compression-ratio quality signal
(`quality_compression`): compute zlib-compressed byte lengths with
CPython's zlib (canonical zlib, NOT the JVM Deflater under test) for the
pinned edge-case corpus, and print the literal rows the oracle SQL embeds.

The pinned corpus here MUST stay byte-identical to `SparkEntry`'s
CompressionCorpus — same strings, same order. Level 6 (zlib default),
zlib-wrapped stream (RFC 1950), matching DeflateLenExpr(level = 6,
nowrap = false).

Run: python3 tools/zlib_reference.py
"""
import zlib

CORPUS = [
    (1, "a" * 200),
    (2, "the quick brown fox jumps over the lazy dog. " * 10),
    (3, "k9G2mX7qLpZ4wN8vB1cR5tY0uJ6hD3fS"),
    (4, ""),
    (5, "héllo wörld — 你好世界 " * 8),
    (6, "x"),
    (7, '{"id": 1, "tags": ["a", "b"], "ok": true}\n' * 25),
]

if __name__ == "__main__":
    for case_id, text in CORPUS:
        raw = text.encode("utf-8")
        z = zlib.compress(raw, 6)
        print(f"({case_id}, {len(raw)}, {len(z)}),")
