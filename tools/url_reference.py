#!/usr/bin/env python3
"""Independent reference implementation of the URL canonicalization rules
in graft.functions.UrlOps, used to generate (and re-check) the literal
expected VALUES in SparkEntry's `url_pinned` / `url_dedup_pinned` oracles.

Deliberately NOT generated from the Scala regexes — a third, hand-maintained
statement of the rule order (lowercase scheme+host, strip fragment, strip
default ports, strip tracking params + repair separators, strip one
trailing slash), so a mistake in the Spark regex chain fails the pinned
oracle instead of being silently baked into it.

Usage: python3 tools/url_reference.py   # prints case_id | canonical_url
"""
import re

CASES = [
    (1, "HTTPS://Example.COM/Path/?utm_source=x&q=1#frag"),
    (2, "http://site.org:80/a"),
    (3, "https://site.org:443/"),
    (4, "https://a.b/c?fbclid=123"),
    (5, "https://a.b/c?x=1&utm_medium=m&y=2"),
    (6, "HTTP://WWW.Ex.com:80/?utm_campaign=a"),
    (7, "https://a.b/path"),
    (8, "ftp://Host.Com/File"),
    (9, "no-scheme/relative/"),
]

SCHEME_HOST = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)")


def normalize(u):
    m = SCHEME_HOST.match(u)
    if m:
        u = m.group(1).lower() + u[m.end():]
    u = re.sub(r"#.*$", "", u)
    u = re.sub(r"^(http://[^/:?#]+):80(?=$|[/?#])", r"\1", u)
    u = re.sub(r"^(https://[^/:?#]+):443(?=$|[/?#])", r"\1", u)
    u = re.sub(r"([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*", r"\1", u)
    u = re.sub(r"\?&+", "?", u)
    u = re.sub(r"&&+", "&", u)
    u = re.sub(r"[?&]+$", "", u)
    u = re.sub(r"/$", "", u)
    return u


if __name__ == "__main__":
    for cid, url in CASES:
        print(f"{cid} | {normalize(url)}")
