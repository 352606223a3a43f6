#!/usr/bin/env python3
"""Independent reference implementation of the HTML -> text extraction
specified in graft.functions.HtmlOps (structural cleanup + link-density
boilerplate pruning), used to generate the literal expected VALUES in
SparkEntry's `html_pinned` oracle.

Deliberately NOT generated from the Scala or the DuckDB renderings — a
third, hand-maintained statement of the semantics (Python `re`), so a bug
in one rendering fails the pinned oracle instead of being echoed by the
dual-rendered ones.

Usage: python3 tools/html_reference.py   # prints the VALUES rows
"""
import re

BLOCK = r"p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|thead|tbody|section|article|header|footer|blockquote|nav|pre|form"
MAX_LINK_DENSITY = 0.5


def pre_clean(h):
    h = re.sub(r"<!--.*?-->", " ", h, flags=re.S)
    for t in ("script", "style", "noscript", "template"):
        h = re.sub(rf"<{t}[^>]*>.*?</{t}>", " ", h, flags=re.S | re.I)
    return re.sub(rf"</?(?:{BLOCK})[^>]*>", "\n", h, flags=re.I)


def strip_inline(b):
    b = re.sub(r"<[^>]*>", " ", b)
    for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&nbsp;", " ")]:
        b = b.replace(ent, ch)
    b = b.replace("&amp;", "&")  # amp LAST, matching the Scala/SQL order
    return re.sub(r"[ \t\r]+", " ", b).strip()


def toks(t):
    return [x for x in t.split(" ") if x]


def link_tokens(b):
    return sum(len(toks(strip_inline(a)))
               for a in re.findall(r"<a[^>]*>(.*?)</a>", b, flags=re.S | re.I))


def extract(h, main=False):
    out = []
    for b in pre_clean(h).split("\n"):
        t = strip_inline(b)
        if not t:
            continue
        if main and link_tokens(b) > MAX_LINK_DENSITY * len(toks(t)):
            continue
        out.append(t)
    return "\n".join(out)


FIXTURES = [
    (1, "<p>keep</p><script>if (a<b) { x(); }</script>"
        "<style>p>em{}</style><!-- <p>gone</p> --><p>also</p>"),
    (2, "<div>one <b>bold</b> word</div><p>two</p>three<br>four"),
    (3, "<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39; &amp;lt; &copy;</p>"),
    (4, "<p>  a   b\t c </p><p>   </p><p>d</p>"),
    (5, "<p>real prose with <a href='/'>one link</a> in seven words</p>"
        "<div><a href='/'>Home</a> <a href='/a'>About</a>"
        " <a href='/b'>More</a></div><p>plain text</p>"),
    (6, "<div><a href='/'><em>big</em> deal</a></div><p>tail text here</p>"),
]


def sql_str(s):
    parts = s.split("\n")
    lits = ["'" + p.replace("'", "''") + "'" for p in parts]
    return " || chr(10) || ".join(lits) if len(lits) > 1 else lits[0]


if __name__ == "__main__":
    for cid, h in FIXTURES:
        print(f"  ({cid}, {sql_str(extract(h))}, {sql_str(extract(h, main=True))}),")
