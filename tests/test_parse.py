"""Parse operator: text extraction invariant, links, anchors, features."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spacetime_crawler4py_spark.datagen.pages import generate_corpus, write_corpus
from spacetime_crawler4py_spark.operators.parse import (
    extract_text,
    extract_text_stripped,
    parse_html,
    parse_pages,
)

HTML = b"""<html><head><title>T</title><style>b{x:1}</style></head>
<body><script>var z=2;</script><h1>Head &amp; Tail</h1>
<p>one two</p>
<a href="https://x.ics.uci.edu/a">A1</a>
<a href="https://x.ics.uci.edu/a">A1</a>
<a href="https://x.ics.uci.edu/b" class="c">B</a>
<a>no href</a>
<img src="i.png"><br>
<p>after void</p>
</body></html>"""


def test_extract_text_includes_all_text_nodes():
    t = extract_text(HTML)
    assert "Head & Tail" in t          # entity decoded
    assert "one two" in t
    assert "var z=2;" in t             # script text included (bs4 get_text parity)
    assert "b{x:1}" in t               # style text included
    assert "after void" in t


def test_stripped_concatenates_nonempty():
    s = extract_text_stripped(HTML)
    assert "\n" not in s.split("Head")[0]  # whitespace-only nodes dropped
    assert "Head & Tail" in s


def test_links_document_order_nulls_dropped_in_features():
    p = parse_html(HTML)
    assert p.links == [
        "https://x.ics.uci.edu/a",
        "https://x.ics.uci.edu/a",
        "https://x.ics.uci.edu/b",
        None,
    ]


def test_unique_anchors_tag_equality():
    p = parse_html(HTML)
    # 4 <a> tags; the two identical A1 anchors collapse → 3 unique
    assert len(set(p.anchors)) == 3


def test_parse_pages_dataframe(spark, tmp_path):
    tables = write_corpus(spark, str(tmp_path), n_pages=60, seed=42)
    pages = tables["pages"]
    feats = parse_pages(pages)
    rows = feats.select("url", "text", "text_len", "links", "wc").collect()
    assert len(rows) == 60
    by_url = {r["url"]: r for r in rows}

    # invariant: the stored text column == re-extracted text (byte-identical)
    orig = {r["url"]: r["text"] for r in pages.select("url", "text").collect()}
    for u, r in by_url.items():
        assert r["text"] == orig[u], f"text invariant broken for {u}"
        assert r["text_len"] == len(orig[u])
        assert r["links"], u  # every generated page links out


def test_corpus_determinism():
    a = generate_corpus(n_pages=40, seed=42)
    b = generate_corpus(n_pages=40, seed=42)
    assert a["pages"] == b["pages"]
    assert a["fetch_status"] == b["fetch_status"]
    c = generate_corpus(n_pages=40, seed=7)
    assert c["pages"] != a["pages"]


def test_corpus_structure():
    corpus = generate_corpus(n_pages=120, seed=42)
    urls = [r[0] for r in corpus["pages"]]
    assert len(urls) == len(set(urls)) == 120
    texts = {r[0]: r[3] for r in corpus["pages"]}
    lens = sorted(len(t) for t in texts.values())
    assert lens[0] < 500, "need a page under the 500-char gate"
    assert lens[-1] > 100_000, "need a page over the 100k gate"
    # hot host skew ≈ 35%
    hot = sum(1 for u in urls if "ngs.ics.uci.edu" in u)
    assert hot / len(urls) > 0.2
    # seeds present and first
    assert urls[:4] == [
        "https://www.ics.uci.edu",
        "https://www.cs.uci.edu",
        "https://www.informatics.uci.edu",
        "https://www.stat.uci.edu",
    ]


def test_extract_anchors_nested_unclosed_hrefless(spark):
    from spacetime_crawler4py_spark.operators.parse import extract_anchors

    html = (
        '<html><body>'
        '<a href="/x">plain</a>'
        '<a href="/y">ref <b>bold</b> tail</a>'
        "<a>no href here</a>"
        '<a href="/z">unclosed at eof'
        "</body></html>"
    )
    df = spark.createDataFrame(
        [(1, html), (2, None)], "doc_id long, html string"
    )
    rows = {r["doc_id"]: r["anchors"] for r in extract_anchors(df).collect()}
    assert rows[2] is None
    got = [(a["href"], a["text"]) for a in rows[1]]
    assert got == [
        ("/x", "plain"),
        ("/y", "ref bold tail"),  # nested <b> text folded in
        (None, "no href here"),  # hrefless anchor kept, href null
        ("/z", "unclosed at eof"),  # flushed by the </body> pop
    ]
    # html column dropped by default
    assert "html" not in extract_anchors(df).columns
