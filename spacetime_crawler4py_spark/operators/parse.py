"""HTML page parsing — the engine's hot-path operator.

One DOM parse per page serves every downstream consumer (reference
parses once into a global soup, scraper.py:20,75-76, then feeds
link extraction + all four analytics from it):

- ``extract_text``   ≡ soup.get_text()            (scraper.py:78)
- ``stripped text``  ≡ soup.get_text(strip=True)  (scraper.py:175,198)
- ``links``          ≡ [a.get('href') for a in soup.find_all('a')]
                       (scraper.py:90-91), document order
- ``n_unique_anchors`` ≡ len({Tag equality over <a> elements})
                       (scraper.py:256-263 — bs4 Tag __eq__ is
                       name+attrs+contents equality)
- ``wc``             ≡ len(re.findall('[a-zA-Z0-9]+', stripped))
                       (scraper.py:175-177)
- ``tokens_report``  ≡ quirky P9 tokenizer over stripped text
                       (scraper.py:198-208)
- ``sections``       ≡ [(parent tag name, text node)] for the
                       indexer's tag-blacklist path
                       (indexerV1.py:210-224)

The parser is the stdlib ``html.parser`` (same underlying tokenizer
bs4's 'html.parser' tree builder wraps; bs4 itself is not available
in this environment).  The synthetic ``pages.text`` column is
DEFINED as ``extract_text(html)`` (FIXTURES.md §1), making
byte-identity a checkable invariant: tests re-extract and compare.

Execution model: ``mapInPandas`` over Arrow batches — one Python
worker call per ~10k-row batch, never per row.  At 100 TB this is
the only operator that must cross into Python; everything around it
(status/length gates, validity filters, dedup) stays JVM-side and
runs BEFORE this operator so the expensive parse sees only pages
that survive the cheap filters (UDFs are planning barriers —
Catalyst will not hoist a filter above mapInPandas, so the
composition order here is the plan).
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# Tags that never take content (HTML5 void elements) — not pushed on
# the open-tag stack so text after them attributes to the right parent.
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _PageParser(HTMLParser):
    """Single-pass extractor: text segments + anchors + parent tags."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.segments: list[tuple[str, str]] = []  # (parent_tag, data)
        self.links: list[str | None] = []
        self.anchors: list[tuple] = []  # (href, inner_text, attrs) per <a>
        self._stack: list[str] = []
        self._anchor_depth = 0
        self._anchor_text: list[str] = []
        self._anchor_attrs: tuple = ()
        self._anchor_href: str | None = None

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag in _VOID:
            return
        self._stack.append(tag)
        if tag == "a":
            self._anchor_depth += 1
            if self._anchor_depth == 1:
                href = dict(attrs).get("href")
                self.links.append(href)
                self._anchor_href = href
                self._anchor_attrs = tuple(sorted(attrs))
                self._anchor_text = []

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID:
            return
        # pop to the matching open tag (tolerates misnesting)
        if tag in self._stack:
            while self._stack:
                t = self._stack.pop()
                if t == "a" and self._anchor_depth > 0:
                    self._anchor_depth -= 1
                    if self._anchor_depth == 0:
                        self.anchors.append(
                            (
                                self._anchor_href,
                                "".join(self._anchor_text),
                                self._anchor_attrs,
                            )
                        )
                if t == tag:
                    break

    def handle_data(self, data: str) -> None:
        parent = self._stack[-1] if self._stack else "[document]"
        self.segments.append((parent, data))
        if self._anchor_depth > 0:
            self._anchor_text.append(data)

    def close(self) -> None:  # flush any unclosed <a>
        super().close()
        if self._anchor_depth > 0:
            self.anchors.append(
                (self._anchor_href, "".join(self._anchor_text), self._anchor_attrs)
            )
            self._anchor_depth = 0


def parse_html(html: bytes | str) -> _PageParser:
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _PageParser()
    p.feed(html)
    p.close()
    return p


def extract_text(html: bytes | str) -> str:
    """get_text() twin: all text nodes concatenated, entities decoded."""
    return "".join(d for _, d in parse_html(html).segments)


def extract_text_stripped(html: bytes | str) -> str:
    """get_text(strip=True) twin: each node stripped, empties dropped."""
    out = []
    for _, d in parse_html(html).segments:
        s = d.strip()
        if s:
            out.append(s)
    return "".join(out)


PAGE_FEATURES_FIELDS = [
    StructField("text", StringType()),
    StructField("text_len", IntegerType()),
    StructField("links", ArrayType(StringType())),
    StructField("n_unique_anchors", IntegerType()),
    StructField("wc", IntegerType()),
    StructField("tokens_report", ArrayType(StringType())),
]

SECTIONS_FIELD = StructField(
    "sections",
    ArrayType(
        StructType(
            [StructField("tag", StringType()), StructField("text", StringType())]
        )
    ),
)


def _features_of(html: bytes | str | None, with_sections: bool) -> dict:
    from spacetime_crawler4py_spark.functions.tokenizers import (
        py_tokenize_alnum,
        py_tokenize_report,
    )

    if html is None:
        d = {
            "text": None,
            "text_len": None,
            "links": None,
            "n_unique_anchors": None,
            "wc": None,
            "tokens_report": None,
        }
        if with_sections:
            d["sections"] = None
        return d
    p = parse_html(html)
    text = "".join(d for _, d in p.segments)
    stripped_parts = [s for _, d in p.segments if (s := d.strip())]
    stripped = "".join(stripped_parts)
    d = {
        "text": text,
        "text_len": len(text),
        "links": [l for l in p.links if l is not None],
        "n_unique_anchors": len(set(p.anchors)),
        "wc": len(py_tokenize_alnum(stripped)),
        "tokens_report": py_tokenize_report(stripped),
    }
    if with_sections:
        d["sections"] = [(t, s) for t, s in p.segments]
    return d


def parse_pages(
    df: DataFrame,
    html_col: str = "html",
    keep_html: bool = False,
    with_sections: bool = False,
) -> DataFrame:
    """Add page-feature columns with ONE DOM parse per page.

    Arrow-batched mapInPandas; all input columns pass through
    (``html`` dropped by default — it is dead weight downstream and
    at 100 TB the dominant I/O cost).
    """
    new_fields = list(PAGE_FEATURES_FIELDS) + (
        [SECTIONS_FIELD] if with_sections else []
    )
    feat_set = {f.name for f in new_fields}
    in_fields = [
        f
        for f in df.schema.fields
        if (keep_html or f.name != html_col) and f.name not in feat_set
    ]
    out_schema = StructType(in_fields + new_fields)
    out_names = [f.name for f in in_fields]
    feat_names = [f.name for f in new_fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_features_of(h, with_sections) for h in pdf[html_col]]
            out = pdf[[c for c in out_names]].copy()
            for name in feat_names:
                out[name] = [f[name] for f in feats]
            yield out

    return df.mapInPandas(gen, out_schema)


ANCHORS_FIELD = StructField(
    "anchors",
    ArrayType(
        StructType(
            [StructField("href", StringType()), StructField("text", StringType())]
        )
    ),
)


def extract_anchors(df: DataFrame, html_col: str = "html", keep_html: bool = False) -> DataFrame:
    """Add an ``anchors`` column: per-page ``[(href, anchor_text)]``
    in document order, from ONE DOM parse per page (the same
    single-pass ``_PageParser`` the crawl pipeline uses — nested
    inline tags inside ``<a>`` contribute their text, anchors left
    unclosed at EOF are flushed, hrefless ``<a>`` yields null href;
    reference parity: scraper.py's link walk, which this engine
    extends with the inner text the reference discards).

    Anchor text is the classic web-scale training-data signal
    (target-side anchor aggregation — "anchor text as queries");
    the downstream shape is ``explode(anchors)`` then a groupBy on
    the normalized target, which shuffles (href, short-text) pairs
    only, never the page.

    Arrow-batched mapInPandas, html dropped by default (dead weight
    downstream, the dominant I/O cost at 100 TB).
    """
    in_fields = [
        f
        for f in df.schema.fields
        if (keep_html or f.name != html_col) and f.name != "anchors"
    ]
    out_schema = StructType(in_fields + [ANCHORS_FIELD])
    out_names = [f.name for f in in_fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            anchors = []
            for h in pdf[html_col]:
                if h is None:
                    anchors.append(None)
                    continue
                p = parse_html(h)
                anchors.append([(href, txt) for href, txt, _ in p.anchors])
            out = pdf[[c for c in out_names]].copy()
            out["anchors"] = anchors
            yield out

    return df.mapInPandas(gen, out_schema)
