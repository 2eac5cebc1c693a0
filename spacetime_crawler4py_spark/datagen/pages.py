"""Deterministic synthetic page-graph generator (FIXTURES.md §1-3).

Produces the three input tables the crawl engine consumes:

- ``pages(url, warc_ts, html, text, lang)``  — canonical URLs
  (normalized, defragged); ``text`` is DEFINED as
  ``operators.parse.extract_text(html)`` (the byte-identity
  invariant per BASELINE.json input_hint).
- ``fetch_status(url, status, error)`` — reference status mix
  (Logs/Worker.log tally: 200 88%, then 403/404/601/500/...).
- ``seeds(url, ord)`` — config.ini:10 order.

Graph properties (each exercises a reference behavior — FIXTURES.md):
seed-reachable component; cycles; fragment / trailing-slash /
http-twin link variants; blacklisted-extension, off-domain and
mailto links; pages under the 500-char and over the 100k-char text
gates; one unambiguous word-count argmax page; one simhash near-dup
pair; a hot host holding ~35% of pages (BASELINE.md host-skew row).

Everything is driven by ``random.Random(seed)`` — same seed, same
bytes, no external data.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SEED_URLS = [
    "https://www.ics.uci.edu",
    "https://www.cs.uci.edu",
    "https://www.informatics.uci.edu",
    "https://www.stat.uci.edu",
]

HOSTS = [
    ("www.ics.uci.edu", 8),
    ("ngs.ics.uci.edu", 35),  # the hot host (33.9% in the reference run)
    ("vision.ics.uci.edu", 10),
    ("mlphysics.ics.uci.edu", 7),
    ("www.cs.uci.edu", 12),
    ("cml.ics.uci.edu", 8),
    ("www.informatics.uci.edu", 10),
    ("www.stat.uci.edu", 10),
]

_VOCAB = (
    "research data spark frontier crawl index query engine student "
    "faculty course machine learning systems theory network security "
    "graphics vision language statistics computing informatics "
    "algorithm distributed parallel storage memory compiler database"
).split()

_STATUS_MIX = [(200, 880), (403, 75), (404, 26), (601, 15), (500, 2), (608, 1), (607, 1)]


def _words(rng: random.Random, n: int, capitalized: bool = False) -> str:
    ws = [rng.choice(_VOCAB) for _ in range(n)]
    if capitalized:
        ws = [w.capitalize() for w in ws]
    return " ".join(ws)


def _page_html(rng: random.Random, title: str, links: list[str], n_words: int) -> str:
    paras = []
    remaining = n_words
    while remaining > 0:
        k = min(remaining, rng.randint(20, 60))
        paras.append(f"<p>{_words(rng, k, capitalized=True)}</p>")
        remaining -= k
    link_html = "\n".join(
        f'<a href="{u}">{_words(rng, 2, capitalized=True)}</a>' for u in links
    )
    # a duplicated anchor pair (same href, text, attrs) exercises the
    # unique-anchor set semantics (scraper.py:256-263)
    dup = (
        f'<a href="{links[0]}" class="dup">DupLink</a>'
        f'<a href="{links[0]}" class="dup">DupLink</a>'
        if links
        else ""
    )
    return (
        "<html><head><title>"
        + title
        + "</title><style>body { color: black; }</style></head>\n<body>"
        + f"<script>var x = 1;</script>\n<h1>{title}</h1>\n"
        + "\n".join(paras)
        + "\n<nav>"
        + link_html
        + dup
        + "</nav>\n</body></html>"
    )


def generate_corpus(n_pages: int = 300, seed: int = 42) -> dict[str, list]:
    """Build the corpus driver-side as plain rows (deterministic)."""
    rng = random.Random(seed)

    # -- URL universe: canonical (normalized, defragged) page URLs
    weights = [w for _, w in HOSTS]
    urls: list[str] = list(SEED_URLS)
    while len(urls) < n_pages:
        host = rng.choices([h for h, _ in HOSTS], weights=weights)[0]
        depth = rng.randint(1, 3)
        path = "/".join(
            rng.choice(["research", "people", "courses", "news", "pub", "grad"])
            + str(rng.randint(0, 99))
            for _ in range(depth)
        )
        u = f"https://{host}/{path}"
        if u not in urls:
            urls.append(u)
    url_set = set(urls)
    idx = {u: i for i, u in enumerate(urls)}

    # -- special pages
    argmax_url = urls[len(urls) // 2]          # the word-count winner
    tiny_urls = set(rng.sample(urls[4:], max(2, n_pages // 30)))
    tiny_urls.discard(argmax_url)
    huge_url = next(u for u in urls[4:] if u not in tiny_urls and u != argmax_url)
    neardup_a = next(
        u for u in urls[5:] if u not in tiny_urls and u not in (argmax_url, huge_url)
    )
    neardup_b = next(
        u
        for u in urls[6:]
        if u not in tiny_urls and u not in (argmax_url, huge_url, neardup_a)
    )

    # -- adjacency: ring links guarantee seed-reachability; extras add
    # cycles; decorations exercise filters/dedup.
    pages_rows = []
    status_rows = []
    t0 = dt.datetime(2024, 1, 1)
    for i, u in enumerate(urls):
        prng = random.Random(f"{seed}-{i}")
        targets = [urls[(i + k) % len(urls)] for k in (1, 2, 3)]
        targets += prng.sample(urls, min(4, len(urls)))
        # decorations (order is deterministic):
        deco = []
        deco.append(targets[0] + "#section" + str(prng.randint(1, 3)))  # fragment twin
        deco.append(targets[1] + "/")                                   # trailing slash
        deco.append("http://" + targets[2][len("https://"):])           # scheme twin
        deco.append("https://example.com/offsite" + str(i % 7))          # off-domain
        deco.append("mailto:someone@ics.uci.edu")                        # non-http
        deco.append(f"https://www.ics.uci.edu/files/report{i % 5}.pdf")  # blacklisted ext
        # trailing-slash blacklisted-ext twin: VALID raw (the '$'-anchored
        # extension regex misses 'pdf/'), crawled by the reference —
        # pins the validate-raw-then-normalize order (scraper.py:44)
        deco.append(f"https://www.ics.uci.edu/files/report{i % 5}.pdf/")
        if i % 11 == 0:
            deco.append("https://ics.uci.edu/apex")                      # apex (invalid)
        links = targets + deco

        if u == argmax_url:
            n_words = 4000
        elif u in tiny_urls:
            n_words = 10          # < 500 chars of text → F7 gate
        elif u == huge_url:
            n_words = 18000       # > 100,000 chars of text → F7 gate
        else:
            n_words = prng.randint(150, 600)

        title = f"Page {i} " + _words(prng, 3, capitalized=True)
        if u == neardup_a or u == neardup_b:
            # near-identical long bodies: same seeded words, one-word tail diff
            nd = random.Random(f"{seed}-neardup")
            body = _words(nd, 800, capitalized=True)
            tail = " Alpha" if u == neardup_a else " Alphb"
            html = (
                f"<html><head><title>{title}</title></head><body><p>"
                + body
                + tail
                + "</p>"
                + "".join(f'<a href="{t}">Link</a>' for t in targets[:3])
                + "</body></html>"
            )
        else:
            html = _page_html(prng, title, links, n_words)

        from spacetime_crawler4py_spark.operators.parse import extract_text

        text = extract_text(html)
        ts = t0 + dt.timedelta(seconds=i * 13)
        pages_rows.append((u, ts, html.encode("utf-8"), text, "en"))

        status = prng.choices(
            [s for s, _ in _STATUS_MIX], weights=[w for _, w in _STATUS_MIX]
        )[0]
        if u in SEED_URLS or u in (argmax_url, huge_url, neardup_a, neardup_b):
            status = 200  # keep the structurally-important pages fetchable
        status_rows.append((u, status, None if status < 600 else f"CACHE_{status}"))

    seeds_rows = [(u, i) for i, u in enumerate(SEED_URLS)]
    return {"pages": pages_rows, "fetch_status": status_rows, "seeds": seeds_rows}


PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

STATUS_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("status", IntegerType()),
        StructField("error", StringType()),
    ]
)

SEEDS_SCHEMA = StructType(
    [StructField("url", StringType()), StructField("ord", IntegerType())]
)


def write_corpus(
    spark: SparkSession, out_dir: str, n_pages: int = 300, seed: int = 42
) -> dict[str, DataFrame]:
    """Materialize the corpus as parquet under out_dir.

    At bench scale the pages table is repartitioned so downstream
    scans parallelize; at 100 TB the real table would be written
    bucketed by host for politeness-locality (see frontier.scheduler).
    """
    corpus = generate_corpus(n_pages=n_pages, seed=seed)
    out = {}
    for name, schema in (
        ("pages", PAGES_SCHEMA),
        ("fetch_status", STATUS_SCHEMA),
        ("seeds", SEEDS_SCHEMA),
    ):
        df = spark.createDataFrame(corpus[name], schema)
        if name == "pages":
            df = df.repartition(max(4, n_pages // 2000))
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        out[name] = spark.read.parquet(f"{out_dir}/{name}.parquet")
    return out
