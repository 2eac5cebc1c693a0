"""robots.txt compliance (north_rule T6), F9 resume revalidation,
F13 source-hygiene assert, index sink formats."""

from __future__ import annotations

from pyspark.sql import functions as F

from spacetime_crawler4py_spark.frontier.robots import (
    ROBOTS_SCHEMA,
    filter_allowed,
    with_host_delay,
)


def _robots_df(spark):
    return spark.createDataFrame(
        [
            ("ngs.ics.uci.edu", ["/pub", "/private"], 250),
            ("www.cs.uci.edu", [], 1000),
        ],
        ROBOTS_SCHEMA,
    )


def test_filter_allowed(spark):
    urls = spark.createDataFrame(
        [
            ("https://ngs.ics.uci.edu/pub12/x",),     # disallowed (prefix /pub)
            ("https://ngs.ics.uci.edu/research1",),   # allowed
            ("https://www.cs.uci.edu/pub99",),        # allowed (no prefixes)
            ("https://other.ics.uci.edu/pub1",),      # allowed (host absent)
        ],
        "url string",
    )
    kept = {r["url"] for r in filter_allowed(urls, _robots_df(spark)).collect()}
    assert kept == {
        "https://ngs.ics.uci.edu/research1",
        "https://www.cs.uci.edu/pub99",
        "https://other.ics.uci.edu/pub1",
    }


def test_with_host_delay(spark):
    pending = spark.createDataFrame(
        [("ngs.ics.uci.edu",), ("unknown.host",)], "host string"
    )
    rows = {
        r["host"]: r["crawl_delay_ms"]
        for r in with_host_delay(pending, _robots_df(spark)).collect()
    }
    assert rows["ngs.ics.uci.edu"] == 250
    assert rows["unknown.host"] == 500


def test_robots_in_crawl(spark, corpus80, tmp_path):
    """A crawl with robots rules never fetches disallowed URLs, and
    the disallowed pending rows simply never schedule."""
    from spacetime_crawler4py_spark.crawl.loop import CrawlEngine
    from spacetime_crawler4py_spark.datagen.pages import SEED_URLS

    corpus_dir, _ = corpus80
    robots = _robots_df(spark)
    robots.write.mode("overwrite").parquet(str(tmp_path / "robots.parquet"))
    eng = CrawlEngine(
        spark,
        state_dir=str(tmp_path / "state"),
        pages_path=f"{corpus_dir}/pages.parquet",
        status_path=f"{corpus_dir}/fetch_status.parquet",
        seeds=SEED_URLS,
        robots_path=str(tmp_path / "robots.parquet"),
    )
    eng.run()
    fetched = eng.crawl_order()
    assert fetched, "crawl fetched nothing"
    assert not any(u.startswith("https://ngs.ics.uci.edu/pub") for u in fetched)


def test_f13_source_hygiene():
    """F13 (crawler/worker.py:16-17): the fetch path must not import
    an HTTP client — fetching is a JOIN against the page store."""
    import importlib, sys

    for mod in (
        "spacetime_crawler4py_spark.crawl.loop",
        "spacetime_crawler4py_spark.operators.parse",
        "spacetime_crawler4py_spark.frontier.scheduler",
    ):
        m = importlib.import_module(mod)
        src = open(m.__file__).read()
        assert "import requests" not in src
        assert "urllib.request" not in src


def test_index_text_sinks(spark, tmp_path):
    from spacetime_crawler4py_spark.indexing import postings as P
    from spacetime_crawler4py_spark.indexing.sinks import (
        write_doc_index,
        write_text_index,
        write_tfidf_file,
    )

    docs = spark.createDataFrame(
        [(0, "https://a.ics.uci.edu/x", "machine learning rocks"),
         (1, "https://b.ics.uci.edu/y", "learning systems")],
        "doc_id long, url string, text string",
    )
    posts = P.build_postings(docs)
    write_text_index(P.grouped_index(posts), str(tmp_path))
    idx = (tmp_path / "mergeIndexFile.txt").read_text().splitlines()
    offs = dict(
        l.rsplit(":", 1) for l in (tmp_path / "mergeIndexIndexFile.txt").read_text().splitlines()
    )
    # format: "token doc,pos,tag|..." sorted by token; offsets seek-able
    assert idx == sorted(idx)
    full = (tmp_path / "mergeIndexFile.txt").read_text()
    for tok, off in offs.items():
        assert full[int(off):].startswith(tok + " ")

    write_doc_index(docs, str(tmp_path))
    lines = (tmp_path / "docIndexFile.txt").read_text().splitlines()
    assert lines[0].startswith("0;") and lines[0].endswith("https://a.ics.uci.edu/x")

    write_tfidf_file(P.tfidf(posts, doc_count=2), str(tmp_path))
    t = (tmp_path / "tfidfFile.txt").read_text()
    assert "learn " in t


ROBOTS_FIXTURES = {
    "a.ics.uci.edu": (
        "# comment\n"
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Disallow: /tmp\n"
        "Crawl-delay: 2\n"
    ),
    "b.ics.uci.edu": (
        "User-agent: googlebot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: spacetime-crawler\n"
        "Disallow: /secret/\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /everything/\n"
    ),
    "c.ics.uci.edu": "User-agent: *\nDisallow:\n",  # allow-all
    "d.ics.uci.edu": "",                            # empty file
    "e.ics.uci.edu": "User-agent: *\nDisallow: /\n",
}
PATHS = ["/", "/private/x", "/tmp2", "/tmp/x", "/secret/a", "/everything/b", "/ok"]


def test_parse_robots_vs_stdlib_robotparser():
    """py_parse_robots prefix decisions == urllib.robotparser
    can_fetch on Disallow-only fixtures (the stdlib parser is the
    independent oracle), incl. agent-group selection."""
    import urllib.robotparser

    from spacetime_crawler4py_spark.frontier.robots import py_parse_robots

    for host, txt in ROBOTS_FIXTURES.items():
        prefixes, delay = py_parse_robots(txt, "spacetime-crawler")
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(txt.splitlines())
        for p in PATHS:
            ours = not any(p.startswith(pre) for pre in prefixes)
            theirs = rp.can_fetch("spacetime-crawler", f"https://{host}{p}")
            assert ours == theirs, (host, p, prefixes)
    # crawl-delay surfaced in ms
    assert py_parse_robots(ROBOTS_FIXTURES["a.ics.uci.edu"])[1] == 2000
    # specific group beats * (googlebot sees its own total ban)
    g, _ = py_parse_robots(ROBOTS_FIXTURES["b.ics.uci.edu"], "googlebot")
    assert g == ["/"]


def test_parse_robots_table_and_enforcement(spark):
    """raw (host, robots_txt) → ROBOTS_SCHEMA table → filter_allowed
    end-to-end, distributed."""
    from spacetime_crawler4py_spark.frontier.robots import (
        filter_allowed,
        parse_robots_table,
    )

    raw = spark.createDataFrame(
        list(ROBOTS_FIXTURES.items()), ["host", "robots_txt"]
    )
    table = parse_robots_table(raw, "spacetime-crawler")
    got = {r["host"]: r for r in table.collect()}
    assert got["a.ics.uci.edu"]["disallow_prefixes"] == ["/private/", "/tmp"]
    assert got["a.ics.uci.edu"]["crawl_delay_ms"] == 2000
    assert got["b.ics.uci.edu"]["disallow_prefixes"] == ["/secret/"]
    assert got["c.ics.uci.edu"]["disallow_prefixes"] == []

    urls = spark.createDataFrame(
        [(f"https://{h}{p}",) for h in ROBOTS_FIXTURES for p in PATHS],
        ["url"],
    )
    kept = {r["url"] for r in filter_allowed(urls, table).collect()}
    assert "https://a.ics.uci.edu/private/x" not in kept
    assert "https://a.ics.uci.edu/tmp/x" not in kept
    assert "https://a.ics.uci.edu/tmp2" not in kept  # prefix, not dir
    assert "https://a.ics.uci.edu/ok" in kept
    assert "https://b.ics.uci.edu/secret/a" not in kept
    assert "https://b.ics.uci.edu/everything/b" in kept  # our group won
    assert all(f"https://c.ics.uci.edu{p}" in kept for p in PATHS)
    assert all(f"https://e.ics.uci.edu{p}" not in kept for p in PATHS)
