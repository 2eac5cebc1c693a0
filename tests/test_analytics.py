"""Report analytics A1-A4 vs the oracle crawler's accumulators."""

from __future__ import annotations

from pyspark.sql import functions as F

from spacetime_crawler4py_spark.analytics import report as R


def test_unique_pages_matches_oracle(engine80, oracle80):
    crawled = engine80.crawled_pages()
    got = {r["url_defrag"] for r in R.unique_pages(crawled).collect()}
    assert got == oracle80.unique_pages
    assert R.unique_page_count(crawled) == len(oracle80.unique_pages)


def test_longest_page_matches_oracle(engine80, oracle80):
    crawled = engine80.crawled_pages()
    row = R.longest_page(crawled).collect()[0]
    [(url, wc)] = oracle80.longest_page.items()
    assert row["url_defrag"] == url
    assert row["wc"] == wc


def test_common_words_match_oracle(engine80, oracle80):
    crawled = engine80.crawled_pages()
    got = {r["word"]: r["count"] for r in R.common_words(crawled).collect()}
    assert got == oracle80.common_words
    # top-50 under deterministic (count desc, word asc) on both sides
    top = [(r["word"], r["count"]) for r in R.top_50_words(crawled).collect()]
    expect = sorted(oracle80.common_words.items(), key=lambda x: (-x[1], x[0]))[:50]
    assert top == expect


def test_ics_subdomains_match_oracle(engine80, oracle80):
    crawled = engine80.crawled_pages()
    got = {r["url_defrag"]: r["n_links"] for r in R.ics_subdomains(crawled).collect()}
    assert got == oracle80.ics_subdomains


def test_report_files_golden_format(engine80, oracle80, tmp_path):
    R.write_report_files(engine80.crawled_pages(), str(tmp_path))
    up = (tmp_path / "uniquePages.txt").read_text()
    assert up.startswith(
        "The number of unique pages that have been found, solely based on "
        f"URL: {len(oracle80.unique_pages)}\n"
    )
    lp = (tmp_path / "longestPage.txt").read_text()
    [(url, wc)] = oracle80.longest_page.items()
    assert f"URL: {url} -> Word Count: {wc}" in lp
    top = (tmp_path / "top50CommonWords.txt").read_text()
    assert top.startswith("Top 50 Common Words: \n\n'")
    assert top.endswith("\nend")
    subs = (tmp_path / "icsSubDomains.txt").read_text().strip().splitlines()
    assert len(subs) == len(oracle80.ics_subdomains)
    urls = [l.split(", ")[0] for l in subs]
    assert urls == sorted(urls)


def test_answers_composite_file(engine80, oracle80, tmp_path):
    R.write_report_files(engine80.crawled_pages(), str(tmp_path))
    a = (tmp_path / "Answers to Questions.txt").read_text()
    assert f"Unique pages (defragmented URL): {len(oracle80.unique_pages)}" in a
    [(url, wc)] = oracle80.longest_page.items()
    assert f"{url} -> {wc} words" in a


def test_unique_pages_order_survives_multipartition(spark, tmp_path):
    """Regression: with AQE partition-coalescing OFF and real
    multi-partition output, uniquePages.txt must still be globally
    numbered 1..N in sorted-URL order (the _pid window used to
    hash-scramble the layout before the text write)."""
    conf = spark.conf
    old = conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        crawled = (
            spark.range(0, 3000)
            .select(
                F.concat(F.lit("https://www.ics.uci.edu/p"), F.col("id")).alias("url"),
                F.concat(F.lit("https://www.ics.uci.edu/p"), F.col("id")).alias(
                    "url_defrag"
                ),
                F.lit("word " * 120).alias("text"),
                F.lit(200).alias("status"),
                F.lit(120).alias("wc"),
                F.split(F.lit(("word " * 120).strip()), " ").alias("tokens_report"),
                F.lit(2).alias("n_unique_anchors"),
            )
            .repartition(8)
        )
        out = str(tmp_path / "rep")
        R.write_report_files(crawled, out)
        lines = [
            l
            for l in (tmp_path / "rep" / "uniquePages.txt").read_text().splitlines()
            if l and l[0].isdigit()
        ]
        assert len(lines) == 3000
        nums = [int(l.split(".")[0]) for l in lines]
        assert nums == list(range(1, 3001))
        urls = [l.split(". ", 1)[1] for l in lines]
        assert urls == sorted(urls)
    finally:
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", old)
