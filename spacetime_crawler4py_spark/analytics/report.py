"""The reference's four report analytics as Spark SQL aggregations.

Replaces the global-mutable-dict + rewrite-a-file-per-page pattern
(scraper.py:149-272, an O(n²) sink) with idempotent aggregations
over the ``crawled_pages`` table the crawl loop materializes.
Gating parity: crawled_pages only contains pages that produced
links with content present — exactly the rows whose analytics the
reference ran (scraper.py:27-44).

All four are pure built-in aggregations (hash-agg with partial
map-side combine; top-k plans as TakeOrderedAndProject):

- A1 unique pages      COUNT(DISTINCT url_defrag)   (scraper.py:149-165)
- A2 longest page      max_by(url_defrag, wc)       (scraper.py:169-190,
                       intent semantics — the verbatim update loop is
                       dead code, SURVEY §2.5 A2)
- A3 top-50 words      explode → stopword filter → count → top-k
                       (scraper.py:193-234; quirky P9 tokens already
                       materialized by the parse UDF)
- A4 ics subdomains    filter ics → SUM(n_unique_anchors) per defrag
                       URL (scraper.py:238-272; the += on re-crawl
                       makes it a plain SUM over crawl events)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spacetime_crawler4py_spark.functions.stopwords import STOPWORDS

_ICS_RE = r".*(\.ics\.uci\.edu).*"  # scraper.py:241 (on the full URL)


def unique_pages(crawled: DataFrame) -> DataFrame:
    """A1: distinct defragmented URLs."""
    return crawled.select("url_defrag").distinct()


def unique_page_count(crawled: DataFrame) -> int:
    return unique_pages(crawled).count()


def longest_page(crawled: DataFrame) -> DataFrame:
    """A2: argmax page by word count (ties → lexicographically first
    URL, a deterministic contract; the reference's tie behavior is
    first-crawled-wins and ties cannot occur in the golden corpus)."""
    dedup = crawled.groupBy("url_defrag").agg(F.max("wc").alias("wc"))
    return dedup.orderBy(F.desc("wc"), F.asc("url_defrag")).limit(1)


def common_words(crawled: DataFrame) -> DataFrame:
    """A3 word frequencies: explode P9 tokens, case-insensitive
    stopword test on case-sensitive keys (scraper.py:212-217)."""
    stop = F.array([F.lit(s) for s in STOPWORDS])
    return (
        crawled.select(F.explode("tokens_report").alias("word"))
        .where(~F.array_contains(stop, F.lower(F.col("word"))))
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def top_50_words(crawled: DataFrame) -> DataFrame:
    """A3 top-k: count desc, word asc tie-break → TakeOrderedAndProject."""
    return common_words(crawled).orderBy(F.desc("count"), F.asc("word")).limit(50)


def ics_subdomains(crawled: DataFrame) -> DataFrame:
    """A4: per-ics-URL unique-anchor counts, += on re-crawl ≡ SUM."""
    return (
        crawled.where(F.col("url").rlike(_ICS_RE))
        .groupBy("url_defrag")
        .agg(F.sum("n_unique_anchors").alias("n_links"))
        .orderBy("url_defrag")
    )


# ---------------------------------------------------------------- sinks


def _stream_text_parts(lines: DataFrame, out_path: str, header: str = "") -> None:
    """Golden-format text sink, distributed: rows are formatted and
    globally ordered by Spark (range-partitioned part files), then the
    driver streams the parts together BYTE-wise in filename order —
    O(#files) driver memory, never O(rows).  The 10^10-page twin of
    ``for row in collect(): f.write(...)``.
    """
    import glob
    import os
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="report_parts_")
    lines.write.mode("overwrite").text(tmp)
    with open(out_path, "w") as out:
        out.write(header)
        for p in sorted(glob.glob(os.path.join(tmp, "part-*"))):
            with open(p) as f:
                shutil.copyfileobj(f, out)
    shutil.rmtree(tmp)


def write_report_files(crawled: DataFrame, out_dir: str) -> None:
    """Write the four golden-format text files ONCE (vs per-page).

    Formats mirror scraper.py:156-165, 183-190, 224-234, 268-272.
    The small aggregates (top-50, one argmax, counts) collect to the
    driver; the two full URL LISTS (uniquePages, icsSubDomains) are
    written distributed via _stream_text_parts — at 10^10 pages a
    ``collect()`` of either is a driver OOM (VERDICT r1 #5).
    """
    import os

    from spacetime_crawler4py_spark.operators.ids import with_contiguous_index

    os.makedirs(out_dir, exist_ok=True)

    n_pages = unique_page_count(crawled)
    numbered, _interm = with_contiguous_index(
        unique_pages(crawled), ["url_defrag"], "_i", start=1
    )
    _stream_text_parts(
        # orderBy restores the GLOBAL layout: the index assigner's
        # _pid window hash-partitions its output, so without this
        # the part files concatenate in scrambled order whenever
        # post-shuffle partitions > 1 (AQE coalescing to a single
        # partition masked it on small corpora)
        numbered.orderBy("_i").select(
            F.concat(
                F.col("_i").cast("string"), F.lit(". "), F.col("url_defrag"), F.lit("\n")
            ).alias("value")
        ),
        os.path.join(out_dir, "uniquePages.txt"),
        header=(
            "The number of unique pages that have been found, "
            f"solely based on URL: {n_pages}\n"
        ),
    )
    _interm.unpersist()

    lp = longest_page(crawled).collect()
    with open(os.path.join(out_dir, "longestPage.txt"), "w") as f:
        f.write("The longest page and its length (in terms of word count): \n")
        for r in lp:
            f.write(f"URL: {r['url_defrag']} -> Word Count: {r['wc']}")
        f.write("\n")

    top = top_50_words(crawled).collect()
    with open(os.path.join(out_dir, "top50CommonWords.txt"), "w") as f:
        f.write("Top 50 Common Words: \n\n")
        for r in top:
            f.write(f"'{r['word']}' : {r['count']}\n")
        f.write("\nend")

    subs = ics_subdomains(crawled)
    n_subs = subs.count()
    _stream_text_parts(
        subs.orderBy("url_defrag").select(
            F.concat(
                F.col("url_defrag"), F.lit(", "), F.col("n_links").cast("string")
            ).alias("value")
        ),
        os.path.join(out_dir, "icsSubDomains.txt"),
    )

    # composite answers file ("Answers to Questions.txt" shape)
    with open(os.path.join(out_dir, "Answers to Questions.txt"), "w") as f:
        f.write(f"1. Unique pages (defragmented URL): {n_pages}\n\n")
        f.write("2. Longest page by word count:\n")
        for r in lp:
            f.write(f"   {r['url_defrag']} -> {r['wc']} words\n")
        f.write("\n3. Top 50 common words (minus stopwords):\n")
        for r in top:
            f.write(f"   '{r['word']}' : {r['count']}\n")
        f.write(f"\n4. ics.uci.edu pages with unique-link counts: {n_subs} entries")
        f.write(" (full table in icsSubDomains.txt)\n")
