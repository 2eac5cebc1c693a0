from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def corpus80(spark, tmp_path_factory):
    """Shared 80-page corpus: (corpus_dir, corpus_rows)."""
    from spacetime_crawler4py_spark.datagen.pages import (
        generate_corpus,
        write_corpus,
    )

    d = tmp_path_factory.mktemp("corpus80")
    write_corpus(spark, str(d), n_pages=80, seed=42)
    return str(d), generate_corpus(n_pages=80, seed=42)


@pytest.fixture(scope="session")
def oracle80(corpus80):
    from spacetime_crawler4py_spark.crawl.oracle import (
        OracleCrawler,
        corpus_to_dicts,
    )

    _, corpus = corpus80
    pages, status, seeds = corpus_to_dicts(corpus)
    return OracleCrawler(pages, status, seeds).run()


@pytest.fixture(scope="session")
def engine80(spark, corpus80, tmp_path_factory):
    """A completed batched crawl over corpus80 (shared state)."""
    from spacetime_crawler4py_spark.crawl.loop import CrawlEngine
    from spacetime_crawler4py_spark.datagen.pages import SEED_URLS

    corpus_dir, _ = corpus80
    state = tmp_path_factory.mktemp("engine80_state")
    eng = CrawlEngine(
        spark,
        state_dir=str(state),
        pages_path=f"{corpus_dir}/pages.parquet",
        status_path=f"{corpus_dir}/fetch_status.parquet",
        seeds=SEED_URLS,
        window_ms=32_000,
    )
    eng.n_batches_run = eng.run()
    return eng


@pytest.fixture(scope="session")
def spark():
    from spacetime_crawler4py_spark.session import get_spark

    import tempfile

    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.session.timeZone": "UTC",
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark_wh_"),
        },
    )
    yield s


# Adversarial URL corpus exercising every reference quirk:
# fragments, params, trailing slashes, schemes, traps, extensions.
URL_CORPUS = [
    "https://www.ics.uci.edu",
    "https://www.ics.uci.edu/",
    "https://www.ics.uci.edu///",
    "http://www.ics.uci.edu",               # scheme excluded from hash
    "https://www.ics.uci.edu/page#frag",    # fragment IS hashed
    "https://www.ics.uci.edu/page#frag2",
    "https://www.ics.uci.edu/page",
    "https://www.ics.uci.edu/a/b/c?q=1&r=2",
    "https://www.ics.uci.edu/a/b;param=v?q=1#f",
    "https://www.ics.uci.edu/a;x/b",         # ';' in non-last segment
    "https://www.cs.uci.edu/research",
    "https://www.informatics.uci.edu/x",
    "https://www.stat.uci.edu/y",
    "https://ics.uci.edu/apex",              # apex: NO leading dot → invalid
    "https://ngs.ics.uci.edu/hot/host/page1",
    "https://example.com/offsite",
    "ftp://www.ics.uci.edu/file",
    "mailto:someone@ics.uci.edu",
    "https://www.ics.uci.edu/file.pdf",
    "https://www.ics.uci.edu/file.pdf/",     # valid RAW ('$'-anchored ext regex);
                                             # must be validated BEFORE normalize
    "https://www.ics.uci.edu/file.PDF",      # path lowered before match
    "https://www.ics.uci.edu/file.tar.gz",
    "https://www.ics.uci.edu/style.css?v=3",  # ext test is on path only
    "https://www.ics.uci.edu/calendar/2023",  # trap regex never fires (bug)
    "https://www.ics.uci.edu/a/b/a/b/",       # repeating dirs: netloc-tested → passes
    "https://www.ics.uci.edu:8080/port",
    "https://user:pw@www.ics.uci.edu/auth",
    "https://WWW.ICS.UCI.EDU/CasePage",
    "https://www.ics.uci.edu/~user/KidneyData.txt",
    "https://www.ics.uci.edu/?onlyquery",
    "https://www.ics.uci.edu/#onlyfrag",
    "https://www.ics.uci.edu/a%20b/c",
    "https://sub.domain.ics.uci.edu/deep/path/page.html",
]
