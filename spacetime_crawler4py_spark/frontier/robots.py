"""robots.txt compliance layer (north_rule addition; SURVEY §2.8 T6 —
the reference has NO robots handling, politeness came only from its
cache server, so this is new surface, not parity surface).

Model: a ``robots(host, disallow_prefixes array<string>,
crawl_delay_ms int)`` table (FIXTURES.md §5).  Two enforcement
points, both JVM-side:

- ``filter_allowed``   drop URLs whose path starts with any
  disallowed prefix for their host (broadcast join — the robots
  table is tiny relative to the frontier; one row per host).
- ``with_host_delay``  attach per-host crawl delay (default 500 ms,
  config.ini:12) for the scheduler's per-host budget.

Disallow semantics: prefix match on the URL path, the core rule of
the original robots.txt convention (full pattern matching with *
and $ is a straightforward extension of the prefix expression).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spacetime_crawler4py_spark.functions.urlnorm import col_netloc
from spacetime_crawler4py_spark.functions.validity import col_path

ROBOTS_SCHEMA = "host string, disallow_prefixes array<string>, crawl_delay_ms int"


def filter_allowed(
    urls: DataFrame, robots: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop rows disallowed by their host's robots rules.

    Hosts absent from the robots table are fully allowed (the
    convention's default-allow).  The join is a broadcast left join
    on host; the prefix test is an ``exists`` over the (short)
    prefix array — no Python crossing, no shuffle of the URL side.
    """
    r = robots.select(
        F.col("host").alias("_r_host"),
        F.col("disallow_prefixes").alias("_r_prefixes"),
    )
    joined = urls.withColumn("_host", col_netloc(F.col(url_col))).join(
        F.broadcast(r), F.col("_host") == F.col("_r_host"), "left"
    )
    path = col_path(F.col(url_col))
    disallowed = F.when(
        F.col("_r_prefixes").isNotNull(),
        F.exists("_r_prefixes", lambda p: path.startswith(p)),
    ).otherwise(F.lit(False))
    return joined.where(~disallowed).drop("_host", "_r_host", "_r_prefixes")


def with_host_delay(
    pending: DataFrame, robots: DataFrame | None, default_delay_ms: int = 500
) -> DataFrame:
    """Attach ``crawl_delay_ms`` per host (robots override or default)."""
    if robots is None:
        return pending.withColumn("crawl_delay_ms", F.lit(default_delay_ms))
    r = robots.select(
        F.col("host").alias("_r_host"),
        F.col("crawl_delay_ms").alias("_r_delay"),
    )
    return (
        pending.join(F.broadcast(r), pending["host"] == F.col("_r_host"), "left")
        .withColumn(
            "crawl_delay_ms", F.coalesce(F.col("_r_delay"), F.lit(default_delay_ms))
        )
        .drop("_r_host", "_r_delay")
    )
