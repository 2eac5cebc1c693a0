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


# ------------------------------------------------ raw-text parsing


def py_parse_robots(
    text: str | None, user_agent: str = "spacetime-crawler"
) -> tuple[list[str], int | None]:
    """Parse raw robots.txt into (disallow_prefixes, crawl_delay_ms)
    for ``user_agent`` — the original convention's core: user-agent
    groups, Disallow prefixes, Crawl-delay.  Group selection is the
    standard most-specific rule: an exact/substring agent match wins
    over the ``*`` group.  ``Allow:`` override lines are outside the
    prefix model (documented limitation; parity tests use fixtures
    without them).  Empty ``Disallow:`` inside a matching group
    means allow-all (no prefix emitted)."""
    if not text:
        return [], None
    ua = user_agent.lower()
    groups: list[tuple[list[str], list[str], int | None]] = []
    agents: list[str] = []
    rules: list[str] = []
    delay: int | None = None
    in_rules = False

    def flush():
        nonlocal agents, rules, delay, in_rules
        if agents:
            groups.append((agents, rules, delay))
        agents, rules, delay, in_rules = [], [], None, False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if in_rules:
                flush()
            agents.append(val.lower())
        elif key == "disallow":
            in_rules = True
            if val:
                rules.append(val)
        elif key == "crawl-delay":
            in_rules = True
            try:
                delay = int(float(val) * 1000)
            except ValueError:
                pass
        else:
            in_rules = True
    flush()

    best: tuple[int, list[str], int | None] | None = None
    for ags, rs, dl in groups:
        for a in ags:
            if a == "*":
                score = 0
            elif a and a in ua:
                score = len(a)
            else:
                continue
            if best is None or score > best[0]:
                best = (score, rs, dl)
    if best is None:
        return [], None
    return best[1], best[2]


def parse_robots_table(
    raw: DataFrame,
    user_agent: str = "spacetime-crawler",
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, robots_txt) → the ROBOTS_SCHEMA table, distributed
    (mapInPandas; robots bodies never shuffle — one narrow pass)."""
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("host", StringType()),
            StructField("disallow_prefixes", ArrayType(StringType())),
            StructField("crawl_delay_ms", IntegerType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = [
                (h, *py_parse_robots(t, user_agent))
                for h, t in zip(pdf[host_col], pdf[text_col])
            ]
            yield pd.DataFrame(
                {
                    "host": [r[0] for r in rows],
                    "disallow_prefixes": [r[1] for r in rows],
                    "crawl_delay_ms": [r[2] for r in rows],
                }
            )

    return raw.select(host_col, text_col).mapInPandas(gen, out_schema)
