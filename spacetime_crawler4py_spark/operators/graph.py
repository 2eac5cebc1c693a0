"""Distributed graph operators over edge DataFrames: connected
components (dedup representative selection) and PageRank (link-graph
authority for crawl prioritization / corpus quality weighting).

Alternating large-star / small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014 — public paper):
each iteration is two groupBy-shuffles on node id; converges in
O(log² n) rounds (in practice <10 for web-scale near-dup graphs,
whose components are tiny and star-shaped).

Used by dedup representative selection: near-dup PAIRS (an edge
list) → components → one kept representative per component.  At
100 TB the edge list is the output of a bucketed LSH join (bounded
candidates), so each iteration shuffles only edges, never text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _star(edges: DataFrame, large: bool) -> DataFrame:
    """One star-contraction round.  Edges are kept as (u, v) with
    the invariant u > v after each round (parent pointers toward
    the component minimum).

    large-star: for each node u, connect every STRICTLY LARGER
    neighbor to u's minimum neighbor (or u itself if u is the min).
    small-star: connect all smaller-or-equal neighbors + u to the
    minimum.  Both are a groupBy(u) + explode — two narrow shuffles.
    """
    nbrs = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    grouped = nbrs.groupBy("u").agg(F.collect_set("v").alias("vs"))
    m = F.least(F.col("u"), F.array_min("vs"))
    if large:
        targets = F.filter(F.col("vs"), lambda x: x > F.col("u"))
    else:
        targets = F.filter(F.col("vs"), lambda x: x <= F.col("u"))
    out = grouped.select(
        F.explode(
            F.array_union(targets, F.array(F.col("u")))
        ).alias("a"),
        m.alias("b"),
    ).where(F.col("a") != F.col("b"))
    return out.select(
        F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
    ).distinct()


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``;
    component = the minimum node id of its component.

    Each iteration materializes the shrinking edge list (cached) and
    stops at a fixed point, detected by an order-insensitive
    signature over the full edge SET: (count, sum of 64-bit edge
    hashes) — one cheap aggregate, no collect of edges.  Unlike the
    endpoint-sum heuristic, two distinct edge sets colliding requires
    an xxhash64 sum collision (~2⁻⁶⁴), not merely equal arithmetic
    sums.  Isolated nodes never appear in ``pairs`` and are their own
    components by definition (callers left-join and coalesce).
    Raises RuntimeError if max_iter is exhausted without convergence
    (silently returning unconverged components would corrupt dedup
    representative selection downstream).
    """
    edges = (
        pairs.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .cache()
    )
    prev_sig = None
    converged = False
    for _ in range(max_iter):
        nxt = _star(_star(edges, large=True), large=False).cache()
        sig = tuple(
            nxt.agg(
                F.count("*").alias("n"),
                # decimal(38,0) accumulator: summing raw 64-bit hashes
                # overflows long under ANSI mode
                F.sum(
                    F.xxhash64(F.col("u"), F.col("v")).cast("decimal(38,0)")
                ).alias("h"),
            ).first()
        )
        edges.unpersist()
        edges = nxt
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        edges.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "iterations — raise max_iter (components deeper than "
            "O(log^2 n) star-contraction rounds)"
        )
    # after convergence every edge is (node, component_min)
    comp = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )
    out = comp.unionByName(roots).groupBy("node").agg(
        F.min("component").alias("component")
    )
    edges.unpersist()
    return out


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after ``n_iter`` damped power iterations (Page &
    Brin 1998) over the node universe appearing in ``edges``.

    r_{t+1}(v) = (1−d)/N + d·(Σ_{u→v} r_t(u)/outdeg(u) + dang_t/N)
    where dang_t is the rank mass sitting on dangling nodes (no
    out-edges), redistributed uniformly — the standard stochastic
    completion, so Σ rank = 1 at every step.

    Shape per iteration at scale: ONE shuffle join rank⋈edges on the
    src key + ONE groupBy(dst) partial agg for the contributions,
    plus a one-row dangling-mass aggregate (broadcast).  The
    degree-annotated edge list is computed once and cached — rank
    state is O(nodes), edges are never re-derived.  Skewed in-degree
    (the web's hub pages) lands on the partial agg's map-side
    combine; AQE handles the residual reduce skew.  Parallel edges
    are deduped (the web-graph convention); self-loops count like
    any other edge.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    deg = e.groupBy("u").agg(F.count("*").alias("deg"))
    ew = e.join(deg, "u").cache()
    ew.count()  # pin before the loop reuses it n_iter times

    rank = nodes.select("node", F.lit(1.0 / n).alias("rank")).cache()
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        dang = (
            rank.join(deg.select(F.col("u").alias("node")), "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("d"))
            .first()["d"]
        )
        contrib = (
            ew.join(rank.withColumnRenamed("node", "u"), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("s"))
        )
        nxt = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("s"), F.lit(0.0)) + F.lit(dang / n))
                ).alias("rank"),
            )
            .cache()
        )
        # materialize BEFORE dropping the previous state: unpersisting
        # first would re-derive the whole lineage chain each round
        nxt.count()
        rank.unpersist()
        rank = nxt
    ew.unpersist()
    nodes.unpersist()
    return rank


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
) -> DataFrame:
    """(node, hub, authority) after ``n_iter`` HITS iterations
    (Kleinberg 1999, JACM 46(5)): a ← Σ_{u→v} h(u), h ← Σ_{u→v} a(v),
    each half-step L1-normalized (Σ = 1) — the hubs-and-authorities
    companion to pagerank() for link-graph curation (seed-list
    discovery, spam-hub demotion).

    Same per-iteration shape as pagerank: ONE shuffle join state⋈edges
    + ONE partial-agg groupBy per half-step, plus a one-row total for
    the normalization; the deduped edge list is cached once.  Start
    state h = 1/N.  Nodes with no in-edges get authority 0 (and hubs
    pointing nowhere get hub 0) — the node universe never shrinks.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
        .cache()
    )
    e.count()
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    h = nodes.select("node", F.lit(1.0 / n).alias("h")).cache()
    a = None
    for _ in range(n_iter):
        a_raw = (
            e.join(h.withColumnRenamed("node", "u"), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum("h").alias("s"))
        )
        tot_a = a_raw.agg(F.coalesce(F.sum("s"), F.lit(0.0)).alias("t")).first()["t"]
        nxt_a = (
            nodes.join(a_raw, "node", "left")
            .select(
                "node",
                (F.coalesce(F.col("s"), F.lit(0.0)) / F.lit(tot_a or 1.0)).alias("a"),
            )
            .cache()
        )
        nxt_a.count()
        if a is not None:
            a.unpersist()
        a = nxt_a
        h_raw = (
            e.join(a.withColumnRenamed("node", "v"), "v")
            .groupBy(F.col("u").alias("node"))
            .agg(F.sum("a").alias("s"))
        )
        tot_h = h_raw.agg(F.coalesce(F.sum("s"), F.lit(0.0)).alias("t")).first()["t"]
        nxt_h = (
            nodes.join(h_raw, "node", "left")
            .select(
                "node",
                (F.coalesce(F.col("s"), F.lit(0.0)) / F.lit(tot_h or 1.0)).alias("h"),
            )
            .cache()
        )
        nxt_h.count()
        h.unpersist()
        h = nxt_h
    out = h.join(a, "node").select(
        "node", "h", F.col("a").alias("authority")
    ).withColumnRenamed("h", "hub")
    e.unpersist()
    nodes.unpersist()
    return out
