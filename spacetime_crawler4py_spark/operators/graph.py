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
