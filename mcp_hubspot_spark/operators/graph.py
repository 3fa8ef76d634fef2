"""Iterative graph operators over DataFrame edge lists.

Connected components (dedup clustering) lives in ``operators.dedup``;
this module holds rank-style iterative algorithms. Spark has no native
graph operator, but the standard formulations are join+aggregate loops —
exactly the pattern Catalyst schedules well when lineage is truncated
between rounds (``localCheckpoint``), which is also how GraphX/GraphFrames
execute them underneath.

Training-data relevance: link-based quality priors (a PageRank over a
hyperlink or citation graph is a classic corpus-quality feature) and
influence weighting over interaction graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 10,
) -> DataFrame:
    """Standard damped PageRank over a directed edge list; returns
    (node, rank) with ranks summing to ~1.

    Per round: contributions = rank/out_degree shipped along edges (one
    equi-join on src, shuffle on the key), summed per destination (one
    aggregate). Dangling-node mass (nodes with no out-edges) is
    redistributed uniformly each round — without this the ranks leak and
    stop summing to 1. State per round is one (node, rank) row — constant
    memory per node, any scale; ``localCheckpoint`` keeps the plan from
    growing with iterations.

    Fixed ``n_iter`` rather than a convergence test: each convergence
    check is an extra action, and ~10 rounds is the published
    rule-of-thumb for rank stabilization at damping 0.85.
    """
    # materialize the per-source out-degree ONTO the edge list once — the
    # deg is constant across rounds, so pre-joining it here removes one
    # join from EVERY round's plan; the checkpoint also stops any
    # upstream pipeline (e.g. a fact-table join producing the edges)
    # from re-executing per iteration. The edge pipeline appears twice in
    # this one plan (row side + degree side); its terminal exchange is
    # runtime-reused, so it still executes once.
    e0 = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    e = e0.join(
        e0.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg")), "_s"
    ).localCheckpoint(eager=True)
    # node state carries a DANGLING flag (no out-edges) so the per-round
    # dangling-mass aggregate is a plain filter over the rank state —
    # the former per-round anti-join against the degree table is gone
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .join(
            e.select(F.col("_s").alias("node")).distinct().withColumn(
                "_has_out", F.lit(True)
            ),
            "node",
            "left",
        )
        .select("node", F.col("_has_out").isNull().alias("_dang"))
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"), "_dang")
    for _ in range(n_iter):
        contrib = (
            e.join(ranks, e["_s"] == ranks["node"])
            .select(F.col("_d").alias("node"), (F.col("rank") / F.col("_deg")).alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        # dangling mass = rank not shipped anywhere this round; folded
        # into the update as a broadcast 1-row cross-join so each round
        # is ONE materialized job, not a collect + a job
        dangling = ranks.filter(F.col("_dang")).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_m")
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.col("_m") / F.lit(float(n))
                    + F.lit(damping) * F.coalesce("_in", F.lit(0.0))
                ).alias("rank"),
                "_dang",
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", "rank")


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Global triangle count over an undirected edge list, with DEGREE
    orientation — each canonical edge is directed from its lower-degree
    endpoint to its higher-degree endpoint (ties by node id), which caps
    every node's out-degree at O(sqrt(m)) and therefore bounds the wedge
    join that dominates the cost (the standard trick from Suri &
    Vassilvitskii's MR-triangle work; a naive id-orientation lets one hub
    node generate degree² wedges). Each triangle is then counted exactly
    once: wedges a→b→c joined against the oriented edge a→c.

    Returns one row (n_nodes, n_edges, n_triangles); edges are
    canonicalized (self-loops dropped, duplicates and direction
    collapsed) first, so any raw pair list is a valid input. Three
    shuffles total: canonical distinct, the wedge join, the closing
    semi-join — all on node keys.
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        canon.select(F.col("u").alias("node"))
        .unionByName(canon.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ranked = (
        canon.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("deg", "du")
        .join(
            deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")),
            "v",
        )
    )
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    wedges = oriented.alias("e1").join(
        oriented.alias("e2"), F.col("e1.b") == F.col("e2.a")
    ).select(F.col("e1.a").alias("x"), F.col("e2.b").alias("z"))
    closing = oriented.select(
        F.col("a").alias("x"), F.col("b").alias("z")
    ).unionByName(
        # the third side may be oriented either way relative to the wedge
        oriented.select(F.col("b").alias("x"), F.col("a").alias("z"))
    )
    tri = wedges.join(closing, ["x", "z"], "left_semi")
    n_tri = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    n_edges = canon.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        n_nodes.crossJoin(n_edges)
        .crossJoin(n_tri)
        .select(
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_triangles").cast("long").alias("n_triangles"),
        )
    )


def clustering_coefficients(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node local clustering coefficient: triangles_at(v) /
    C(deg(v), 2) — the cohesion profile behind the global count
    (``triangle_count``), used as a graph-structure quality feature
    (link-farm pages cluster very differently from organic ones).

    Same degree-oriented wedge join as ``triangle_count``; here each
    matched wedge keeps all three corners, explodes into one row per
    (triangle, corner), and a count per node yields triangles_at. Nodes
    with degree < 2 report 0.0. Returns (node, degree, n_triangles,
    clustering) — clustering rounded to 6 for cross-engine parity.
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        canon.select(F.col("u").alias("node"))
        .unionByName(canon.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    ranked = (
        canon.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("degree", "du")
        .join(
            deg.select(F.col("node").alias("v"), F.col("degree").alias("dv")),
            "v",
        )
    )
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    triangles = (
        oriented.alias("e1")
        .join(oriented.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
        .join(
            oriented.select(F.col("a").alias("x"), F.col("b").alias("z")),
            ["x", "z"],
        )
    )
    per_node = (
        triangles.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    possible = F.col("degree") * (F.col("degree") - 1) / 2
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            F.col("degree").cast("long").alias("degree"),
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
            F.round(
                F.when(
                    F.col("degree") >= 2,
                    F.coalesce("n_triangles", F.lit(0)) / possible,
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("clustering"),
        )
    )
