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
    # materialize the edge list once — it joins into every round, and any
    # upstream pipeline (e.g. a fact-table join producing the edges) must
    # not re-execute per iteration
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    out_deg = (
        e.groupBy("_s")
        .agg(F.count(F.lit(1)).alias("_deg"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        contrib = (
            e.join(ranks, e["_s"] == ranks["node"])
            .join(out_deg, "_s")
            .select(F.col("_d").alias("node"), (F.col("rank") / F.col("_deg")).alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        # dangling mass = rank not shipped anywhere this round; folded
        # into the update as a broadcast 1-row cross-join so each round
        # is ONE materialized job, not a collect + a job
        dangling = (
            ranks.join(out_deg, ranks["node"] == out_deg["_s"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_m"))
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
            )
            .localCheckpoint(eager=True)
        )
    return ranks
