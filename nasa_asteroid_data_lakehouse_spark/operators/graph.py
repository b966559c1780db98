"""Iterative graph algorithms as DataFrame loops.

Spark has no native graph engine in PySpark (GraphX is Scala-only,
GraphFrames an external package), but fixed-iteration message-passing
algorithms decompose cleanly into join + groupBy rounds: each iteration
is one shuffle on the edge key, and ``localCheckpoint`` between rounds
truncates the lineage so the plan doesn't grow exponentially (the same
discipline as ``llm/dedup``'s distributed connected components).

Determinism note: per-node message SUMs are floating-point and Spark
does not guarantee reduction order, so raw ranks differ in the last ulp
across runs/engines.  Rounding the rank to a fixed lattice after EVERY
iteration makes each round's input identical everywhere — errors can't
compound, and results are bit-reproducible (the property every oracle
check in this repo is built on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    round_to: int = 9,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected edge list.

    Edges are symmetrized and deduplicated; every endpoint is a node
    (isolated documents never appear in an edge list and are excluded —
    their rank is the (1-d) floor by definition).  Per iteration:
    rank(v) = (1-d) + d * Σ rank(u)/deg(u) over neighbors u, rounded to
    ``round_to`` decimals (see module docstring).  Returns (node, rank)
    after ``iterations`` rounds, init rank 1.0.

    Use case here: authority-based survivor selection in near-dup
    clusters — the most-connected exemplar of a boilerplate family is
    the canonical copy; min-id or quality-score picks ignore the graph
    structure.  Cost: ``iterations`` shuffles on the node key, state is
    one (node, rank) row per node — linear at any corpus size.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .union(edges.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e_deg = e.join(deg, "src").localCheckpoint(eager=False)
    nodes = e.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=False
    )

    base = 1.0 - damping
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for _ in range(iterations):
        contribs = (
            e_deg.join(ranks, e_deg["src"] == ranks["node"])
            .select(F.col("dst"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                F.round(
                    F.lit(base) + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0)),
                    round_to,
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
