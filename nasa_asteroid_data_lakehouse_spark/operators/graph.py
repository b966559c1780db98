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


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """One (lo, hi) row per undirected edge: least/greatest + distinct
    over E rows (self-loops dropped) — the single canonicalization both
    degree and triangle counting build on."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
    )


def degrees(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node degree of the undirected graph: canonicalize the edge
    list (distinct over E rows, not the 2E a symmetrize-first pass
    would shuffle), explode each edge's two endpoints, one hash
    aggregation on the node key.  Returns (node, degree)."""
    canon = _canonical_edges(edges, src, dst)
    return (
        canon.select(F.explode(F.array("lo", "hi")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle participation over an undirected graph — the
    local-clustering signal (a boilerplate family near-dups into a
    clique; a chain of coincidental shingle collisions does not).

    Canonical-orientation enumeration: with every edge stored once as
    (lo, hi), a triangle a<b<c is found exactly once by joining
    (a,b)⋈(b,c) and checking (a,c).  Two equi-joins on node keys —
    shuffle cost O(E^1.5)-bounded by the standard triangle-join
    argument, fine for verified near-dup graphs whose components are
    small by construction (max_bucket caps the pair stage upstream).
    Returns (node, n_triangles) for nodes in at least one triangle.
    """
    canon = _canonical_edges(edges, src, dst).localCheckpoint(
        eager=False  # referenced three times below
    )
    e1 = canon.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    e2 = canon.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    e3 = canon.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tris = (
        e1.join(e2, "b")
        .where(F.col("a") < F.col("c"))
        .join(e3, ["a", "c"], "left_semi")
        .select("a", "b", "c")
    )
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_node


def kcore_peel(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 2,
    iters: int = 3,
) -> DataFrame:
    """Fixed-iteration k-core peel: repeatedly drop nodes of degree
    < k (and their edges), ``iters`` rounds — the dense-cluster
    extractor over the near-dup graph (a boilerplate clique survives
    peeling; chains of coincidental collisions dissolve).

    Each round is one endpoint-explode aggregate + two semi-joins on
    the node key; the edge list is checkpointed per round so the plan
    stays flat.  A FIXED iteration count (not loop-until-fixpoint)
    keeps the computation deterministic and oracle-expressible; k-core
    converges in few rounds on bounded-component dedup graphs.
    Returns one row: (n_nodes, n_edges) of the surviving subgraph."""
    cur = _canonical_edges(edges, src, dst).localCheckpoint(eager=False)
    for _ in range(iters):
        deg = (
            cur.select(F.explode(F.array("lo", "hi")).alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        keep = deg.where(F.col("degree") >= k).select("node")
        cur = (
            cur.join(keep, cur["lo"] == keep["node"], "left_semi")
            .join(keep, cur["hi"] == keep["node"], "left_semi")
            .localCheckpoint(eager=False)
        )
    nodes = cur.select(F.explode(F.array("lo", "hi")).alias("node")).agg(
        F.count_distinct("node").alias("n_nodes")
    )
    return nodes.crossJoin(cur.agg(F.count(F.lit(1)).alias("n_edges")))
