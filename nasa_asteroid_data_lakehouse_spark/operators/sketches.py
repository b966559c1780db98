"""Mergeable-sketch profiling (Apache DataSketches via Spark 4 built-ins).

The 100 TB profiling pattern: compute a fixed-size sketch per segment
(one map-side-combinable aggregate), persist the *sketch* column, and
answer global questions later by merging sketches — no rescan of the
fact table.  `hll_sketch_agg`/`hll_union_agg` give distinct counts,
`kll_sketch_agg_double` gives rank/quantile estimates; both are
order-insensitive, mergeable partial aggregates, so they parallelize
perfectly and survive incremental maintenance (union yesterday's
sketch with today's delta sketch instead of recounting).

Net-new surface relative to the reference, which profiles with one
exact job per metric per column (``src/etl/bronze_to_silver.py:127-143``,
~80 Spark jobs/run); see also ``operators/profile.py`` for the exact
single-pass variant.  Not DuckDB-reproducible (DataSketches estimates
are implementation-defined), so queries built on this are rows-only
checked — accuracy is asserted in unit tests against exact answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def segment_sketches(
    df: DataFrame,
    segment_col: str,
    distinct_col: str,
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-segment HLL (distinct ``distinct_col``) + KLL (quantiles of
    ``value_col``) sketches, kept as binary columns so callers can
    roll them up with :func:`rollup_sketches` without touching the
    source again."""
    return df.groupBy(segment_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.hll_sketch_agg(distinct_col, F.lit(lg_k)).alias("hll"),
        F.kll_sketch_agg_double(value_col).alias("kll"),
    )


def estimate_segments(sketches: DataFrame, quantiles: tuple[float, ...] = (0.5, 0.95)) -> DataFrame:
    """Materialize the human-readable estimates from a sketch table."""
    cols = [
        F.col(sketches.columns[0]),
        F.col("n_rows"),
        F.hll_sketch_estimate("hll").alias("distinct_est"),
    ]
    for q in quantiles:
        cols.append(
            F.kll_sketch_get_quantile_double("kll", F.lit(q)).alias(f"p{int(q * 100)}_est")
        )
    return sketches.select(*cols)


def rollup_sketches(
    sketches: DataFrame, quantiles: tuple[float, ...] = (0.5, 0.95)
) -> DataFrame:
    """Global estimates from per-segment sketches alone (the rollup a
    pre-aggregated sketch table answers without rescanning the fact):
    HLL sketches merge via ``hll_union_agg``; KLL sketches are folded
    pairwise with ``kll_sketch_merge_double`` (a binary scalar, so the
    collected per-segment sketch list — segment-cardinality sized —
    reduces driver-free inside one expression)."""
    # greatest(...,0) + try_element_at keep the fold total on an EMPTY
    # sketch table (zero segments): slice length would be -1 and ANSI
    # element access would throw; a NULL seed instead folds to a NULL
    # estimate, and zero-segment callers produce zero rows downstream.
    merged_kll = (
        "reduce(slice(__ks, 2, greatest(size(__ks) - 1, 0)),"
        " try_element_at(__ks, 1),"
        " (a, x) -> kll_sketch_merge_double(a, x))"
    )
    agg = sketches.agg(
        F.sum("n_rows").alias("n_rows"),
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("distinct_est"),
        F.collect_list("kll").alias("__ks"),
    )
    cols = [F.col("n_rows"), F.col("distinct_est")]
    for q in quantiles:
        cols.append(
            F.expr(f"kll_sketch_get_quantile_double({merged_kll}, {q})").alias(
                f"p{int(q * 100)}_est"
            )
        )
    return agg.select(*cols)

def segment_theta_sketches(
    df: DataFrame, segment_col: str, key_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-segment Theta sketch over ``key_col`` — the set-expression
    counterpart of :func:`segment_sketches`.  Unlike HLL, Theta
    sketches support intersection and difference, so a persisted
    per-segment sketch table can answer "how many keys do segments A
    and B share?" without rescanning the fact table — the 100 TB
    audience-overlap pattern."""
    return df.groupBy(segment_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.theta_sketch_agg(key_col, F.lit(lg_k)).alias("theta"),
    )


def theta_overlap_matrix(sketches: DataFrame, segment_col: str) -> DataFrame:
    """All-pairs segment overlap from sketches alone: for each segment
    pair (a < b), estimated |A|, |B|, |A ∩ B|, |A ∪ B|, |A \\ B| and
    Jaccard.  The input is segment-cardinality sized (tiny after the
    sketch aggregation), so the self-join is a broadcast nested loop
    over k² rows — no fact-table shuffle."""
    a = sketches.select(
        F.col(segment_col).alias("seg_a"), F.col("theta").alias("theta_a")
    )
    b = sketches.select(
        F.col(segment_col).alias("seg_b"), F.col("theta").alias("theta_b")
    )
    pairs = a.join(b, F.col("seg_a") < F.col("seg_b"))
    inter = F.theta_sketch_estimate(F.theta_intersection("theta_a", "theta_b"))
    return pairs.select(
        "seg_a",
        "seg_b",
        F.theta_sketch_estimate("theta_a").alias("size_a_est"),
        F.theta_sketch_estimate("theta_b").alias("size_b_est"),
        inter.alias("intersection_est"),
        F.theta_sketch_estimate(F.theta_union("theta_a", "theta_b")).alias("union_est"),
        F.theta_sketch_estimate(F.theta_difference("theta_a", "theta_b")).alias(
            "a_minus_b_est"
        ),
    )

def count_min_counters(
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms-v1",
) -> DataFrame:
    """Count-min sketch as a DataFrame: ``depth`` md5-derived hash rows
    of ``width`` buckets, one count per (row, bucket).  The counter
    table is depth×width rows REGARDLESS of corpus size — a
    map-side-combinable aggregate that merges across batches by
    summing matching cells, so per-shard counters roll up without
    rescanning (same maintenance story as the HLL/KLL/Theta profiles
    above).  Unlike those, every cell is plain integer arithmetic on
    portable md5 hashes, so estimates reproduce bit-for-bit in any
    engine."""
    rows = items.select(
        F.col(item_col).alias("item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.pmod(
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat_ws("|", F.lit(f"{seed}-{j}"), F.col(item_col))
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("long"),
                            F.lit(width),
                        ).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("hb"),
    ).select("item", "hb.j", "hb.bucket")
    return rows.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def count_min_estimate(
    counters: DataFrame,
    queries: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms-v1",
) -> DataFrame:
    """Point-frequency estimates for the ``queries`` items: min over the
    ``depth`` cells each item hashes to (CMS guarantees estimate >=
    true count; collisions only inflate).  The counter table is tiny
    (depth×width), so the lookup join broadcasts — no shuffle of the
    query side."""
    from pyspark.sql.functions import broadcast

    probes = queries.select(
        F.col(item_col).alias("item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.pmod(
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat_ws("|", F.lit(f"{seed}-{j}"), F.col(item_col))
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("long"),
                            F.lit(width),
                        ).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("hb"),
    ).select("item", "hb.j", "hb.bucket")
    return (
        probes.join(broadcast(counters), ["j", "bucket"])
        .groupBy("item")
        .agg(F.min("cnt").alias("cms_est"))
    )
