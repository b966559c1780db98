"""Temporal join operators: range join, as-of join.

The reference has no theta/range/as-of joins (SURVEY.md §2 C); these
are the standard event-correlation primitives a lakehouse needs.

Scale notes: both are expressed so the *equi* part (user/key) drives
the shuffle and the temporal predicate stays a post-join filter or a
window — never a cross join.  For massively skewed keys combine with
``operators.skew``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
) -> DataFrame:
    """Pairs (l, r) with matching keys and r.ts in
    [l.ts + lower, l.ts + upper].

    Equi-join on ``keys`` (the shuffle), interval predicate filtered
    after — Spark plans SortMergeJoin on keys with the range as a join
    condition, so there is no cross product.  Column names must be
    disjoint apart from ``keys``.
    """
    li, ri = F.expr(f"INTERVAL {lower}"), F.expr(f"INTERVAL {upper}")
    cond = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in keys] + [
        F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") + li,
        F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + ri,
    ]
    joined = left.alias("l").join(right.alias("r"), cond)
    keep = (
        [F.col(f"l.{k}").alias(k) for k in keys]
        + [F.col(f"l.{c}") for c in left.columns if c not in keys]
        + [F.col(f"r.{c}") for c in right.columns if c not in keys]
    )
    return joined.select(*keep)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, the single nearest right row per key at or
    before (``backward``) / at or after (``forward``) the left
    timestamp.

    Union-and-window formulation (no join at all): tag both sides, sort
    within key by time, and carry the latest right row forward (or the
    next one backward) with ``last_value IGNORE NULLS``.  One shuffle
    on the key — the same cost as a groupBy, regardless of how many
    right rows precede each left row.

    NULL keys follow JOIN semantics, not window-partition semantics: a
    right row with a NULL key never matches anything (dropped up
    front), and a left row with a NULL key gets NULL fills.  Without
    the drop, the window's PARTITION BY groups the NULL keys of both
    sides together and they match each other — the adversarial gate
    (scripts/adversarial_sim.py) caught exactly that divergence vs the
    SQL-join oracle.
    """
    right = right.na.drop(subset=keys)
    lcols = [c for c in left.columns if c not in keys and c != left_ts]
    rcols = [c for c in right.columns if c not in keys and c != right_ts]

    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{c}{suffix}") for c in rcols],
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias(f"{right_ts}{suffix}"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # Deterministic tiebreak among right rows sharing a timestamp: the
    # highest-sorting carried column wins (stable across runs/partitionings).
    tiebreak = [F.col(f"{c}{suffix}").asc_nulls_first() for c in rcols]

    if direction == "backward":
        # right rows sort before a left row at the same ts -> "at or before"
        w = (
            Window.partitionBy(*keys)
            .orderBy("__ts", "__is_left", *tiebreak)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fill = F.last
    elif direction == "forward":
        w = (
            Window.partitionBy(*keys)
            .orderBy("__ts", F.col("__is_left").desc(), *tiebreak)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        fill = F.first
    else:
        raise ValueError("direction must be 'backward' or 'forward'")

    filled_cols = [f"{c}{suffix}" for c in rcols] + [f"{right_ts}{suffix}"]
    # Fill every carried column in ONE select: sequential withColumn
    # calls interleave Projects between the Window ops, defeating the
    # CollapseWindow rule — the plan then carries one Sort+Window PER
    # carried column (3x the sort cost at 3 columns).  A single
    # projection with a shared window spec plans as one Sort + one
    # Window regardless of column count.
    passthrough = [c for c in unioned.columns if c not in filled_cols]
    out = unioned.select(
        *passthrough,
        *[fill(c, ignorenulls=True).over(w).alias(c) for c in filled_cols],
    )
    return (
        out.where(F.col("__is_left") == 1)
        .drop("__is_left")
        .withColumnRenamed("__ts", left_ts)
    )
