"""Robust-statistics cleaning: per-group quantile bounds and
winsorization (outlier clipping).

Net-new analytical surface (the reference has no aggregations at all —
SURVEY.md §2 D); the pattern is the quantile *application* story: a
tiny per-group bounds table computed once, broadcast back onto the
fact rows, and applied as pure column algebra.

Scale notes: ``exact=True`` uses ``percentile`` (collects each group's
values — fine for thousands of groups, wrong for millions of rows per
group); the default ``exact=False`` uses the Greenwald-Khanna
``percentile_approx`` sketch, a fixed-size mergeable partial aggregate
that survives 100 TB.  Either way the bounds frame is group-cardinality
sized, so the join back is always a broadcast — the fact side never
shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def group_quantile_bounds(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lower: float = 0.01,
    upper: float = 0.99,
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group (lower, upper) quantile bounds of ``value_col``.

    Both bounds come from ONE array-form percentile aggregate: two
    scalar percentile aggregates each buffer and sort the group's
    values independently (2x the work — the pattern measured 2.8x
    slower in psi_orders_price's nine-way case); the array form
    extracts both ranks from a single sorted buffer, bit-identically.
    """
    if exact:
        both = F.expr(f"percentile({value_col}, array({lower!r}, {upper!r}))")
    else:
        both = F.percentile_approx(
            value_col, F.array(F.lit(lower), F.lit(upper)), F.lit(accuracy)
        )
    return df.groupBy(*group_cols).agg(
        both.getItem(0).alias("__lo"), both.getItem(1).alias("__hi")
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lower: float = 0.01,
    upper: float = 0.99,
    exact: bool = False,
    out_col: str | None = None,
) -> DataFrame:
    """Clip ``value_col`` to its per-group [lower, upper] quantile
    band; the clipped value lands in ``out_col`` (default
    ``<value_col>_winsorized``) with the bounds kept as columns."""
    out = out_col or f"{value_col}_winsorized"
    bounds = group_quantile_bounds(df, value_col, group_cols, lower, upper, exact)
    return (
        df.join(broadcast(bounds), group_cols)
        .withColumn(out, F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")))
        .withColumnRenamed("__lo", f"{value_col}_lo")
        .withColumnRenamed("__hi", f"{value_col}_hi")
    )
