"""Time-series resample + gap-fill (net-new surface; the reference's
only time axis is the daily batch partition, SURVEY.md §2.I).

``resample``: truncate event time to a fixed interval and aggregate —
one shuffle on (keys, bucket), partial aggregation map-side.

``fill_gaps``: materialize the complete per-key time grid with
``sequence`` + ``explode``, left-join the resampled actuals, and
forward-fill missing buckets with a running ``last(ignorenulls)``
window.  Row count becomes keys × buckets regardless of sparsity —
which is the point: downstream consumers (charting, change detection,
training windows) need a dense axis.

At 100 TB: the grid explode is O(keys × buckets) rows but only 3
columns wide; the forward-fill window shuffles once on the key.  For
very long ranges, bound the grid (``max_buckets`` guard) — a runaway
``sequence`` from a corrupt min/max is the classic OOM here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TRUNC = {"1 hour": "hour", "1 day": "day", "1 week": "week", "1 month": "month"}


def resample(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    aggs: list[Column],
    interval: str = "1 hour",
) -> DataFrame:
    """Aggregate into fixed time buckets: one row per (keys, bucket)."""
    bucket = F.date_trunc(_TRUNC[interval], F.col(ts_col)).alias("bucket_ts")
    return df.groupBy(*keys, bucket).agg(*aggs)


def fill_gaps(
    resampled: DataFrame,
    keys: list[str],
    value_col: str,
    interval: str = "1 hour",
    bucket_col: str = "bucket_ts",
    max_buckets: int = 1_000_000,
) -> DataFrame:
    """Dense per-key grid with forward-filled values.

    Output: keys + ``bucket_col`` + ``<value_col>`` (null on gap rows),
    ``<value_col>_filled`` (last non-null carried forward) and
    ``is_gap``.  The grid spans each key's own [min, max] bucket range.
    """
    bounds = resampled.groupBy(*keys).agg(
        F.min(bucket_col).alias("__mn"),
        # clip the range so a corrupt max timestamp cannot explode the
        # grid into an OOM-sized sequence
        F.expr(
            f"least(max({bucket_col}), "
            f"min({bucket_col}) + INTERVAL {interval.upper()} * {max_buckets})"
        ).alias("__mx"),
    )
    grid = bounds.select(
        *keys,
        F.explode(
            F.sequence("__mn", "__mx", F.expr(f"INTERVAL {interval.upper()}"))
        ).alias(bucket_col),
    )
    joined = grid.join(resampled, [*keys, bucket_col], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        joined.withColumn(
            f"{value_col}_filled", F.last(value_col, ignorenulls=True).over(w)
        )
        .withColumn("is_gap", F.col(value_col).isNull())
    )


def rolling_zscore(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    lookback: int = 7,
) -> DataFrame:
    """Trailing-window anomaly score: how far the current value sits
    from the mean of the previous ``lookback`` observations, in units
    of their sample standard deviation.

    The window is ``ROWS BETWEEN lookback PRECEDING AND 1 PRECEDING``
    — strictly historical, so the current value never contaminates its
    own baseline (the standard leakage bug in rolling anomaly checks).
    ``zscore`` is null until 2+ history rows exist or when the history
    is constant (std = 0).

    One shuffle on ``keys`` + per-key sort; the frame is bounded so
    Spark keeps O(lookback) rows of state per partition — this is the
    plan shape that survives 100 TB (contrast an unbounded frame,
    which buffers each key's full history).
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(-lookback, -1)
    )
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    return df.select(
        *keys,
        order_col,
        value_col,
        mean.alias("baseline_mean"),
        std.alias("baseline_std"),
        F.when(std > 0, (F.col(value_col) - mean) / std).alias("zscore"),
    )


def ewma(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.5,
    lags: int = 7,
    out_col: str = "ewma",
    round_to: int = 6,
) -> DataFrame:
    """Exponentially-weighted moving average as a FIXED-LAG linear
    filter: ewma_t = Σ_{i=0..lags-1} w_i·x_{t-i} / Σ w_i over the lags
    that exist, with w_i = α·(1-α)^i.

    True EWMA is an infinite recursion no SQL window expresses; at
    α=0.5 the truncated tail past 7 lags carries <1% of the weight, and
    truncation buys what the recursion can't give: a deterministic,
    engine-portable, single-window formulation.  All ``lags`` lag()
    calls share one window spec, so CollapseWindow plans ONE Sort +
    Window regardless of lag count (the as-of join lesson); the
    weighted sum adds terms in fixed textual order (float addition is
    not associative).  Series boundaries renormalize by the weights of
    the PRESENT lags — the first row's ewma equals its own value, not a
    zero-padded underestimate.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(ts_col)
    weights = [alpha * (1.0 - alpha) ** i for i in range(lags)]
    lag_cols = [F.lag(value_col, i).over(w) for i in range(lags)]
    num = None
    den = None
    for wi, lc in zip(weights, lag_cols):
        term = F.when(lc.isNotNull(), F.lit(wi) * lc).otherwise(F.lit(0.0))
        mass = F.when(lc.isNotNull(), F.lit(wi)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = mass if den is None else den + mass
    return df.withColumn(
        out_col,
        F.when(den > 0, F.round(num / den, round_to)),
    )


def interarrival_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak: tuple[str, ...] = ("event_id",),
    min_gaps: int = 5,
) -> DataFrame:
    """Per-key inter-arrival gap statistics and the Goh-Barabási
    burstiness parameter B = (σ-μ)/(σ+μ): B→-1 periodic, B→0 Poisson,
    B→+1 bursty — the temporal-pattern profile complementing the
    duration-based session operators.

    Returns (key, n_gaps, mean_gap_s, sd_gap_s, cv, burstiness), keys
    with fewer than ``min_gaps`` gaps or an all-zero gap series
    dropped.  Gaps diff at MICROSECOND resolution (``timestampdiff``
    and DuckDB's ``date_diff('microsecond')`` agree exactly there,
    unlike second-level truncation-vs-boundary-crossing semantics);
    ordering is (ts, *tiebreak) so equal timestamps break ties
    deterministically.  One window pass partitioned on the key + one
    hash agg on the same key — a single shuffle, map-side partials.
    """
    events = df.where(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
    w = Window.partitionBy(key_col).orderBy(ts_col, *tiebreak)
    gaps = (
        events.select(key_col, ts_col, *tiebreak)
        .withColumn("_prev_ts", F.lag(ts_col).over(w))
        .where(F.col("_prev_ts").isNotNull())
        .withColumn(
            "gap_s",
            F.expr(f"timestampdiff(MICROSECOND, _prev_ts, `{ts_col}`)")
            / F.lit(1000000.0),
        )
    )
    mu, sd = F.avg("gap_s"), F.stddev_samp("gap_s")
    return (
        gaps.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(mu, 3).alias("mean_gap_s"),
            F.round(sd, 3).alias("sd_gap_s"),
            F.round(sd / mu, 6).alias("cv"),
            F.round((sd - mu) / (sd + mu), 6).alias("burstiness"),
            mu.alias("_mu"),
        )
        .where((F.col("n_gaps") >= min_gaps) & (F.col("_mu") > 0))
        .drop("_mu")
    )
