"""Incrementally-maintained aggregate table (streaming materialized
view): each micro-batch folds its ALGEBRAIC partial aggregates
(count / sum / min / max — merge = the same op over partials) into a
persistent rollup keyed on the group columns.

Exactly-once across replays WITHOUT relying on sink idempotence: the
set of applied batch ids lives INSIDE the same atomically-swapped
table root as the data (``root/data`` + ``root/applied``), so a batch
and its marker commit together — a replayed foreachBatch invocation
sees its id already applied and is a no-op, and a crash between write
and swap leaves the previous consistent (data, applied) pair intact.

At scale the merge cost per batch is O(|state| + |batch groups|) — a
union of two pre-aggregated tables re-aggregated on the group key,
one shuffle; the raw stream is never re-scanned.  For very large key
cardinality, swap the full-rewrite merge for the bucket-level upsert
(``lake/table.VersionedTable``) — the per-batch delta usually touches
few buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark.operators.merge import (
    read_table_if_exists,
    staged_swap,
)

__all__ = [
    "rollup_partial",
    "merge_partials",
    "fold_mergeable_batch",
    "fold_rollup_batch",
    "incremental_rollup_sink",
    "incremental_cms_sink",
    "changepoint_monitor_sink",
]


def rollup_partial(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Algebraic partial aggregate of one batch: (keys, n_rows,
    n_vals, sum_val, min_val, max_val)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(value_col).alias("n_vals"),
        F.sum(value_col).alias("sum_val"),
        F.min(value_col).alias("min_val"),
        F.max(value_col).alias("max_val"),
    )


def merge_partials(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Fold two partial-aggregate tables: counts/sums add, min/max
    re-extremize; a key's all-NULL partial (NULL sum/min/max)
    contributes nothing, exactly as in a single-pass aggregation."""
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("n_vals").alias("n_vals"),
            F.sum("sum_val").alias("sum_val"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
        )
    )


def fold_mergeable_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    table_root: str,
    partial_fn,
    merge_fn,
) -> bool:
    """Fold one batch into ANY mergeable-aggregate table at
    ``table_root``: ``partial_fn(batch_df)`` produces the batch's
    partial-aggregate table, ``merge_fn(state, partial)`` folds it into
    the persisted state.  Returns False (no-op) when ``batch_id`` is
    already applied — the foreachBatch replay case.  Batch ids
    identify batches WITHIN one checkpoint lineage: reusing a table
    with a fresh checkpoint restarts ids at 0 and will wrongly skip
    new data — pair each table_root with exactly one checkpoint for
    its lifetime."""
    state = read_table_if_exists(spark, f"{table_root}/data")
    applied = read_table_if_exists(spark, f"{table_root}/applied")
    if applied is not None and applied.where(
        F.col("batch_id") == batch_id
    ).limit(1).count():
        return False
    partial = partial_fn(batch_df)
    merged = partial if state is None else merge_fn(state, partial)
    new_applied = spark.createDataFrame([(int(batch_id),)], "batch_id long")
    if applied is not None:
        new_applied = applied.unionByName(new_applied)

    # No pre-write checkpoint needed: both plans execute inside
    # write_to, which staged_swap runs BEFORE any rename — the state
    # they read is intact for the whole write.  (The former eager
    # checkpoints added two Spark jobs per micro-batch for nothing;
    # guide §1.2.)
    def write_to(staging: str) -> None:
        merged.write.mode("overwrite").parquet(f"{staging}/data")
        new_applied.write.mode("overwrite").parquet(f"{staging}/applied")

    if state is None and applied is None:
        write_to(table_root)
    else:
        staged_swap(table_root, write_to)
    return True


def fold_rollup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    table_root: str,
    keys: list[str],
    value_col: str,
) -> bool:
    """:func:`fold_mergeable_batch` specialized to the count/sum/min/
    max rollup."""
    return fold_mergeable_batch(
        spark,
        batch_df,
        batch_id,
        table_root,
        lambda b: rollup_partial(b, keys, value_col),
        lambda s, p: merge_partials(s, p, keys),
    )


def incremental_rollup_sink(
    spark: SparkSession,
    stream_df: DataFrame,
    table_root: str,
    keys: list[str],
    value_col: str,
    checkpoint: str | None = None,
):
    """Continuous rollup maintenance: per micro-batch, aggregate the
    batch, merge into ``table_root/data``, and commit the batch id to
    ``table_root/applied`` in the SAME atomic swap
    (:func:`fold_rollup_batch`).  Returns the unstarted
    ``DataStreamWriter`` (callers pick the trigger and call
    ``start()``), matching ``admit_stream``'s shape.

    Read the maintained view with ``spark.read.parquet(root + "/data")``
    — mean is derivable as sum_val / n_vals.
    """

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        fold_rollup_batch(spark, batch_df, batch_id, table_root, keys, value_col)

    return (
        stream_df.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint or f"{table_root}__checkpoint")
    )


def incremental_cms_sink(
    spark: SparkSession,
    stream_df: DataFrame,
    table_root: str,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms-v1",
    checkpoint: str | None = None,
):
    """Continuously-maintained count-min sketch: each micro-batch's
    depth×width counter table (operators/sketches.count_min_counters)
    merges into the persistent sketch by cell-wise sum.  CMS is a
    LINEAR sketch, so the merged counters equal a single-pass build
    over all delivered rows EXACTLY — the maintenance is lossless, and
    the state is depth×width rows regardless of how much data has
    streamed through.  Same atomic applied-marker protocol as
    :func:`incremental_rollup_sink`.  Query with
    operators/sketches.count_min_estimate over ``root + "/data"``.
    """
    from nasa_asteroid_data_lakehouse_spark.operators.sketches import (
        count_min_counters,
    )

    def merge_cells(state: DataFrame, partial: DataFrame) -> DataFrame:
        return (
            state.unionByName(partial)
            .groupBy("j", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        fold_mergeable_batch(
            spark,
            batch_df,
            batch_id,
            table_root,
            lambda b: count_min_counters(b, item_col, depth, width, seed),
            merge_cells,
        )

    return (
        stream_df.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint or f"{table_root}__checkpoint")
    )


def changepoint_monitor_sink(
    spark: SparkSession,
    stream_df: DataFrame,
    table_root: str,
    ts_col: str = "ts",
    checkpoint: str | None = None,
):
    """Streaming CUSUM changepoint screen
    (operators/stats.cusum composed over the incremental fold).

    Each micro-batch folds the per-day event-count rollup with the
    same atomic applied-marker protocol as
    :func:`incremental_rollup_sink` (replays never double-count),
    then recomputes the CUSUM screen over the MAINTAINED series and
    republishes it at ``table_root/cusum``.  The screen is a derived
    view of O(days)-bounded state — per-batch recomputation is exact
    and idempotent, so it carries no markers of its own, and the
    running-sum window only ever touches the bounded series, never
    the stream.  Read with ``spark.read.parquet(root + "/cusum")``;
    the ``is_peak`` rows are the current changepoint candidates.
    """
    from nasa_asteroid_data_lakehouse_spark.operators.stats import cusum

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        days = batch_df.where(F.col(ts_col).isNotNull()).select(
            F.to_date(ts_col).alias("day"), F.lit(1).alias("one")
        )
        fold_rollup_batch(spark, days, batch_id, table_root, ["day"], "one")
        state = spark.read.parquet(f"{table_root}/data")
        screen = cusum(
            state.select("day", F.col("n_rows").alias("n_events")),
            "day",
            "n_events",
        )
        view = f"{table_root}/cusum"
        # Probe via a read attempt, not a driver-local filesystem check
        # — table_root may be on a non-local filesystem (S3A/HDFS)
        # where os.path.exists is always False and the second batch's
        # plain write (errorifexists) would throw.  Same probe
        # fold_mergeable_batch uses.
        if read_table_if_exists(spark, view) is not None:
            staged_swap(view, lambda p: screen.write.parquet(p))
        else:
            screen.write.parquet(view)

    return (
        stream_df.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint or f"{table_root}__checkpoint")
    )
