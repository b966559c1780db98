"""Bucketed tables: pre-shuffled storage for co-located joins.

Writing both sides of a recurring join bucketed by the join key (same
bucket count) lets Spark plan a SortMergeJoin with ZERO exchanges — the
shuffle is paid once at write time instead of on every query.  This is
the storage-level answer to the biggest recurring cost in star-join
workloads at 100 TB.

Bucketing requires the session catalog (``saveAsTable``); paths-only
parquet can't carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int = 16,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle exchange (inspect
    after joins over bucketed tables: should be False when bucketing is
    being exploited)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan
