"""Small-file compaction — the OPTIMIZE / bin-packing maintenance pass.

Streaming micro-batches, incremental merges, and over-parallel writers
leave lakehouse tables as thousands of small parquet files; every
downstream scan then pays one task + one footer-read per file, and at
100 TB the NameNode/list-objects round trips alone dominate.  This
module measures a table's file-size distribution from the ``_metadata``
hidden columns (no filesystem walk — the same listing the scan already
does) and rewrites it into files near a target size with a staged,
atomic swap (reusing the local-FS rename protocol of
``operators/merge.save_or_update_table``; on object stores the swap is
a manifest pointer update — see ``lake/table.VersionedTable``).

Reference parity: the reference has no maintenance story at all — its
tables are whatever ``df.write`` left behind (``src/utils/bucket.py``);
this is net-new surface a production lakehouse needs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_size_report(spark: SparkSession, path: str) -> DataFrame:
    """Per-file size stats via the ``_metadata`` hidden column — one
    metadata-only pass, no data columns read.  Keyed on the full file
    path (basenames can collide across writers — see lake/stats.py)."""
    return (
        spark.read.parquet(path)
        .select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.file_size").alias("file_size"),
        )
        .groupBy("file_path", "file_size")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def compaction_plan(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> dict:
    """How fragmented is the table, and what would compaction do?

    Returns n_files / total_bytes / n_small (files under half target)
    / target_files.  Driver-side result is a handful of scalars — the
    file listing itself is distributed."""
    stats = (
        file_size_report(spark, path)
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("file_size").alias("total_bytes"),
            F.sum(
                F.when(F.col("file_size") < target_file_bytes // 2, 1).otherwise(0)
            ).alias("n_small"),
        )
        .first()
    )
    target_files = max(1, math.ceil((stats["total_bytes"] or 0) / target_file_bytes))
    return {
        "n_files": stats["n_files"],
        "total_bytes": stats["total_bytes"],
        "n_small": stats["n_small"],
        "target_files": target_files,
    }


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
    min_small_files: int = 2,
) -> dict:
    """Rewrite the table at ``path`` into ~target-sized files.

    No-op (returns the plan with ``compacted: False``) unless at least
    ``min_small_files`` files sit under half the target — compaction
    that rewrites one big file is pure write amplification.  With
    ``sort_by``, rows are range-partitioned and sorted within files on
    those columns (restores clustering that incremental appends
    destroyed, so min/max pruning works again — pair with
    ``lake/zorder`` for multi-column locality).  The rewrite is staged
    to a sibling directory and swapped in via
    ``operators/merge.staged_swap`` (failed writes are cleaned up, a
    failed swap restores the backup; see that helper's docstring for
    the POSIX-rename atomicity caveat — readers in the rename window
    can miss the path, and the real fix is a manifest pointer).
    """
    plan = compaction_plan(spark, path, target_file_bytes)
    if plan["n_small"] < min_small_files:
        return {**plan, "compacted": False}

    df = spark.read.parquet(path)
    n = plan["target_files"]
    if sort_by:
        out = df.repartitionByRange(n, *sort_by).sortWithinPartitions(*sort_by)
    else:
        out = df.repartition(n)

    from nasa_asteroid_data_lakehouse_spark.operators.merge import staged_swap

    staged_swap(path, lambda staging: out.write.mode("overwrite").parquet(staging))
    return {**plan, "compacted": True}
