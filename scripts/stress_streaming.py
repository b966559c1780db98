#!/usr/bin/env python
"""Streaming-fold scale probe: 1M synthetic events through the
exactly-once incremental rollup sink in 8 micro-batches; asserts the
maintained table equals the one-shot batch aggregate and prints wall
times.  Evidence for BASELINE.md (streaming family measured probes).

Usage: python scripts/stress_streaming.py [n_rows] [n_batches]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark.session import get_spark
from nasa_asteroid_data_lakehouse_spark.streaming.rollup import (
    incremental_rollup_sink,
)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(app_name="stress-streaming", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.range(n_rows).select(
        F.to_date(
            F.expr("date_add(DATE '2024-01-01', CAST(id % 365 AS INT))")
        ).alias("day"),
        F.concat(F.lit("type_"), (F.col("id") % 20).cast("string")).alias(
            "event_type"
        ),
        (F.col("id") % 99_991).alias("user_id"),
    )

    tmp = tempfile.mkdtemp(prefix="ndl_stress_stream_")
    try:
        src = f"{tmp}/in"
        t0 = time.perf_counter()
        ev.repartition(n_batches).write.parquet(src)
        t_write = time.perf_counter() - t0

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        root = f"{tmp}/rollup"
        t0 = time.perf_counter()
        q = (
            incremental_rollup_sink(
                spark, stream, root, ["day", "event_type"], "user_id"
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        t_stream = time.perf_counter() - t0

        got = (
            spark.read.parquet(f"{root}/data")
            .orderBy("day", "event_type")
            .collect()
        )
        want = (
            ev.groupBy("day", "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count("user_id").alias("n_vals"),
                F.sum("user_id").alias("sum_val"),
                F.min("user_id").alias("min_val"),
                F.max("user_id").alias("max_val"),
            )
            .orderBy("day", "event_type")
            .collect()
        )
        assert [tuple(r) for r in got] == [tuple(r) for r in want], (
            "fold != one-shot batch aggregate"
        )
        per_batch = t_stream / n_batches
        print(
            f"OK rows={n_rows} batches={n_batches} groups={len(got)} "
            f"write={t_write:.1f}s stream_total={t_stream:.1f}s "
            f"per_batch={per_batch:.2f}s"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
