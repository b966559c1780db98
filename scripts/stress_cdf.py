#!/usr/bin/env python
"""Scale probe for the bucket-pruned change data feed
(lake/table.VersionedTable.changes): build an N-row table at B
buckets, upsert a batch confined to ONE bucket, then time the CDF
read.  The pruned form reads only the changed bucket's files in both
versions; the unpruned comparison diffs the full snapshots (what
changes() did before round 4).  One JSON line per probe.

Usage: python scripts/stress_cdf.py [n_rows] [n_buckets]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark.lake.table import VersionedTable
from nasa_asteroid_data_lakehouse_spark.session import get_spark


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    spark = get_spark(app_name="stress-cdf", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="ndl_stress_cdf_")
    try:
        df = spark.range(n_rows).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("double").alias("m"),
            F.concat(F.lit("v"), F.col("id")).alias("val"),
        )
        t = VersionedTable(spark, f"{tmp}/tbl", num_buckets=n_buckets)
        t0 = time.time()
        t.create(df, keys=["k"])
        t_create = time.time() - t0

        # incoming confined to ONE hash bucket (the skewed-upsert case
        # the pruning exists for)
        incoming = (
            df.withColumn(
                "__b", F.pmod(F.xxhash64("k"), F.lit(n_buckets))
            )
            .where(F.col("__b") == 0)
            .drop("__b")
            .withColumn("m", F.col("m") + 1.0)
            .limit(5000)
        )
        n_incoming = incoming.count()
        t0 = time.time()
        t.upsert(incoming)
        t_upsert = time.time() - t0

        t0 = time.time()
        n_changes = t.changes(0, 1).count()
        t_pruned = time.time() - t0

        # unpruned comparison: same single-pass join over the FULL
        # snapshots (what a no-manifest-diff CDF must do)
        t0 = time.time()
        old, new = t.read(0), t.read(1)
        keys = ["k"]
        non_keys = [c for c in new.columns if c not in keys]
        old_side = old.select(
            *keys, *[F.col(c).alias(f"__old_{c}") for c in non_keys]
        ).withColumn("__in_old", F.lit(1))
        new_side = new.select(*keys, *non_keys).withColumn("__in_new", F.lit(1))
        j = new_side.join(old_side, on=keys, how="full_outer")
        diff = F.lit(False)
        for c in non_keys:
            diff = diff | ~F.col(c).eqNullSafe(F.col(f"__old_{c}"))
        n_full = j.where(
            F.col("__in_old").isNull() | F.col("__in_new").isNull() | diff
        ).count()
        t_full = time.time() - t0

        print(
            json.dumps(
                {
                    "probe": "cdf_bucket_pruning",
                    "n_rows": n_rows,
                    "n_buckets": n_buckets,
                    "n_incoming": n_incoming,
                    "n_changes": n_changes,
                    "n_changes_fullscan": n_full,
                    "create_sec": round(t_create, 2),
                    "upsert_sec": round(t_upsert, 2),
                    "changes_pruned_sec": round(t_pruned, 2),
                    "changes_fullscan_sec": round(t_full, 2),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
