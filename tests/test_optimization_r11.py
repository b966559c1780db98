"""Pins for the round-11 optimization internals.

Each test pins the EQUIVALENCE CONTRACT an optimization relies on, so a
later refactor cannot silently break it:

* ``write_time_quartile_batches`` — one-job writer produces the same
  batch partition (per-file row sets == percentile-cut quartiles) with
  strictly increasing pinned mtimes, exactly one file per non-empty
  quartile.
* ``scaled_stream_shuffle`` — data-adaptive, capped at the session
  setting, always restored (also on error).
* ``_row_set_mismatch`` — the single full-outer audit equals the
  anti-join pair, including NULL payload columns and duplicate rows.
* ``table_changes`` snapshot-diff size guard — fails closed with a
  clear driver-side error, never an executor OOM.
* ``_walk_stream_markers`` — mixed-era lineages: pre-fold markers
  BELOW a folded map are still absorbed (the walk continues past
  folded maps, max-merging).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark.scratch import scratch_dir
from nasa_asteroid_data_lakehouse_spark.streaming.tuning import (
    BYTES_PER_STATE_PARTITION,
    scaled_stream_shuffle,
    stream_partitions,
    write_time_quartile_batches,
)


def test_quartile_batch_writer_matches_cut_assignment(spark):
    import shutil

    df = spark.range(0, 1000).select(
        F.col("id").alias("event_id"),
        (F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 60)).alias(
            "ts"
        ),
    )
    out = scratch_dir("ndl_test_qb_")
    try:
        path = f"{out}/in"
        write_time_quartile_batches(df, path)
        files = sorted(
            (os.path.getmtime(os.path.join(path, f)), f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        assert len(files) == 4
        mtimes = [m for m, _ in files]
        assert mtimes == sorted(mtimes) and len(set(mtimes)) == 4
        # per-file row sets equal the percentile-cut quartile assignment
        cuts = df.agg(
            F.expr(
                "percentile(cast(ts as double), array(0.25, 0.5, 0.75))"
            ).alias("cs")
        ).collect()[0]["cs"]
        b_col = F.lit(1)
        for c in cuts:
            b_col = b_col + F.when(
                F.col("ts").cast("double") > F.lit(c), 1
            ).otherwise(0)
        want = {
            b: {r["event_id"] for r in rows}
            for b, rows in (
                (b, df.withColumn("__b", b_col).where(F.col("__b") == b)
                 .select("event_id").collect())
                for b in range(1, 5)
            )
        }
        for i, (_, name) in enumerate(files, start=1):
            got = {
                r["event_id"]
                for r in spark.read.parquet(os.path.join(path, name)).collect()
            }
            assert got == want[i], f"batch {i} content mismatch"
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_quartile_batch_writer_degenerate_equal_timestamps(spark):
    import shutil

    df = spark.range(0, 50).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1_700_000_000)).alias("ts"),
    )
    out = scratch_dir("ndl_test_qbd_")
    try:
        path = f"{out}/in"
        write_time_quartile_batches(df, path)
        files = [f for f in os.listdir(path) if f.endswith(".parquet")]
        # all-equal timestamps collapse every row into quartile 1; empty
        # quartiles write no file
        assert len(files) == 1
        assert spark.read.parquet(path).count() == 50
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_scaled_stream_shuffle_is_adaptive_and_restores(spark, tmp_path):
    p = tmp_path / "blob.bin"
    p.write_bytes(b"x" * (3 * BYTES_PER_STATE_PARTITION))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    with scaled_stream_shuffle(spark, str(p)):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
    assert spark.conf.get("spark.sql.shuffle.partitions") == old
    # capped at the session value, floored at the minimum
    assert stream_partitions(spark, 10**15) == int(old)
    assert stream_partitions(spark, 0) == 2
    # restored on error too
    with pytest.raises(RuntimeError):
        with scaled_stream_shuffle(spark, str(p)):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == old


def test_row_set_mismatch_equals_anti_join_pair(spark):
    from nasa_asteroid_data_lakehouse_spark.plans.r10_queries import (
        _row_set_mismatch,
    )

    got = spark.createDataFrame(
        [(1, 10), (2, None), (2, None), (3, 30), (None, 5)],
        "k bigint, v bigint",
    )
    want = spark.createDataFrame(
        [(1, 10), (2, None), (4, 40), (None, 5), (None, 6)],
        "k bigint, v bigint",
    )

    def anti(a, b):
        return a.join(
            b,
            on=(a["k"].eqNullSafe(b["k"])) & (a["v"].eqNullSafe(b["v"])),
            how="left_anti",
        ).count()

    assert _row_set_mismatch(got, want, ["k", "v"]) == (
        anti(got, want) + anti(want, got)
    )
    # identical sets -> 0 (incl. NULL rows)
    assert _row_set_mismatch(got, got, ["k", "v"]) == 0


def test_cdf_snapshot_diff_size_guard_fails_closed(spark):
    import shutil

    from nasa_asteroid_data_lakehouse_spark.lake.table import VersionedTable
    from nasa_asteroid_data_lakehouse_spark.sources import cdf_stream

    cdf_stream.register(spark)
    tmp = scratch_dir("ndl_test_sg_")
    try:
        t = VersionedTable(spark, f"{tmp}/t", num_buckets=4)
        base = spark.range(0, 200).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        )
        t.create(base, keys=["k"])
        t.upsert(base.where(F.col("k") % 3 == 0))
        t.rebucket(8)
        t.restore(1)  # the one data-change commit crossing bucket spaces
        v_restore = t.latest_version()
        with pytest.raises(Exception, match="whole-snapshot diff"):
            (
                spark.read.format("table_changes")
                .option("path", t.root)
                .option("from_version", v_restore - 1)
                .option("to_version", v_restore)
                .option("snapshot_diff_max_bytes", 1)
                .load()
                .count()
            )
        # generous default bound: the same feed answers
        n = (
            spark.read.format("table_changes")
            .option("path", t.root)
            .option("from_version", v_restore - 1)
            .option("to_version", v_restore)
            .load()
            .count()
        )
        assert n >= 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_legacy_manifest_missing_num_buckets_falls_through(spark):
    import shutil

    from nasa_asteroid_data_lakehouse_spark.lake.table import VersionedTable
    from nasa_asteroid_data_lakehouse_spark.sources import cdf_stream

    cdf_stream.register(spark)
    tmp = scratch_dir("ndl_test_legacy_")
    try:
        t = VersionedTable(spark, f"{tmp}/t", num_buckets=4)
        base = spark.range(0, 50).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        )
        t.create(base, keys=["k"])
        t.upsert(base.where(F.col("k") % 5 == 0).select("k", (F.col("v") + 1).alias("v")))
        # simulate a legacy-era manifest: strip num_buckets from v0
        mpath = t._manifest_path(0)
        m = json.load(open(mpath))
        del m["num_buckets"]
        json.dump(m, open(mpath, "w"))
        # ADVICE r10 #3: must plan the name-paired per-bucket diff, not
        # crash on the missing field
        n = (
            spark.read.format("table_changes")
            .option("path", t.root)
            .option("from_version", 0)
            .option("to_version", 1)
            .load()
            .count()
        )
        assert n == base.where(F.col("k") % 5 == 0).count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_walk_stream_markers_continues_past_folded_maps(spark):
    import shutil

    from nasa_asteroid_data_lakehouse_spark.lake.table import VersionedTable

    tmp = scratch_dir("ndl_test_walk_")
    try:
        t = VersionedTable(spark, f"{tmp}/t", num_buckets=2)
        base = spark.range(0, 20).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("v")
        )
        t.create(base, keys=["k"])
        t.upsert(base.limit(5), extra_meta={"stream_txn": {"app_id": "a", "batch_id": 7}})
        t.upsert(base.limit(3), extra_meta={"stream_txn": {"app_id": "b", "batch_id": 2}})
        # Simulate a PRE-FIX mixed-era lineage: v2's folded map never
        # absorbed v1's marker for app "a"
        m2path = t._manifest_path(2)
        m2 = json.load(open(m2path))
        assert m2["stream_txn_watermarks"] == {"a": 7, "b": 2}
        m2["stream_txn_watermarks"] = {"b": 2}
        json.dump(m2, open(m2path, "w"))
        walked = t._walk_stream_markers(2)
        assert walked == {"a": 7, "b": 2}, (
            "pre-fold marker below a folded map must be absorbed "
            "(ADVICE r10 #1)"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
