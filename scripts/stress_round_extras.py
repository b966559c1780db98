#!/usr/bin/env python
"""Scale probes for the round-1 batch-2 operators: SCD2 compression,
rolling z-score, funnel, heavy hitters, blocked fuzzy matching, DQ
expectations, file-skipping stats.  Synthetic data generated
distributed via spark.range (nothing collects to the driver); one JSON
line per probe.

Usage: python scripts/stress_round_extras.py [rows_events] [rows_orders]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark.session import get_spark


def synth_events(spark, n, n_users=200_000):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.pmod(F.xxhash64("id"), n_users)).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.pmod(F.xxhash64("id", F.lit(1)), 30 * 86400)
        ).alias("ts"),
        F.element_at(
            F.array(*[F.lit(s) for s in ["signup", "view", "click", "purchase", "error"]]),
            (F.pmod(F.xxhash64("id", F.lit(2)), 5) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(3)), 10_000) / 100.0).alias("value"),
    )


def synth_orders(spark, n, n_cust=500_000):
    return spark.range(n).select(
        F.col("id").alias("o_orderkey"),
        # zipf-ish hot customer: 20% of orders to one key
        F.when(F.pmod(F.xxhash64("id"), 5) == 0, F.lit(7))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), n_cust))
        .alias("o_custkey"),
        (F.pmod(F.xxhash64("id", F.lit(2)), 50_000_000) / 100.0).alias(
            "o_totalprice"
        ),
        F.date_add(
            F.lit("1995-01-01").cast("date"),
            F.pmod(F.xxhash64("id", F.lit(3)), 2400).cast("int"),
        ).alias("o_orderdate"),
    )


def timed(label, df, results):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    results.append({"probe": label, "sec": round(time.perf_counter() - t0, 2)})
    print(json.dumps(results[-1]), flush=True)


def main():
    rows_events = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    rows_orders = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
    spark = get_spark(app_name="stress-extras", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    results: list[dict] = []

    events = synth_events(spark, rows_events).localCheckpoint(eager=True)
    orders = synth_orders(spark, rows_orders).localCheckpoint(eager=True)

    from nasa_asteroid_data_lakehouse_spark.operators.scd import scd2_compress

    timed(
        f"scd2_compress {rows_events:,} events / 200k users",
        scd2_compress(events, ["user_id"], "event_type", "ts", tiebreak=["event_id"]),
        results,
    )

    from nasa_asteroid_data_lakehouse_spark.operators.timeseries import (
        resample,
        rolling_zscore,
    )

    daily = resample(
        events, "ts", ["event_type"], [F.count(F.lit(1)).alias("n")], "1 hour"
    )
    timed(
        f"resample+rolling_zscore {rows_events:,} events -> hourly",
        rolling_zscore(daily, ["event_type"], "bucket_ts", "n", lookback=24),
        results,
    )

    from nasa_asteroid_data_lakehouse_spark.operators.skew import heavy_hitters

    timed(
        f"heavy_hitters {rows_orders:,} orders (20% hot key)",
        heavy_hitters(orders, ["o_custkey"], top_n=20),
        results,
    )

    from nasa_asteroid_data_lakehouse_spark.operators import expectations as ex

    rules = {
        "key_not_null": F.col("o_orderkey").isNotNull(),
        "price_positive": F.col("o_totalprice") > 0,
        "date_in_range": F.col("o_orderdate").between("1990-01-01", "2005-12-31"),
    }
    timed(
        f"dq_check_3rules {rows_orders:,} orders (one scan)",
        ex.check(orders, rules),
        results,
    )
    timed(
        f"dq_check_unique {rows_orders:,} orders",
        ex.check_unique(orders, ["o_orderkey"]),
        results,
    )

    # funnel over the synthetic events (per-step frontier broadcast)
    def step(prev, etype, prev_ts, out_ts):
        return (
            events.where(F.col("event_type") == etype)
            .join(F.broadcast(prev), "user_id")
            .where(
                (F.col("ts") > F.col(prev_ts))
                & (F.col("ts") <= F.col(prev_ts) + F.expr("INTERVAL 24 HOURS"))
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_ts))
        )

    s1 = (
        events.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = step(s1, "view", "t1", "t2")
    s3 = step(s2, "click", "t2", "t3")
    timed(f"funnel_3steps {rows_events:,} events / 200k users", s3, results)

    # temporal joins (operators/temporal.py) at full event volume
    from nasa_asteroid_data_lakehouse_spark.operators.temporal import (
        asof_join,
        range_join,
    )

    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.col("value").alias("p_value")
    )
    views = events.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("v_value")
    )
    timed(
        f"asof_join {rows_events:,} events (purchase<-view, 1 window shuffle)",
        asof_join(purchases, views, ["user_id"], "ts", "ts"),
        results,
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("value").alias("c_value")
    )
    timed(
        f"range_join {rows_events:,} events (purchase->click 1h, equi-driven)",
        range_join(
            purchases.withColumnRenamed("ts", "p_ts"),
            clicks,
            ["user_id"],
            "p_ts",
            "c_ts",
        ),
        results,
    )

    total = round(sum(r["sec"] for r in results), 2)
    print(json.dumps({"probe": "TOTAL", "sec": total}))


if __name__ == "__main__":
    main()
