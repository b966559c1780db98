#!/usr/bin/env python
"""Scale probes for the statistical-mining + tokenizer family:
BPE pair counting over 1M synthetic docs (~60M-token stream),
shuffle-manifest export at 1M ids, market-basket pairs over a 20M-row
synthetic order-lines table, equi-depth histogram / Benford / CUSUM /
A/B readout over 20M rows.  Synthetic data generated distributed via
spark.range (nothing collects to the driver); one JSON line per probe.

Usage: python scripts/stress_stats.py [n_docs] [n_rows]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark.llm import sharding, tokenizer
from nasa_asteroid_data_lakehouse_spark.operators import stats
from nasa_asteroid_data_lakehouse_spark.session import get_spark
from scripts.stress_corpus_stats import synth_events
from scripts.stress_curation import probe, synth_docs


def synth_lines(spark, n, n_orders=None, n_items=200_000):
    """Order-lines: ~4 lines/order, bounded per-order fan-out (the
    property market-basket's group self-join relies on)."""
    n_orders = n_orders or max(n // 4, 1)
    return spark.range(n).select(
        F.pmod(F.xxhash64("id"), n_orders).alias("l_orderkey"),
        F.pmod(F.xxhash64("id", F.lit(3)), n_items).alias("l_partkey"),
        (F.pmod(F.xxhash64("id", F.lit(5)), 9_999_000) / 100.0 + 10.0).alias(
            "price"
        ),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000

    spark = get_spark(app_name="stress-stats", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = synth_docs(spark, n_docs).localCheckpoint()
    lines = synth_lines(spark, n_rows).localCheckpoint()
    events = synth_events(spark, n_rows).localCheckpoint()

    probe("bpe_pair_counts_1M", lambda: tokenizer.pair_counts(docs))

    def manifest():
        keyed = docs.select(
            "doc_id",
            sharding.shard_id("doc_id", 1024).alias("shard"),
            sharding.shuffle_order("doc_id").alias("k"),
        )
        w = Window.partitionBy("shard").orderBy("k", "doc_id")
        return keyed.withColumn("pos", F.row_number().over(w))

    probe("shuffle_manifest_1M_1024shards", manifest)

    probe(
        "market_basket_20M",
        lambda: stats.basket_pairs(lines, "l_orderkey", "l_partkey"),
    )
    probe(
        "equidepth_histogram_20M_exact",
        lambda: stats.equidepth_histogram(lines, "price", buckets=10),
    )
    probe(
        "equidepth_histogram_20M_sketch",
        lambda: stats.equidepth_histogram(
            lines, "price", buckets=10, exact=False
        ),
    )
    probe("benford_20M", lambda: stats.benford_profile(lines, "price"))

    def cusum_daily():
        daily = events.groupBy(F.to_date("ts").alias("day")).agg(
            F.count(F.lit(1)).alias("n")
        )
        return stats.cusum(daily, "day", "n")

    probe("cusum_daily_20M", cusum_daily)

    spark.stop()


if __name__ == "__main__":
    main()
