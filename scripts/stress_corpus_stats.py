#!/usr/bin/env python
"""Scale probes for the corpus-distribution statistics family:
unigram surprisal, per-group KL divergence, Zipf slope (1M synthetic
docs) and per-key inter-arrival burstiness (20M synthetic events).
Synthetic data generated distributed via spark.range (nothing collects
to the driver); one JSON line per probe.

Usage: python scripts/stress_corpus_stats.py [n_docs] [n_events]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark.llm import corpus_stats, curation
from nasa_asteroid_data_lakehouse_spark.operators.timeseries import interarrival_stats
from nasa_asteroid_data_lakehouse_spark.session import get_spark
from scripts.stress_curation import probe, synth_docs


def synth_events(spark, n, n_users=200_000):
    """Events with hash-jittered microsecond timestamps over 30 days;
    ~n/n_users events per user."""
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id"), n_users).alias("user_id"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(
                secs=(F.pmod(F.xxhash64("id", F.lit(7)), 2_592_000_000_000) / 1e6)
            )
        ).alias("ts"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000

    spark = get_spark(app_name="stress-corpus-stats", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = synth_docs(spark, n_docs).localCheckpoint()
    events = synth_events(spark, n_events).localCheckpoint()

    probe("unigram_surprisal_1M", lambda: corpus_stats.unigram_surprisal(docs))
    probe("kl_by_group_1M", lambda: corpus_stats.kl_by_group(docs, "source"))
    probe("jsd_pairs_1M_40src", lambda: corpus_stats.jsd_pairs(docs, "source"))
    probe(
        "token_entropy_1M",
        lambda: corpus_stats.token_entropy_by_group(docs, "source"),
    )
    probe("zipf_slope_1M", lambda: corpus_stats.zipf_slope(docs))
    probe(
        "boilerplate_strip_1M",
        lambda: curation.strip_ubiquitous_tokens(docs),
    )
    probe(
        "interarrival_stats_20M",
        lambda: interarrival_stats(events, "user_id", "ts", ("event_id",)),
    )
    spark.stop()


if __name__ == "__main__":
    main()
