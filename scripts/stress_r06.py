#!/usr/bin/env python
"""Scale probes for the round-6 STAGED batch (plans/r06_queries.py):
the shapes whose cost grows with the corpus, run end-to-end from real
parquet so the registered query functions are what gets timed.

- pca_power_iteration / pca_two_components at 1M vectors: the ONE
  corpus-moment shuffle + bounded 8x8 iterations claim.
- ks_matrix at 1M docs x 40 sources: the dense sources x distinct-lens
  ECDF grid (the bounded-grid claim).
- stylometry delta at 1M docs x 40 sources (780 pairs x 30 tokens).
- calibration curve + shrunk dup rates at 1M docs (sha2 dup-group
  shuffle + bounded-bin rollup).
- Kaplan-Meier / stump / Markov / STL / gumbel at 20M events / 2M
  orders: one corpus shuffle each, bounded-domain windows after.

Usage: python scripts/stress_r06.py [n_docs] [n_vecs] [n_events] [n_orders]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark.plans import r06_queries as r6
from nasa_asteroid_data_lakehouse_spark.session import get_spark
from scripts.stress_curation import probe, synth_docs, synth_vecs
from scripts.stress_corpus_stats import synth_events


def synth_orders(spark, n, n_cust=100_000):
    return spark.range(n).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.xxhash64("id"), n_cust).alias("o_custkey"),
        F.lit("O").alias("o_orderstatus"),
        (F.pmod(F.xxhash64("id", F.lit(3)), 1_000_000) / 100.0 + 1.0).alias(
            "o_totalprice"
        ),
        (
            F.to_timestamp(F.lit("1995-01-01 00:00:00"))
            + F.make_interval(
                days=F.pmod(F.xxhash64("id", F.lit(5)), 2400).cast("int")
            )
        ).alias("o_orderdate"),
        F.lit("1-URGENT").alias("o_orderpriority"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    n_events = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000_000
    n_orders = int(sys.argv[4]) if len(sys.argv) > 4 else 2_000_000

    spark = get_spark(app_name="stress-r06", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    sf = tempfile.mkdtemp(prefix="ndl_stress_r06_")
    synth_docs(spark, n_docs).withColumn(
        "n_chars", F.length("text").cast("bigint")
    ).write.parquet(f"{sf}/documents.parquet")
    synth_vecs(spark, n_vecs, 64).write.parquet(f"{sf}/embeddings.parquet")
    synth_events(spark, n_events).select(
        "event_id",
        "ts",
        "user_id",
        F.element_at(
            F.array(
                F.lit("view"), F.lit("click"), F.lit("purchase"),
                F.lit("signup"), F.lit("error"),
            ),
            (F.pmod(F.xxhash64("event_id", F.lit(11)), 5) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64("event_id", F.lit(13)), 10_000) / 10.0).alias(
            "value"
        ),
        F.lit(None).cast("string").alias("props"),
    ).write.parquet(f"{sf}/events.parquet")
    synth_orders(spark, n_orders).write.parquet(f"{sf}/orders.parquet")

    probe(
        f"pca_power_iteration_{n_vecs}",
        lambda: r6.pca_power_iteration_embeddings(spark, sf),
    )
    probe(
        f"pca_two_components_{n_vecs}",
        lambda: r6.pca_two_components_embeddings(spark, sf),
    )
    probe(f"ks_matrix_{n_docs}_40src", lambda: r6.ks_matrix_sources(spark, sf))
    probe(
        f"stylometry_delta_{n_docs}_40src",
        lambda: r6.stylometry_delta_sources(spark, sf),
    )
    probe(
        f"calibration_curve_{n_docs}",
        lambda: r6.calibration_curve_documents(spark, sf),
    )
    probe(
        f"shrunk_dup_rates_{n_docs}",
        lambda: r6.shrunk_dup_rates_sources(spark, sf),
    )
    probe(
        f"good_turing_{n_docs}", lambda: r6.good_turing_documents(spark, sf)
    )
    probe(
        f"markov_stationary_{n_events}",
        lambda: r6.markov_stationary_events(spark, sf),
    )
    probe(
        f"stump_split_{n_events}", lambda: r6.stump_split_events(spark, sf)
    )
    probe(
        f"stl_decomposition_{n_events}",
        lambda: r6.stl_decomposition_daily_events(spark, sf),
    )
    probe(
        f"gumbel_fit_{n_events}",
        lambda: r6.gumbel_fit_daily_events(spark, sf),
    )
    probe(
        f"kaplan_meier_{n_orders}", lambda: r6.kaplan_meier_orders(spark, sf)
    )
    probe(
        f"hill_tail_index_{n_orders}",
        lambda: r6.hill_tail_index_orders(spark, sf),
    )
    print(f"(fixture left at {sf}; /tmp is session-scoped)")


if __name__ == "__main__":
    main()
