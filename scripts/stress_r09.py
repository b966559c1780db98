#!/usr/bin/env python
"""Scale probes for the round-9 STAGED batch (plans/r09_queries.py):
end-to-end from real parquet so the staged query functions are what
gets timed.

- streaming_interval_join_replay at 1M events: stream-stream join with
  the span-sized watermark horizon — state covers the replayed span by
  design (the oracle-equality contract), so this probes the state
  store at 1M buffered rows across both sides.
- streaming_enrich_replay at 2M events x 200k-customer dim: per-batch
  broadcast join, zero stream shuffle.
- vacuum_retention / rebucket_roundtrip at 2M orders: full lake
  lifecycle (create + upsert + delete + vacuum / + rebucket 8->
  committed space) — bucket-keyed shuffles, bounded audits.
- ivf_nprobe_sweep at 1M vectors: one shared assignment + 5-anchor x N
  broadcast pair table, three rank-filter configs.
- mixture_temperature_sweep at 5M docs: one source-count aggregate,
  O(sources) output — should be scan-bound.

Usage: python scripts/stress_r09.py [n_events] [n_orders] [n_vecs] [n_docs]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark.plans import r09_queries as r9
from nasa_asteroid_data_lakehouse_spark.session import get_spark
from scripts.stress_corpus_stats import synth_events
from scripts.stress_curation import probe, synth_vecs
from scripts.stress_r06 import synth_orders


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_orders = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
    n_docs = int(sys.argv[4]) if len(sys.argv) > 4 else 5_000_000

    spark = get_spark(app_name="stress-r09", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    sf = tempfile.mkdtemp(prefix="ndl_stress_r09_")
    synth_events(spark, n_events).write.parquet(f"{sf}/events.parquet")
    synth_orders(spark, n_orders).write.parquet(f"{sf}/orders.parquet")
    synth_vecs(spark, n_vecs, 64).write.parquet(f"{sf}/embeddings.parquet")
    spark.range(200_000).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("SEG"), F.pmod(F.xxhash64("id"), 5).cast("string")).alias(
            "c_mktsegment"
        ),
    ).write.parquet(f"{sf}/customer.parquet")
    spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("src"), F.pmod(F.xxhash64("id"), 40).cast("string")
        ).alias("source"),
        F.lit("text").alias("text"),
    ).write.parquet(f"{sf}/documents.parquet")

    probe(
        f"streaming_interval_join_replay_{n_events}",
        lambda: r9.streaming_interval_join_replay_events(spark, sf),
    )
    # the enrich replay reads events at 2x the join's size: rewrite
    sf2 = tempfile.mkdtemp(prefix="ndl_stress_r09b_")
    synth_events(spark, 2 * n_events).write.parquet(f"{sf2}/events.parquet")
    os.symlink(f"{sf}/customer.parquet", f"{sf2}/customer.parquet")
    probe(
        f"streaming_enrich_replay_{2 * n_events}",
        lambda: r9.streaming_enrich_replay_events(spark, sf2),
    )
    probe(
        f"vacuum_retention_{n_orders}",
        lambda: r9.vacuum_retention_orders(spark, sf),
    )
    probe(
        f"rebucket_roundtrip_{n_orders}",
        lambda: r9.rebucket_roundtrip_orders(spark, sf),
    )
    probe(
        f"ivf_nprobe_sweep_{n_vecs}",
        lambda: r9.ivf_nprobe_sweep_embeddings(spark, sf),
    )
    probe(
        f"mixture_temperature_sweep_{n_docs}",
        lambda: r9.mixture_temperature_sweep_documents(spark, sf),
    )
    probe(
        f"physical_erasure_audit_{n_orders}",
        lambda: r9.physical_erasure_audit_orders(spark, sf),
    )
    probe(
        f"streaming_outer_join_replay_{n_events}",
        lambda: r9.streaming_outer_join_replay_events(spark, sf),
    )
    probe(
        f"packing_budget_sweep_{n_docs}",
        lambda: r9.packing_budget_sweep_documents(spark, sf),
    )
    probe(
        f"jaccard_threshold_sweep_{n_docs}",
        lambda: r9.jaccard_threshold_sweep_documents(spark, sf),
    )


if __name__ == "__main__":
    main()
