#!/usr/bin/env python
"""Scale probes for the round-10 STAGED batch (plans/r10_queries.py):
end-to-end from real parquet so the staged query functions are what
gets timed.

- time_travel / restore / dv / history / cdf-replay at 2M orders: full
  lake lifecycles (multi-commit create/upsert/delete/restore chains) —
  the deferred-delete probes specifically contrast the O(deleted keys)
  DV commit against the bucket-rewrite path the r08 verdict flagged,
  and the CDF replay executes three real apply_changes passes.
- quant_bits_sweep at 1M vectors: the 25-anchor x N broadcast pair
  frame computed ONCE with three integer code columns — the sweep
  should cost ~one quantized_recall, not three.
- streaming_full_outer_join_replay at 1M events: horizon-0 full outer
  with 8 time-ordered batches; per-key state bounded by the gap.

Usage: python scripts/stress_r10.py [n_events] [n_orders] [n_vecs] [n_docs]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nasa_asteroid_data_lakehouse_spark.plans import r10_queries as r10
from nasa_asteroid_data_lakehouse_spark.session import get_spark
from scripts.stress_corpus_stats import synth_events
from scripts.stress_curation import probe, synth_vecs
from scripts.stress_r06 import synth_orders
from scripts.stress_curation import synth_docs


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_orders = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
    n_docs = int(sys.argv[4]) if len(sys.argv) > 4 else 1_000_000

    spark = get_spark(app_name="stress-r10", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    sf = tempfile.mkdtemp(prefix="ndl_stress_r10_")
    synth_events(spark, n_events).write.parquet(f"{sf}/events.parquet")
    synth_orders(spark, n_orders).write.parquet(f"{sf}/orders.parquet")
    synth_vecs(spark, n_vecs, 64).write.parquet(f"{sf}/embeddings.parquet")
    synth_docs(spark, n_docs).write.parquet(f"{sf}/documents.parquet")

    probe(
        f"time_travel_timestamp_{n_orders}",
        lambda: r10.time_travel_timestamp_orders(spark, sf),
    )
    probe(
        f"restore_undo_feed_{n_orders}",
        lambda: r10.restore_undo_feed_orders(spark, sf),
    )
    probe(
        f"dv_merge_on_read_{n_orders}",
        lambda: r10.dv_merge_on_read_orders(spark, sf),
    )
    probe(
        f"dv_upsert_materialize_{n_orders}",
        lambda: r10.dv_upsert_materialize_orders(spark, sf),
    )
    probe(
        f"lake_history_audit_{n_orders}",
        lambda: r10.lake_history_audit_orders(spark, sf),
    )
    probe(
        f"cdf_stream_replay_{n_orders}",
        lambda: r10.cdf_stream_replay_orders(spark, sf),
    )
    probe(
        f"quant_bits_sweep_{n_vecs}",
        lambda: r10.quant_bits_sweep_embeddings(spark, sf),
    )
    probe(
        f"streaming_full_outer_join_replay_{n_events}",
        lambda: r10.streaming_full_outer_join_replay_events(spark, sf),
    )
    probe(
        f"dv_vector_store_topk_{n_vecs}",
        lambda: r10.dv_vector_store_topk_embeddings(spark, sf),
    )
    probe(
        f"optimize_dv_purge_{n_orders}",
        lambda: r10.optimize_dv_purge_orders(spark, sf),
    )
    probe(
        f"streaming_cdf_subscription_{n_orders}",
        lambda: r10.streaming_cdf_subscription_orders(spark, sf),
    )
    probe(
        f"decontamination_ngram_sweep_{n_docs}",
        lambda: r10.decontamination_ngram_sweep_documents(spark, sf),
    )
    probe(
        f"quality_threshold_sweep_{n_docs}",
        lambda: r10.quality_threshold_sweep_documents(spark, sf),
    )
    probe(
        f"streaming_replication_{n_orders}",
        lambda: r10.streaming_replication_orders(spark, sf),
    )
    probe(
        f"session_gap_sweep_{n_events}",
        lambda: r10.session_gap_sweep_events(spark, sf),
    )



def delete_contrast(n_orders: int = 2_000_000) -> None:
    """Deferred (deletion-vector) vs immediate (bucket-rewrite) delete
    on the SAME 2M-row table shape — the write-amplification number
    the merge-on-read path exists for.  Run via:
    python -c "import scripts.stress_r10 as s; s.delete_contrast()"
    """
    import tempfile

    from pyspark.sql import functions as F

    from nasa_asteroid_data_lakehouse_spark.lake.table import VersionedTable

    spark = get_spark(app_name="stress-r10-contrast", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.range(n_orders).select(
        F.col("id").alias("k"),
        (F.col("id") % 500).alias("cents"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    cond = (F.col("k") % 1000 == 0) & (F.col("k") >= 0)  # 0.1% of rows

    for mode, deferred in (("immediate", False), ("deferred", True)):
        root = tempfile.mkdtemp(prefix=f"ndl_dvc_{mode}_")
        t = VersionedTable(spark, root, num_buckets=64)
        t.create(base, keys=["k"])
        probe(
            f"delete_{mode}_{n_orders}",
            lambda t=t, d=deferred: spark.createDataFrame(
                [(t.delete_where(cond, deferred=d),)], "v bigint"
            ),
        )
        probe(
            f"read_after_{mode}_{n_orders}",
            lambda t=t: t.read(),
        )


if __name__ == "__main__":
    main()
