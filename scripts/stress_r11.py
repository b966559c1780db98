#!/usr/bin/env python
"""Scale probes for the round-11 STAGED batch (plans/r11_queries.py):
end-to-end from real parquet so the staged query functions are what
gets timed.

- replication_across_rebucket / maintenance_cdf_skip / txn-x-dv /
  schema queries at 2M orders: full lake lifecycles including a
  REBUCKET (the one deliberate full rewrite) — the probe demonstrates
  the mirror pays nothing for it (the data_change skip plans zero
  partitions) while the upstream pays the rewrite once.
- gopher_repetition at 1M docs: row-local array arithmetic, one
  shuffle total (the final (n, bucket) groupBy) — should scale like a
  single corpus projection.
- kmeans_lloyd at 1M vectors: two Lloyd iterations = two narrow
  projections + two k*d-bounded aggregates; the probe pins that
  iterations scale linearly, not quadratically.

- streaming_sliding_window_replay at 1M events: 4 overlapping windows
  per event over 4 real micro-batches; state bounded by open windows x
  event types, emitted windows evicted at the watermark.

Usage: python scripts/stress_r11.py [n_orders] [n_docs] [n_vecs] [n_events]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nasa_asteroid_data_lakehouse_spark.plans import r11_queries as r11
from nasa_asteroid_data_lakehouse_spark.session import get_spark
from scripts.stress_curation import probe, synth_docs, synth_vecs
from scripts.stress_round_extras import synth_events  # carries event_type
from scripts.stress_r06 import synth_orders


def main() -> None:
    n_orders = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
    n_events = int(sys.argv[4]) if len(sys.argv) > 4 else 1_000_000

    spark = get_spark(app_name="stress-r11", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    sf = tempfile.mkdtemp(prefix="ndl_stress_r11_")
    synth_orders(spark, n_orders).write.parquet(f"{sf}/orders.parquet")
    synth_docs(spark, n_docs).write.parquet(f"{sf}/documents.parquet")
    synth_vecs(spark, n_vecs, 64).write.parquet(f"{sf}/embeddings.parquet")
    synth_events(spark, n_events).write.parquet(f"{sf}/events.parquet")

    probe(
        f"replication_across_rebucket_{n_orders}",
        lambda: r11.replication_across_rebucket_orders(spark, sf),
    )
    probe(
        f"maintenance_cdf_skip_{n_orders}",
        lambda: r11.maintenance_cdf_skip_orders(spark, sf),
    )
    probe(
        f"txn_snapshot_across_dv_{n_orders}",
        lambda: r11.txn_snapshot_across_dv_orders(spark, sf),
    )
    probe(
        f"upsert_schema_merge_{n_orders}",
        lambda: r11.upsert_schema_merge_orders(spark, sf),
    )
    probe(
        f"cdf_schema_evolution_subscription_{n_orders}",
        lambda: r11.cdf_schema_evolution_subscription_orders(spark, sf),
    )
    probe(
        f"gopher_repetition_{n_docs}",
        lambda: r11.gopher_repetition_documents(spark, sf),
    )
    probe(
        f"kmeans_lloyd_{n_vecs}",
        lambda: r11.kmeans_lloyd_embeddings(spark, sf),
    )
    probe(
        f"streaming_sliding_window_{n_events}",
        lambda: r11.streaming_sliding_window_replay_events(spark, sf),
    )


if __name__ == "__main__":
    main()
