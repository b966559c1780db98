#!/usr/bin/env python
"""Scale probes for the round-8 STAGED batch (plans/r08_queries.py):
the shapes whose cost grows with the corpus, run end-to-end from real
parquet so the registered query functions are what gets timed.

- ivfpq_topk at 1M vectors: projection-only claim (cell argmin + m
  code argmins + ADC sum, no shuffle before the TakeOrdered).
- ivfpq_recall at 1M vectors: broadcast-anchor claim (8 anchors x
  probed cells, candidate join equi on cell id).
- hubness_autoplane at 1M vectors: THE occupancy lever, executable
  (VERDICT r06 ask #5) — the law picks 14 planes at 1M (mean
  occupancy ~61), where the fixed-4-plane twin measured 570.9 s even
  at 12 hand-set planes in the r07 probe ledger.  No hand tuning.
- lsh_index_maintenance at 1M vectors with the planes lever turned to
  14 (the fixture's 4 planes are an occupancy disaster at 1M — same
  documented law; the admission join is bucket-equi so cost follows
  occupancy^2 x buckets).
- txn_consistent_snapshot / zorder_optimize / cdc_apply_schema_evolution
  at 2M orders: lakehouse write+audit paths (bucket-keyed shuffles,
  bounded audits).

Usage: python scripts/stress_r08.py [n_vecs] [n_orders]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nasa_asteroid_data_lakehouse_spark.plans import r08_queries as r8
from nasa_asteroid_data_lakehouse_spark.session import get_spark
from scripts.stress_curation import probe, synth_vecs
from scripts.stress_r06 import synth_orders


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_orders = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000

    spark = get_spark(app_name="stress-r08", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    sf = tempfile.mkdtemp(prefix="ndl_stress_r08_")
    synth_vecs(spark, n_vecs, 64).write.parquet(f"{sf}/embeddings.parquet")
    synth_orders(spark, n_orders).write.parquet(f"{sf}/orders.parquet")

    probe(
        f"ivfpq_topk_{n_vecs}",
        lambda: r8.ivfpq_topk_embeddings(spark, sf),
    )
    probe(
        f"ivfpq_recall_{n_vecs}",
        lambda: r8.ivfpq_recall_embeddings(spark, sf),
    )
    # the executable occupancy lever: NO hand-set planes — the query
    # derives them from the corpus count (expect p=14 at 1M)
    print(f"auto_planes({n_vecs}) = {r8._auto_planes(n_vecs)}")
    probe(
        f"hubness_autoplane_{n_vecs}",
        lambda: r8.hubness_autoplane_embeddings(spark, sf),
    )
    # index maintenance with the same lever turned by hand (the
    # registered fixture shape keeps 4 planes for oracle boundedness)
    lim0, split0 = r8._LIM_PLANES, r8._LIM_SPLIT_PLANE
    r8._LIM_PLANES, r8._LIM_SPLIT_PLANE = 14, 14
    try:
        probe(
            f"lsh_index_maintenance_{n_vecs}_14planes",
            lambda: r8.lsh_index_maintenance_embeddings(spark, sf),
        )
    finally:
        r8._LIM_PLANES, r8._LIM_SPLIT_PLANE = lim0, split0

    probe(
        f"txn_consistent_snapshot_{n_orders}",
        lambda: r8.txn_consistent_snapshot_orders(spark, sf),
    )
    probe(
        f"zorder_optimize_roundtrip_{n_orders}",
        lambda: r8.zorder_optimize_roundtrip_orders(spark, sf),
    )
    probe(
        f"cdc_apply_schema_evolution_{n_orders}",
        lambda: r8.cdc_apply_schema_evolution_orders(spark, sf),
    )
    probe(
        f"ivfpq_residual_topk_{n_vecs}",
        lambda: r8.ivfpq_residual_topk_embeddings(spark, sf),
    )
    probe(
        f"clone_divergence_{n_orders}",
        lambda: r8.clone_divergence_orders(spark, sf),
    )
    probe(
        f"ivm_incremental_dim_{n_orders}",
        lambda: r8.ivm_incremental_dim_orders(spark, sf),
    )
    # streaming upsert replays the synthetic events table twice through
    # foreachBatch upserts (4 micro-batches + 4 no-op replays)
    n_events = n_orders  # reuse the orders scale for the event stream
    from scripts.stress_corpus_stats import synth_events

    synth_events(spark, n_events).select(
        "event_id", "ts",
    ).write.parquet(f"{sf}/events.parquet")
    probe(
        f"streaming_upsert_replay_{n_events}",
        lambda: r8.streaming_upsert_replay_events(spark, sf),
    )

    import shutil

    shutil.rmtree(sf, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
