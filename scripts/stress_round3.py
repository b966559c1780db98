#!/usr/bin/env python
"""Scale probes for the round-3 operators: sequence-level dup spans,
BM25, inverted index, stratified split, CDC snapshot diff, PIT SCD2
join, exact kNN.  Synthetic data generated distributed via spark.range
(nothing collects to the driver); one JSON line per probe.

Usage: python scripts/stress_round3.py [n_docs] [n_events] [n_vecs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark.session import get_spark

VOCAB = [f"w{i:04d}" for i in range(2000)]


def synth_docs(spark, n, words_per_doc=40):
    """Word-salad docs; ~25% of docs share a 10-word boilerplate
    prefix block so dup-span coverage has real signal."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(words_per_doc)),
            lambda i: F.element_at(vocab, (F.pmod(F.xxhash64("id", i), 2000) + 1).cast("int")),
        ),
        " ",
    )
    boiler = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(10)),
            lambda i: F.element_at(vocab, ((F.pmod(F.xxhash64(F.pmod(F.col("id"), 4), i), 50)) + 1).cast("int")),
        ),
        " ",
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.pmod(F.col("id"), 4) == 0, F.concat(boiler, F.lit(" "), body))
        .otherwise(body)
        .alias("text"),
        F.element_at(
            F.array(*[F.lit(s) for s in ["en", "fr", "es", "de"]]),
            (F.pmod(F.xxhash64("id", F.lit(9)), 4) + 1).cast("int"),
        ).alias("lang"),
    )


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
    )


def synth_orders(spark, n):
    return spark.range(n).select(
        F.col("id").alias("o_orderkey"),
        (F.pmod(F.xxhash64("id", F.lit(2)), 50_000_000) / 100.0).alias("o_totalprice"),
        F.element_at(
            F.array(F.lit("O"), F.lit("F"), F.lit("P")),
            (F.pmod(F.xxhash64("id", F.lit(3)), 3) + 1).cast("int"),
        ).alias("o_orderstatus"),
    )


def synth_vecs(spark, n, dim=64):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (F.pmod(F.xxhash64("id", i), 1000) / 500.0 - 1.0).cast("float"),
        ).alias("embedding"),
        (F.pmod(F.xxhash64("id", F.lit(7)), 10)).cast("int").alias("label"),
    )


def timed(label, df, results):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    rec = {"probe": label, "sec": round(time.perf_counter() - t0, 2)}
    results.append(rec)
    print(json.dumps(rec), flush=True)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 8_000
    spark = get_spark(app_name="stress-r3", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    results: list[dict] = []

    docs = synth_docs(spark, n_docs).localCheckpoint(eager=True)
    events = synth_events(spark, n_events).localCheckpoint(eager=True)
    orders = synth_orders(spark, n_events).localCheckpoint(eager=True)

    from nasa_asteroid_data_lakehouse_spark.llm import dedup, similarity, text

    timed(
        f"dup_span_coverage {n_docs:,} docs (k=3, dup-filtered join-back)",
        dedup.dup_span_coverage(docs, "doc_id", shingle_k=3),
        results,
    )
    timed(
        f"bm25_scores {n_docs:,} docs / 4 terms",
        text.bm25_scores(docs, "doc_id", ["w0001", "w0100", "w0500", "w1000"]),
        results,
    )
    timed(
        f"inverted_index {n_docs:,} docs (top-50 terms, capped postings)",
        text.inverted_index(docs, "doc_id", min_df=2, top_terms=50, postings_cap=20),
        results,
    )
    timed(
        f"train_val_test_split {n_docs:,} docs / 4 strata",
        text.train_val_test_split(docs, "doc_id", ["lang"]),
        results,
    )

    from nasa_asteroid_data_lakehouse_spark.operators import cdc

    k = F.col("o_orderkey")
    old = orders.where(k % 10 < 7)
    new = orders.where(k % 10 >= 3).select(
        "o_orderkey",
        F.when(k % 3 == 0, F.col("o_totalprice") + 100.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(k % 5 == 0, F.lit("X")).otherwise(F.col("o_orderstatus")).alias(
            "o_orderstatus"
        ),
    )
    timed(
        f"cdc_snapshot_diff {n_events:,} orders x2 snapshots",
        cdc.snapshot_diff(old, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]),
        results,
    )

    from nasa_asteroid_data_lakehouse_spark.operators.scd import scd2_compress
    from nasa_asteroid_data_lakehouse_spark.operators.temporal import asof_join

    history = (
        scd2_compress(
            events.where(F.col("event_type") != "purchase"),
            keys=["user_id"],
            attr_col="event_type",
            ts_col="ts",
            tiebreak=["event_id"],
        )
        .where(F.col("event_type").isNotNull())
        .select("user_id", F.col("event_type").alias("status"), "valid_from", "version")
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    timed(
        f"pit_scd2_join {n_events:,} events / 200k users",
        asof_join(purchases, history, ["user_id"], "ts", "valid_from"),
        results,
    )

    vecs = synth_vecs(spark, n_vecs).localCheckpoint(eager=True)
    timed(
        f"knn_label_agreement {n_vecs:,} vecs (exact O(N^2) baseline)",
        similarity.knn_label_agreement(vecs, k=3),
        results,
    )

    total = round(sum(r["sec"] for r in results), 2)
    print(json.dumps({"probe": "TOTAL", "sec": total}), flush=True)


if __name__ == "__main__":
    main()
