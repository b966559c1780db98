#!/usr/bin/env python
"""Scale probe: run the core operators on synthetic data 30-200x the
sf0.1 fixtures (generated distributed via spark.range — nothing ever
collects to the driver).  Prints one JSON line per probe.

This is the local stand-in for the 1000-executor question: do the
plans/shuffles hold when the data is much bigger than the test SF?
Usage: python scripts/stress.py [rows_facts] [rows_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from nasa_asteroid_data_lakehouse_spark.session import get_spark
from nasa_asteroid_data_lakehouse_spark.llm import dedup as ldedup
from nasa_asteroid_data_lakehouse_spark.llm import text as ltext
from nasa_asteroid_data_lakehouse_spark.operators import dedup as odedup

VOCAB = (
    "the a of and to is in it you that spark data table row scan filter join "
    "merge window batch stream key value hash sort group order column part big "
    "small fast slow line customer query vector agg"
).split()


def synth_facts(spark, n):
    """Lineitem-shaped facts, fully distributed generation."""
    return (
        spark.range(n)
        .select(
            (F.col("id") % (n // 4)).alias("orderkey"),
            (F.col("id") % 200_000).alias("partkey"),
            (F.pmod(F.xxhash64("id"), 100) / 10.0 + 1.0).alias("quantity"),
            (F.pmod(F.xxhash64("id", F.lit(1)), 10_000) / 10.0).alias("price"),
            (F.pmod(F.xxhash64("id", F.lit(2)), 10) / 100.0).alias("discount"),
            F.concat(F.lit("F"), (F.col("id") % 3).cast("string")).alias("flag"),
        )
    )


def synth_docs(spark, n):
    """Word-salad documents built from array expressions (30 words each);
    ~10% exact duplicates via id folding."""
    base = spark.range(n).withColumn(
        "fold_id", F.when(F.col("id") % 10 == 0, F.col("id") + 1).otherwise(F.col("id"))
    )
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    words = F.transform(
        F.sequence(F.lit(0), F.lit(29)),
        lambda i: vocab[F.pmod(F.xxhash64(F.col("fold_id"), i), F.lit(len(VOCAB)))],
    )
    return base.select(
        F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text")
    )


def timed(label, df, results):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    results[label] = round(time.perf_counter() - t0, 2)


def main():
    n_facts = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark(app_name="stress", extra_conf={"spark.sql.shuffle.partitions": "64"})
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    facts = synth_facts(spark, n_facts)
    dim = spark.range(200_000).select(
        F.col("id").alias("partkey"),
        F.concat(F.lit("type"), (F.col("id") % 40).cast("string")).alias("ptype"),
    )

    timed(
        "agg_20m",
        facts.groupBy("flag").agg(
            F.sum("quantity"), F.sum(F.col("price") * (1 - F.col("discount"))), F.count(F.lit(1))
        ),
        results,
    )
    timed(
        "broadcast_join_agg_20m",
        facts.join(broadcast(dim), "partkey").groupBy("ptype").agg(F.sum("price")),
        results,
    )
    timed(
        "window_dedup_20m",
        odedup.dedup_deterministic(facts, ["orderkey"], [F.desc("price")]),
        results,
    )

    docs = synth_docs(spark, n_docs)
    timed("text_stats_1m", ltext.with_text_stats(docs).drop("text"), results)
    timed("exact_dedup_1m", ldedup.exact_dedup(docs, "doc_id"), results)
    timed(
        "minhash16_1m",
        ldedup.with_minhash_signature(docs, num_hashes=16).drop("text"),
        results,
    )

    timed(
        "simhash_1m",
        ldedup.simhash_by_key(docs, "doc_id"),
        results,
    )
    # Banded MinHash-LSH near-dup pairs: candidate generation is a
    # band-hash equi-join, verify is exact Jaccard — the full pipeline
    # at 1/5 the doc count (pair output is data-dependent).
    timed(
        "minhash_lsh_pairs_200k",
        ldedup.lsh_near_dup_pairs(
            docs.limit(n_docs // 5),
            "doc_id",
            num_hashes=8,
            bands=4,
            shingle_k=2,
            jaccard_threshold=0.5,
        ),
        results,
    )

    # Embedding ops on synthetic 64-dim vectors (distributed generation).
    from nasa_asteroid_data_lakehouse_spark.llm import similarity as lsim

    n_vecs = max(n_docs // 10, 1000)
    vecs = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: (F.pmod(F.xxhash64(F.col("id"), i), 2000) - 1000) / 1000.0,
        ).alias("embedding"),
    )
    timed(
        "lsh_bucket_100k_vecs",
        lsim.with_lsh_bucket(vecs, num_planes=8, dim=64),
        results,
    )
    centroids = [
        [((h * 2654435761 + d) % 2000 - 1000) / 1000.0 for d in range(64)]
        for h in range(8)
    ]
    timed(
        "ivf_assign_100k_vecs",
        lsim.with_ivf_assignment(vecs, centroids),
        results,
    )
    qvec = [((7 * 2654435761 + d) % 2000 - 1000) / 1000.0 for d in range(64)]
    timed(
        "cosine_topk_100k_vecs_sql",
        lsim.cosine_topk(vecs, qvec, k=10, backend="sql"),
        results,
    )
    timed(
        "cosine_topk_100k_vecs_arrow",
        lsim.cosine_topk(vecs, qvec, k=10, backend="arrow"),
        results,
    )

    # Robust-stats / sketch / curation operators (round-1 late additions).
    from nasa_asteroid_data_lakehouse_spark.llm.packing import chunk_documents
    from nasa_asteroid_data_lakehouse_spark.operators import sketches as osk
    from nasa_asteroid_data_lakehouse_spark.operators.robust import winsorize

    timed(
        "winsorize_20m",
        winsorize(facts, "price", ["flag"], exact=False),
        results,
    )
    timed(
        "sketch_rollup_20m",
        osk.rollup_sketches(osk.segment_sketches(facts, "flag", "orderkey", "price")),
        results,
    )
    pii_docs = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" u"),
            F.col("doc_id").cast("string"),
            F.lit("@ex.com 555"),
            F.lpad(F.col("doc_id").cast("string"), 7, "0"),
            F.lit(" https://ex.com/"),
            F.col("doc_id").cast("string"),
        ),
    )
    timed("scrub_pii_1m", ltext.scrub_pii(pii_docs).drop("text", "text_scrubbed"), results)
    timed(
        "chunk_docs_1m",
        chunk_documents(docs, chunk_size=16, stride=12),
        results,
    )
    timed(
        "rebalance_1m",
        ltext.rebalance_to_min_stratum(
            docs.withColumn("source", (F.col("doc_id") % 20).cast("string")),
            "source",
            "doc_id",
        ),
        results,
    )

    print(json.dumps({"metric": "stress", "rows_facts": n_facts, "rows_docs": n_docs, "sec": results}))
    spark.stop()


if __name__ == "__main__":
    main()
