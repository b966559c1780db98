#!/usr/bin/env python
"""Scale probes for the real-round-2 curation batch: quality gate
(shuffle + stateless forms), lexical diversity, domain cap,
temperature mixture, dataset card, int8 quantization, vector
admission.  Synthetic data generated distributed via spark.range
(nothing collects to the driver); one JSON line per probe.

Usage: python scripts/stress_curation.py [n_docs] [n_vecs] [dim]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark.llm import curation, similarity
from nasa_asteroid_data_lakehouse_spark.session import get_spark

WORDS = [
    "the", "a", "of", "and", "table", "join", "scan", "merge", "window",
    "batch", "shuffle", "spark", "query", "row", "key", "value", "sort",
    "hash", "agg", "fast",
]


def synth_docs(spark, n, n_sources=40):
    """~60-word synthetic docs: 3 repeated 20-word blocks with a
    per-doc rotation so dedup stats vary."""
    words = F.array(*[F.lit(w) for w in WORDS])
    block = F.shuffle(words)  # nondeterministic is fine for a stress probe
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.flatten(F.array(block, F.shuffle(words), F.shuffle(words))),
        ).alias("text"),
        F.concat(
            F.lit("src"), F.pmod(F.xxhash64("id"), n_sources).cast("string")
        ).alias("source"),
        F.lit("en").alias("lang"),
    ).withColumn("n_chars", F.length("text"))


def synth_vecs(spark, n, dim):
    cols = [
        ((F.pmod(F.xxhash64("id", F.lit(d)), 2001) - 1000) / 1000.0).cast("float")
        for d in range(dim)
    ]
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*cols).alias("embedding"),
        F.pmod(F.xxhash64("id", F.lit(999)), 8).cast("int").alias("label"),
    )


def probe(name, thunk):
    """Times a full materialization into the noop sink — count() would
    let Catalyst prune the computed columns and measure only the join
    skeleton."""
    t0 = time.perf_counter()
    df = thunk()
    df.write.format("noop").mode("overwrite").save()
    dt = round(time.perf_counter() - t0, 2)
    print(json.dumps({"probe": name, "sec": dt}))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    spark = get_spark(app_name="stress-curation", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = synth_docs(spark, n_docs).localCheckpoint()
    vecs = synth_vecs(spark, n_vecs, dim).localCheckpoint()

    probe("quality_filter_shuffle", lambda: curation.quality_filter(docs))
    probe(
        "quality_filter_stateless",
        lambda: curation.quality_filter_stateless(docs),
    )
    probe("lexical_diversity", lambda: curation.lexical_diversity(docs))
    probe("domain_cap", lambda: curation.domain_cap(docs, cap=10_000))
    probe(
        "temperature_mixture",
        lambda: curation.temperature_mixture(docs, n_target=n_docs // 10),
    )
    probe("dataset_card", lambda: curation.dataset_card(docs))
    probe(
        "quantize_embeddings",
        lambda: similarity.quantize_embeddings(vecs),
    )
    batch = vecs.where(F.col("vec_id") % 1000 == 0)  # 0.1% incoming batch
    corpus = vecs.where(F.col("vec_id") % 1000 != 0)
    probe(
        "vector_admit_8planes",
        lambda: similarity.vector_admit(
            batch, corpus, threshold=0.9, num_planes=8
        ),
    )
    spark.stop()


if __name__ == "__main__":
    main()
