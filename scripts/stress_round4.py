#!/usr/bin/env python
"""Round-4 scale probes: the top-k-fused hybrid retrieval vs the
corpus-wide-window parity form at 1M docs / 1M vectors, and binary
payload dedup at 1M payloads.

The synthetic tables are WRITTEN as documents.parquet / embeddings
.parquet in a temp dir so the probes run the REGISTERED query
functions end-to-end (scan included), not a lookalike plan.  One JSON
line per probe.

Usage: python scripts/stress_round4.py [n_docs] [n_vecs] [dim]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark.llm import multimodal
from nasa_asteroid_data_lakehouse_spark.plans import curation_queries as cq
from nasa_asteroid_data_lakehouse_spark.session import get_spark
from scripts.stress_curation import probe, synth_docs, synth_vecs


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    spark = get_spark(app_name="stress-round4", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    sf = tempfile.mkdtemp(prefix="ndl_stress_r4_")
    synth_docs(spark, n_docs).write.parquet(f"{sf}/documents.parquet")
    synth_vecs(spark, n_vecs, dim).write.parquet(f"{sf}/embeddings.parquet")

    probe("hybrid_topk_fused", lambda: cq.hybrid_retrieval_documents(spark, sf))
    probe(
        "hybrid_corpuswide_windows",
        lambda: cq.hybrid_retrieval_corpuswide(spark, sf),
    )

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    payloads = multimodal.with_binary_payload(docs, "text").localCheckpoint()
    probe(
        "payload_dedup_stats",
        lambda: multimodal.payload_dedup_stats(payloads),
    )
    probe(
        "payload_survivors",
        lambda: multimodal.payload_survivors(payloads),
    )
    spark.stop()


if __name__ == "__main__":
    main()
