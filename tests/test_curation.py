"""Round-2 curation operators: composite quality gate, lexical
diversity, domain caps, dataset card, int8 quantization, hard
negatives, ANN recall."""

import math

import pytest
from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark.llm import curation, similarity


# --- quality_filter -----------------------------------------------------------


def test_quality_filter_rules_and_keep(spark):
    long_ok = (
        "the quick brown fox jumps over a lazy dog and it runs toward "
        "some distant hills where many small animals gather near water "
        "to drink while birds circle above looking for food in this "
        "quiet valley that stays green all year"
    )  # 40 distinct-ish words, has stopwords, no repeated bigrams
    spam = " ".join(["buy"] * 40)  # top_word_frac = 1.0, no stopwords
    docs = spark.createDataFrame(
        [(1, long_ok), (2, spam), (3, ""), (4, None), (5, "short text only")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in curation.quality_filter(docs).collect()}
    assert out[1]["keep"] is True
    assert out[2]["ok_top_word"] is False and out[2]["keep"] is False
    # spam doc also fails dup-bigram ("buy buy" repeated) and stopwords
    assert out[2]["ok_dup_bigram"] is False
    assert out[3]["n_words"] == 0 and out[3]["keep"] is False
    assert out[4]["n_words"] == 0 and out[4]["keep"] is False  # NULL pinned to ''
    assert out[5]["ok_word_count"] is False  # 3 words < QF_MIN_WORDS


def test_quality_filter_word_count_bounds(spark):
    n = curation.QF_MIN_WORDS
    exactly_min = " ".join(["the"] * 1 + ["word%d" % i for i in range(n - 1)])
    docs = spark.createDataFrame([(1, exactly_min)], ["doc_id", "text"])
    row = curation.quality_filter(docs).collect()[0]
    assert row["n_words"] == n and row["ok_word_count"] is True


# --- lexical_diversity --------------------------------------------------------


def test_lexical_diversity_counts_and_argmax(spark):
    docs = spark.createDataFrame(
        [(1, "a b b c c c"), (2, "x x y y"), (3, "   ")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in curation.lexical_diversity(docs).collect()}
    assert out[1]["n_tokens"] == 6 and out[1]["n_types"] == 3
    assert out[1]["max_tf"] == 3 and out[1]["top_term"] == "c"
    assert out[1]["type_token_ratio"] == 0.5
    # tie on count 2: lexicographically smallest term wins
    assert out[2]["top_term"] == "x"
    assert 3 not in out  # blank excluded


# --- domain_cap ---------------------------------------------------------------


def test_domain_cap_caps_each_domain(spark):
    rows = [(i, "big") for i in range(50)] + [(100 + i, "small") for i in range(3)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    out = curation.domain_cap(docs, cap=10)
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"big": 10, "small": 3}
    assert out.agg(F.max("admission_rank")).collect()[0][0] <= 10


def test_domain_cap_deterministic(spark):
    rows = [(i, "s") for i in range(30)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    a = sorted(r["doc_id"] for r in curation.domain_cap(docs, cap=5).collect())
    b = sorted(
        r["doc_id"]
        for r in curation.domain_cap(docs.repartition(7), cap=5).collect()
    )
    assert a == b  # md5 rank, not partition-dependent


# --- dataset_card -------------------------------------------------------------


def test_dataset_card_totals(spark):
    docs = spark.createDataFrame(
        [
            (1, "one two three", "en", "s1", 13),
            (2, "four five", "fr", "s1", 9),
            (3, "six", "en", "s2", 3),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    out = {r["source"]: r for r in curation.dataset_card(docs).collect()}
    assert out["s1"]["n_docs"] == 2 and out["s1"]["n_langs"] == 2
    assert out["s1"]["total_chars"] == 22 and out["s1"]["total_tokens"] == 5
    assert out["s1"]["mean_chars"] == 11.0
    assert out["s1"]["pct_docs"] == round(2 / 3, 6)
    assert out["s2"]["total_tokens"] == 1


# --- quantize_embeddings ------------------------------------------------------


def test_quantize_embeddings_exact_lattice(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25]), (2, [0.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    out = {r["vec_id"]: r for r in similarity.quantize_embeddings(emb).collect()}
    r1 = out[1]
    assert r1["scale"] == 127.0
    # codes: 127, floor(-63.5+0.5)=-63, floor(31.75+0.5)=32
    assert r1["code_sum"] == 127 - 63 + 32
    assert r1["n_sat"] == 1
    assert r1["max_abs_err"] <= 0.5 / 127.0 + 1e-12
    r2 = out[2]
    assert r2["scale"] == 1.0 and r2["code_sum"] == 0 and r2["max_abs_err"] == 0.0


def test_quantize_error_bound_on_fixture(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    out = similarity.quantize_embeddings(emb)
    worst = out.agg(F.max("max_abs_err")).collect()[0][0]
    # half a quantization step of the per-vector scale; scales vary, so
    # bound by the loosest possible step: 0.5 / (127 / max_abs) with
    # max_abs <= ~1 for unit-ish vectors — just assert the sane regime
    assert worst < 0.01


# --- hard_negatives -----------------------------------------------------------


def test_hard_negatives_excludes_same_label(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 1),
            (1, [0.9, 0.1], 1),   # same label as anchor — excluded
            (2, [0.8, 0.2], 2),   # closest different-label
            (3, [0.0, 1.0], 2),
        ],
        ["vec_id", "embedding", "label"],
    )
    out = similarity.hard_negatives(emb, anchor_max_id=1, k=2).collect()
    got = {(r["anchor_id"], r["negative_id"]) for r in out}
    assert (0, 1) not in got
    ranked = sorted(out, key=lambda r: r["neg_rank"])
    assert ranked[0]["negative_id"] == 2 and ranked[1]["negative_id"] == 3


# --- ann_recall_lsh -----------------------------------------------------------


def test_ann_recall_bounds_and_exact_k(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    out = similarity.ann_recall_lsh(
        emb, anchor_max_id=5, k=10, num_planes=6, probe_hamming=1
    ).collect()
    assert len(out) == 5
    for r in out:
        assert r["n_exact"] == 10
        assert 0 <= r["n_hits"] <= 10
        assert r["recall_at_k"] == round(r["n_hits"] / 10, 6)


def test_ann_recall_full_probe_is_perfect(spark):
    # probe_hamming >= num_planes searches every bucket -> recall 1.0
    emb = spark.createDataFrame(
        [(i, [float((i * 7) % 5) - 2.0, float((i * 3) % 4) - 1.5, 1.0], 0)
         for i in range(20)],
        ["vec_id", "embedding", "label"],
    )
    out = similarity.ann_recall_lsh(
        emb, anchor_max_id=3, k=5, num_planes=4, probe_hamming=4
    ).collect()
    assert all(r["recall_at_k"] == 1.0 for r in out)


# --- temperature_mixture ------------------------------------------------------


def test_temperature_mixture_quotas_flatten(spark):
    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(16)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    out = curation.temperature_mixture(docs, n_target=100)
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # weights: floor(sqrt(400)*1000)=20000, floor(sqrt(16)*1000)=4000
    # quotas: 100*20000//24000 = 83, min(16, 100*4000//24000=16) = 16
    assert counts == {"big": 83, "small": 16}
    # proportional sampling would have given small ~4 of 100; sqrt
    # temperature flattens the mix toward the small source
    assert counts["small"] / sum(counts.values()) > 16 / 416


def test_temperature_mixture_deterministic(spark):
    rows = [(i, "s%d" % (i % 3)) for i in range(90)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    a = sorted(r["doc_id"] for r in curation.temperature_mixture(docs, 30).collect())
    b = sorted(
        r["doc_id"]
        for r in curation.temperature_mixture(docs.repartition(11), 30).collect()
    )
    assert a == b


# --- vector_admit -------------------------------------------------------------


def test_vector_admit_rejects_near_duplicate(spark):
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])], ["vec_id", "embedding"]
    )
    batch = spark.createDataFrame(
        [(100, [0.999, 0.001, 0.0]),  # near-dup of corpus 1
         (101, [-1.0, -1.0, -1.0])],  # far from everything
        ["vec_id", "embedding"],
    )
    out = {
        r["vec_id"]: r
        for r in similarity.vector_admit(
            batch, corpus, threshold=0.95, num_planes=3
        ).collect()
    }
    assert out[100]["admitted"] is False and out[100]["best_cos"] >= 0.95
    assert out[101]["admitted"] is True


def test_vector_admit_empty_bucket_admits(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    batch = emb.where(F.col("vec_id") % 10 == 0)
    corpus = emb.where(F.col("vec_id") % 10 != 0)
    out = similarity.vector_admit(batch, corpus, threshold=0.35).collect()
    assert len(out) == batch.count()
    for r in out:
        if r["n_candidates"] == 0:
            assert r["best_cos"] is None and r["admitted"] is True
        else:
            assert r["admitted"] == (r["best_cos"] < 0.35)


# --- quantized_recall ---------------------------------------------------------


def test_quantized_recall_high_overlap_on_fixture(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    out = similarity.quantized_recall(emb, anchor_max_id=5, k=10).collect()
    assert len(out) == 5
    # int8 cosine should preserve most of the exact top-10 at dim 64
    for r in out:
        assert r["n_exact"] == 10
        assert r["overlap_at_k"] >= 0.7
        assert r["overlap_at_k"] == round(r["n_hits"] / 10, 6)


# --- quality_filter_stateless -------------------------------------------------


def test_quality_filter_stateless_equivalent_to_shuffle_form(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "text"
    )
    a = {r["doc_id"]: r for r in curation.quality_filter(docs).collect()}
    b = {r["doc_id"]: r for r in curation.quality_filter_stateless(docs).collect()}
    assert set(a) == set(b)
    for k in a:
        ra, rb = a[k].asDict(), b[k].asDict()
        assert ra == rb, f"doc {k}: {ra} != {rb}"


def test_quality_filter_stateless_runs_in_a_stream(spark, tmp_path):
    src = str(tmp_path / "docs")
    long_ok = (
        "the quick brown fox jumps over a lazy dog and it runs toward "
        "some distant hills where many small animals gather near water "
        "to drink while birds circle above looking for food in this "
        "quiet valley that stays green all year"
    )
    spark.createDataFrame(
        [(1, long_ok), (2, " ".join(["buy"] * 40)), (3, "")],
        "doc_id long, text string",
    ).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    gated = curation.quality_filter_stateless(stream)
    q = (
        gated.writeStream.format("memory")
        .queryName("quality_gate_sink")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r["doc_id"]: r
        for r in spark.sql("SELECT * FROM quality_gate_sink").collect()
    }
    assert rows[1]["keep"] is True
    assert rows[2]["keep"] is False and rows[2]["ok_top_word"] is False
    assert rows[3]["keep"] is False and rows[3]["n_words"] == 0


# --- split_leakage / tokenizer_fertility -------------------------------------


def test_split_leakage_detects_cross_split_dup(spark, sf_smoke):
    from nasa_asteroid_data_lakehouse_spark.plans.curation_queries import (
        split_leakage_documents,
    )

    out = split_leakage_documents(spark, sf_smoke).collect()
    # the synthetic fixture plants near-dup families large enough that
    # an 80/10/10 split will straddle at least one of them
    for r in out:
        assert r["split_x"] < r["split_y"]
        assert r["n_leaky_pairs"] >= 1
        assert 0.0 <= r["max_jaccard"] <= 1.0


def test_tokenizer_fertility_simple_counts(spark):
    from nasa_asteroid_data_lakehouse_spark.llm import text as T

    docs = spark.createDataFrame(
        [(1, "hello, world", "s1"), (2, "a b", "s1"), (3, None, "s2")],
        "doc_id long, text string, source string",
    )
    t = F.coalesce(F.col("text"), F.lit(""))
    per = docs.select(
        "source",
        F.size(T.tokens(t)).alias("nws"),
        F.size(T.bpe_ish_tokens(t)).alias("nbpe"),
    ).collect()
    by_id = {(r["source"], r["nws"], r["nbpe"]) for r in per}
    # "hello, world" -> 2 ws words, 3 bpe pieces (hello , world)
    assert ("s1", 2, 3) in by_id
    assert ("s1", 2, 2) in by_id
    assert ("s2", 0, 0) in by_id


# --- graph analytics ----------------------------------------------------------


def test_triangle_counts_on_known_graph(spark):
    from nasa_asteroid_data_lakehouse_spark.operators.graph import (
        degrees,
        triangle_counts,
    )

    # K3 (1,2,3) + a pendant edge 3-4 + disconnected edge 5-6
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (5, 6)], ["src", "dst"]
    )
    tri = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert tri == {1: 1, 2: 1, 3: 1}
    deg = {r["node"]: r["degree"] for r in degrees(edges).collect()}
    assert deg == {1: 2, 2: 2, 3: 3, 4: 1, 5: 1, 6: 1}


def test_triangle_counts_k4_and_duplicate_edges(spark):
    from nasa_asteroid_data_lakehouse_spark.operators.graph import triangle_counts

    # K4: every node is in C(3,2)=3 triangles; duplicate + reversed
    # edges must not inflate counts
    base = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = spark.createDataFrame(
        base + [(b, a) for a, b in base] + base, ["src", "dst"]
    )
    tri = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert tri == {0: 3, 1: 3, 2: 3, 3: 3}


# --- hybrid retrieval ---------------------------------------------------------


def test_hybrid_retrieval_fuses_both_rankings(spark, sf_smoke):
    from nasa_asteroid_data_lakehouse_spark.plans.curation_queries import (
        _RRF_K,
        _RRF_TOP,
        hybrid_retrieval_documents,
    )

    out = hybrid_retrieval_documents(spark, sf_smoke).collect()
    assert len(out) == _RRF_TOP
    scores = [r["rrf_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    for r in out:
        expect = round(
            (1.0 / (_RRF_K + r["r_bm25"]) if r["r_bm25"] else 0.0)
            + (1.0 / (_RRF_K + r["r_cos"]) if r["r_cos"] else 0.0),
            9,
        )
        assert r["rrf_score"] == expect


# --- measured-diagnostics batch ----------------------------------------------


def test_minhash_error_within_sketch_bound(spark, sf_smoke):
    from nasa_asteroid_data_lakehouse_spark.plans.curation_queries import (
        minhash_error_pairs_documents,
    )

    out = minhash_error_pairs_documents(spark, sf_smoke).collect()
    assert len(out) > 0
    for r in out:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        # N=8 estimator quantizes to 1/8 steps; error bounded by 1
        assert 0.0 <= r["abs_err"] <= 1.0
        assert r["abs_err"] == round(abs(r["est_jaccard"] - r["jaccard"]), 6)
    # the estimator must beat a coin flip on average for a real corpus
    import statistics

    assert statistics.mean(r["abs_err"] for r in out) < 0.5


def test_mad_by_segment_is_outlier_robust(spark, tmp_path):
    from nasa_asteroid_data_lakehouse_spark.plans.curation_queries import (
        mad_by_segment_orders,
    )
    import os

    tmp = str(tmp_path)
    # one segment, prices 10..14 plus a 1e9 outlier: median/MAD barely
    # move, stddev would explode
    spark.createDataFrame(
        [(i, 1, float(p)) for i, p in enumerate([10, 11, 12, 13, 14, 1e9])],
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).write.parquet(os.path.join(tmp, "orders.parquet"))
    spark.createDataFrame(
        [(1, "SEG")], "c_custkey long, c_mktsegment string"
    ).write.parquet(os.path.join(tmp, "customer.parquet"))
    row = mad_by_segment_orders(spark, tmp).collect()[0]
    assert row["median_price"] == 12.5
    assert row["mad_price"] <= 2.0


# --- session concurrency ------------------------------------------------------


def test_session_concurrency_known_timeline(spark, tmp_path):
    import os
    from nasa_asteroid_data_lakehouse_spark.plans.curation_queries import (
        session_concurrency_events,
    )

    tmp = str(tmp_path)
    rows = [
        # user 1: one session 10:00-10:10
        (1, "2024-01-01 10:00:00", 1),
        (2, "2024-01-01 10:10:00", 1),
        # user 2: session 10:50-11:05 (crosses the hour boundary)
        (3, "2024-01-01 10:50:00", 2),
        (4, "2024-01-01 11:05:00", 2),
        # user 2 again after a >30min gap: separate session at 12:00
        (5, "2024-01-01 12:00:00", 2),
    ]
    spark.createDataFrame(
        [(i, __import__("datetime").datetime.fromisoformat(t), u) for i, t, u in rows],
        "event_id long, ts timestamp_ntz, user_id long",
    ).write.parquet(os.path.join(tmp, "events.parquet"))
    out = {
        str(r["hour"]): (r["n_sessions"], r["n_users"])
        for r in session_concurrency_events(spark, tmp).collect()
    }
    assert out["2024-01-01 10:00:00"] == (2, 2)  # both sessions touch hour 10
    assert out["2024-01-01 11:00:00"] == (1, 1)  # only user 2's first session
    assert out["2024-01-01 12:00:00"] == (1, 1)  # the gap split a new session


# --- dedup savings ------------------------------------------------------------


def test_dedup_savings_invariants(spark, sf_dir):
    # sf0.01: the smoke fixture's 500 docs are all fingerprint-unique,
    # so the positive-savings assertions need the correctness fixture
    from nasa_asteroid_data_lakehouse_spark.plans.curation_queries import (
        dedup_savings_documents,
    )

    r = dedup_savings_documents(spark, sf_dir).collect()[0]
    assert r["n_exact_unique"] <= r["n_docs"]
    assert r["tokens_exact"] <= r["total_tokens"]
    assert r["tokens_after_near"] <= r["total_tokens"]
    assert 0.0 <= r["pct_saved_exact"] <= 1.0
    assert 0.0 <= r["pct_saved_near"] <= 1.0
    # the fixture plants NEAR duplicates but no exact ones (verified:
    # all 500 normalized fingerprints are distinct at sf0.01), so the
    # exact stage saves nothing and the near-dup stage is what pays
    assert r["n_exact_unique"] == r["n_docs"]
    assert r["pct_saved_exact"] == 0.0
    assert r["n_dropped_near"] > 0
    assert r["pct_saved_near"] > 0.0


# --- pack efficiency ----------------------------------------------------------


def test_pack_efficiency_bounds(spark, sf_smoke):
    from nasa_asteroid_data_lakehouse_spark.plans.curation_queries import (
        pack_efficiency_documents,
    )

    for r in pack_efficiency_documents(spark, sf_smoke).collect():
        assert r["bins_used"] >= r["bins_lower_bound"] >= 1
        assert 0.0 < r["mean_fill"] <= 1.0
        assert r["mean_fill"] == round(
            r["total_tokens"] / (r["bins_used"] * 2048), 6
        )


# --- embedding outliers -------------------------------------------------------


def test_embedding_outliers_flags_degenerate_vector(spark, tmp_path):
    import os
    from nasa_asteroid_data_lakehouse_spark.plans.curation_queries import (
        embedding_outliers,
    )

    rows = [(i, [1.0, 0.0, 0.0]) for i in range(10)] + [
        (100, [50.0, 0.0, 0.0]),   # exploded norm
        (101, [0.001, 0.0, 0.0]),  # near-zero norm
    ]
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").write.parquet(
        os.path.join(str(tmp_path), "embeddings.parquet")
    )
    out = {r["vec_id"]: r for r in embedding_outliers(spark, str(tmp_path)).collect()}
    assert out[100]["is_outlier"] is True
    assert out[101]["is_outlier"] is True
    assert all(out[i]["is_outlier"] is False for i in range(10))
