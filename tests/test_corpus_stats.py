"""Corpus-distribution statistics: unigram surprisal (perplexity-proxy
quality score), per-source KL divergence vs the corpus, Zipf
rank-frequency slope, and per-user inter-arrival burstiness — each
oracle-checked against DuckDB plus an invariant/brute-force property.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark.llm import corpus_stats
from nasa_asteroid_data_lakehouse_spark.plans import analytics_queries as aq
from nasa_asteroid_data_lakehouse_spark.plans import llm_queries as lq
from tests.oracle import assert_matches_oracle


def _tokens(spark, sf_dir):
    """Token stream over the fixture documents — the SAME path the
    queries execute (corpus_stats.token_stream), not a test-local
    reimplementation that could drift."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus_stats.token_stream(docs, keep=("doc_id", "source"))


def test_unigram_surprisal_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        lq.unigram_surprisal_documents(spark, sf_dir),
        lq.UNIGRAM_SURPRISAL_SQL,
        sf_dir,
    )


def test_unigram_surprisal_bounds_and_brute_force(spark, sf_smoke):
    """0 <= surprisal <= ln(N) (token prob in [1/N, 1]), and the full
    result reproduces a pandas brute-force recomputation."""
    got = lq.unigram_surprisal_documents(spark, sf_smoke).toPandas()
    docs = (
        spark.read.parquet(f"{sf_smoke}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )
    toks = {}
    for _, r in docs.iterrows():
        ts = " ".join(str(r["text"]).lower().split()).split()
        if ts and str(r["text"]).strip():
            toks[r["doc_id"]] = ts
    counts: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
    total = sum(counts.values())
    assert len(got) == len(toks)
    ln_n = math.log(total)
    by_id = got.set_index("doc_id")
    for doc_id, ts in toks.items():
        want = ln_n - sum(math.log(counts[t]) for t in ts) / len(ts)
        row = by_id.loc[doc_id]
        assert row["n_tokens"] == len(ts)
        assert abs(row["mean_surprisal"] - want) < 1e-5
        assert -1e-9 <= row["mean_surprisal"] <= ln_n + 1e-9


def test_kl_divergence_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        lq.kl_divergence_sources(spark, sf_dir), lq.KL_SOURCES_SQL, sf_dir
    )


def test_kl_divergence_nonnegative_and_consistent(spark, sf_smoke):
    """Gibbs' inequality: KL(P_s || P_corpus) >= 0 for every source;
    per-source token totals must sum to the corpus total."""
    got = lq.kl_divergence_sources(spark, sf_smoke).toPandas()
    assert (got["kl_vs_corpus"] >= -1e-9).all()
    total = _tokens(spark, sf_smoke).count()
    assert int(got["n_tokens"].sum()) == total
    assert (got["n_terms"] <= got["n_tokens"]).all()


def test_zipf_slope_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        lq.zipf_slope_tokens(spark, sf_dir), lq.ZIPF_SLOPE_SQL, sf_dir
    )


def test_zipf_slope_invariants(spark, sf_smoke):
    """Rank-frequency slope is negative (frequency is non-increasing in
    rank by construction), R^2 in [0, 1], and the fit covers exactly
    min(_ZIPF_TOP, |V|) points."""
    row = lq.zipf_slope_tokens(spark, sf_smoke).collect()[0]
    vocab = (
        _tokens(spark, sf_smoke).select("term").distinct().count()
    )
    assert row["n_terms"] == min(lq._ZIPF_TOP, vocab)
    assert row["slope"] < 0
    assert 0.0 <= row["r2"] <= 1.0


def test_burstiness_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        aq.interarrival_burstiness_users(spark, sf_dir),
        aq.BURSTINESS_SQL,
        sf_dir,
    )


def test_burstiness_bounds_and_brute_force(spark, sf_smoke):
    """B = (sigma-mu)/(sigma+mu) in [-1, 1], cv >= 0; spot-check one
    user against a pandas recomputation of the same gap series."""
    got = aq.interarrival_burstiness_users(spark, sf_smoke).toPandas()
    assert len(got) > 0
    assert ((got["burstiness"] >= -1 - 1e-9) & (got["burstiness"] <= 1 + 1e-9)).all()
    assert (got["cv"] >= 0).all()
    assert (got["n_gaps"] >= 5).all()

    uid = int(got.sort_values("user_id").iloc[0]["user_id"])
    ev = (
        spark.read.parquet(f"{sf_smoke}/events.parquet")
        .where(F.col("user_id") == uid)
        .select("ts", "event_id")
        .toPandas()
        .sort_values(["ts", "event_id"])
    )
    gaps = ev["ts"].diff().dropna().dt.total_seconds()
    mu, sd = gaps.mean(), gaps.std(ddof=1)
    row = got[got["user_id"] == uid].iloc[0]
    assert row["n_gaps"] == len(gaps)
    assert abs(row["mean_gap_s"] - round(mu, 3)) < 1e-6
    assert abs(row["burstiness"] - (sd - mu) / (sd + mu)) < 1e-5


def test_surprisal_flags_repetitive_doc(spark, sf_smoke):
    """A document made of the corpus' most common tokens must score
    strictly lower surprisal than one made of rare tokens — the signal
    the quality filter exists for.  Built on a synthetic corpus where
    the contrast is guaranteed."""
    rows = [
        (1, "the the the the the", "s"),
        (2, "the cat sat on mat", "s"),
        (3, "zyxqv plugh xyzzy quux frobnitz", "s"),
        (4, "the the cat cat sat", "s"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        got = (
            lq.unigram_surprisal_documents(spark, d)
            .toPandas()
            .set_index("doc_id")
        )
    assert (
        got.loc[1, "mean_surprisal"]
        < got.loc[4, "mean_surprisal"]
        < got.loc[3, "mean_surprisal"]
    )


def test_boilerplate_strip_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        lq.boilerplate_strip_documents(spark, sf_dir),
        lq.BOILERPLATE_STRIP_SQL,
        sf_dir,
    )


def test_boilerplate_strip_semantics(spark):
    """Tokens over the doc-frequency cut vanish from every document,
    below-cut tokens survive in original order, and an all-boilerplate
    document survives as an empty string."""
    from nasa_asteroid_data_lakehouse_spark.llm.curation import (
        strip_ubiquitous_tokens,
    )

    rows = [
        (1, "common alpha common beta"),
        (2, "common gamma beta common"),
        (3, "common common common"),
        (4, "delta common epsilon"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # doc_freq: common=4/4 (stripped at 0.5), beta=2/4 (kept: <= cut)
    got = (
        strip_ubiquitous_tokens(df, max_df_frac=0.5)
        .toPandas()
        .set_index("doc_id")
    )
    assert got.loc[1, "stripped_text"] == "alpha beta"
    assert got.loc[2, "stripped_text"] == "gamma beta"
    assert got.loc[3, "stripped_text"] == ""
    assert got.loc[3, "n_after"] == 0 and got.loc[3, "n_before"] == 3
    assert got.loc[4, "stripped_text"] == "delta epsilon"
    assert (got["n_after"] <= got["n_before"]).all()


def test_top_session_paths_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        aq.top_session_paths_events(spark, sf_dir),
        aq.TOP_SESSION_PATHS_SQL,
        sf_dir,
    )


def test_top_session_paths_shape(spark, sf_smoke):
    got = aq.top_session_paths_events(spark, sf_smoke).toPandas()
    assert 0 < len(got) <= 20
    assert (got["path"].str.count(">") <= 4).all()
    # returned counts are the global top: sorted non-increasing
    assert (got["n_sessions"].diff().dropna() <= 0).all()


def test_time_weighted_value_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        aq.time_weighted_value_events(spark, sf_dir),
        aq.TIME_WEIGHTED_VALUE_SQL,
        sf_dir,
    )


def test_time_weighted_value_is_bounded_weighted_mean(spark, sf_smoke):
    """TWA lies within [min, max] of the user's interval values, and a
    brute-force pandas recomputation agrees for one user."""
    got = aq.time_weighted_value_events(spark, sf_smoke).toPandas()
    assert len(got) > 0
    uid = int(got.sort_values("user_id").iloc[0]["user_id"])
    ev = (
        spark.read.parquet(f"{sf_smoke}/events.parquet")
        .where(F.col("user_id") == uid)
        .where(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select("ts", "event_id", "value")
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    gaps = (ev["ts"].shift(-1) - ev["ts"]).dt.total_seconds()[:-1]
    vals = ev["value"][: len(gaps)]
    want = (vals * gaps).sum() / gaps.sum()
    row = got[got["user_id"] == uid].iloc[0]
    assert abs(row["twa_value"] - want) < 1e-4
    assert vals.min() - 1e-9 <= row["twa_value"] <= vals.max() + 1e-9


def test_jsd_source_pairs_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        lq.jsd_source_pairs(spark, sf_dir), lq.JSD_SOURCES_SQL, sf_dir
    )


def test_jsd_bounds_symmetry_and_identity(spark, sf_smoke):
    """JSD in [0, ln 2], one row per unordered source pair, and two
    identical distributions diverge by ~0."""
    got = lq.jsd_source_pairs(spark, sf_smoke).toPandas()
    n_sources = (
        spark.read.parquet(f"{sf_smoke}/documents.parquet")
        .where("text IS NOT NULL AND trim(text) <> ''")
        .select("source")
        .distinct()
        .count()
    )
    assert len(got) == n_sources * (n_sources - 1) // 2
    assert (got["jsd"] >= -1e-9).all()
    assert (got["jsd"] <= math.log(2) + 1e-9).all()

    from nasa_asteroid_data_lakehouse_spark.llm.corpus_stats import jsd_pairs

    twin = spark.createDataFrame(
        [("a", "x y z x"), ("b", "x y z x"), ("c", "totally different words")],
        ["source", "text"],
    )
    tp = jsd_pairs(twin).toPandas().set_index(["source_a", "source_b"])
    assert abs(tp.loc[("a", "b"), "jsd"]) < 1e-9
    assert tp.loc[("a", "c"), "jsd"] > 0.5


def test_rolling_active_users_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        aq.rolling_active_users_events(spark, sf_dir),
        aq.ROLLING_ACTIVE_USERS_SQL,
        sf_dir,
    )


def test_rolling_active_users_invariants(spark, sf_smoke):
    """WAU >= DAU (a day's actives are inside its own window), so
    stickiness <= 1; spot-check one full window by brute force."""
    got = aq.rolling_active_users_events(spark, sf_smoke).toPandas()
    assert len(got) > 0
    assert (got["wau"] >= got["dau"]).all()
    assert ((got["stickiness"] > 0) & (got["stickiness"] <= 1)).all()

    import datetime

    day = sorted(got["day"])[len(got) // 2]
    lo = day - datetime.timedelta(days=6)
    want = (
        spark.read.parquet(f"{sf_smoke}/events.parquet")
        .where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .where(F.to_date("ts").between(F.lit(lo), F.lit(day)))
        .select("user_id")
        .distinct()
        .count()
    )
    assert int(got[got["day"] == day]["wau"].iloc[0]) == want


def test_key_skew_profile_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        aq.key_skew_profile_orders(spark, sf_dir),
        aq.KEY_SKEW_PROFILE_SQL,
        sf_dir,
    )


def test_key_skew_profile_invariants(spark, sf_smoke):
    row = aq.key_skew_profile_orders(spark, sf_smoke).collect()[0]
    assert row["max_per_key"] >= row["p99_per_key"] >= row["p90_per_key"]
    assert row["p90_per_key"] >= row["p50_per_key"] > 0
    assert row["skew_ratio"] >= 1.0
    assert 0 < row["top1_share"] <= 1.0


def test_token_entropy_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        lq.token_entropy_sources(spark, sf_dir), lq.TOKEN_ENTROPY_SQL, sf_dir
    )


def test_token_entropy_bounds(spark, sf_smoke):
    """0 <= H <= ln(n_terms) (uniform maximizes entropy), so evenness
    in (0, 1]; a single-token source pins H = 0."""
    got = lq.token_entropy_sources(spark, sf_smoke).toPandas()
    assert (got["entropy"] >= -1e-9).all()
    assert (
        got["entropy"] <= got["n_terms"].map(math.log) + 1e-9
    ).all()
    assert ((got["evenness"] > 0) & (got["evenness"] <= 1 + 1e-9)).all()

    from nasa_asteroid_data_lakehouse_spark.llm.corpus_stats import (
        token_entropy_by_group,
    )

    tiny = spark.createDataFrame(
        [("mono", "x x x x"), ("uni", "a b c d")], ["source", "text"]
    )
    tp = token_entropy_by_group(tiny).toPandas().set_index("source")
    assert tp.loc["mono", "entropy"] == 0.0
    assert tp.loc["mono", "evenness"] is None or pd.isna(tp.loc["mono", "evenness"])
    assert abs(tp.loc["uni", "entropy"] - math.log(4)) < 1e-6
    assert abs(tp.loc["uni", "evenness"] - 1.0) < 1e-6


def test_monthly_revenue_growth_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        aq.monthly_revenue_growth_orders(spark, sf_dir),
        aq.MONTHLY_GROWTH_SQL,
        sf_dir,
    )


def test_monthly_revenue_growth_reconstructs(spark, sf_smoke):
    """Month revenues chained by growth_pct reproduce each other, and
    the only NULL growth is the first month."""
    got = (
        aq.monthly_revenue_growth_orders(spark, sf_smoke)
        .toPandas()
        .sort_values("month")
        .reset_index(drop=True)
    )
    assert pd.isna(got.loc[0, "growth_pct"])
    assert got["growth_pct"][1:].notna().all()
    for i in range(1, len(got)):
        implied = got.loc[i - 1, "revenue"] * (1 + got.loc[i, "growth_pct"] / 100)
        assert abs(implied - got.loc[i, "revenue"]) / got.loc[i, "revenue"] < 1e-5


def test_conversion_latency_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        aq.conversion_latency_events(spark, sf_dir),
        aq.CONVERSION_LATENCY_SQL,
        sf_dir,
    )


def test_conversion_latency_invariants(spark, sf_smoke):
    row = aq.conversion_latency_events(spark, sf_smoke).collect()[0]
    assert row["n_converted"] > 0
    assert 0 < row["p50_s"] <= row["p90_s"]
    assert row["mean_s"] > 0


def test_edit_distance_pairs_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        lq.edit_distance_pairs_documents(spark, sf_dir),
        lq.EDIT_DISTANCE_PAIRS_SQL,
        sf_dir,
    )


def test_edit_distance_pairs_invariants(spark, sf_smoke):
    """Exact duplicates score lev=0 / sim=1, every sim in [0, 1], and
    the pair set equals the LSH candidate set (the verifier adds
    columns, never drops candidates)."""
    got = lq.edit_distance_pairs_documents(spark, sf_smoke).toPandas()
    cands = lq.minhash_lsh_pairs_documents(spark, sf_smoke).toPandas()
    assert len(got) == len(cands)
    assert (got["lev"] >= 0).all()
    assert ((got["edit_sim"] >= -1e-9) & (got["edit_sim"] <= 1 + 1e-9)).all()
    exact = got[got["lev"] == 0]
    if len(exact):
        assert (exact["edit_sim"] == 1.0).all()


def test_vocab_coverage_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        lq.vocab_coverage_curve(spark, sf_dir), lq.VOCAB_COVERAGE_SQL, sf_dir
    )


def test_vocab_coverage_monotone(spark, sf_smoke):
    """Coverage is non-decreasing in k, bounded by 1, and the largest
    in-vocab mark covers every occurrence of the top-k terms it
    claims (cum <= total always; cum == total only when k >= |V|)."""
    got = (
        lq.vocab_coverage_curve(spark, sf_smoke)
        .toPandas()
        .sort_values("top_k")
        .reset_index(drop=True)
    )
    assert len(got) > 0
    assert (got["coverage"].diff().dropna() >= 0).all()
    assert (got["coverage"] <= 1 + 1e-9).all()
    assert (got["covered_tokens"] <= got["total_tokens"]).all()
    full = got[got["top_k"] >= got["n_terms"]]
    if len(full):
        assert (full["coverage"] == 1.0).all()


def test_linear_attribution_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        aq.linear_attribution_events(spark, sf_dir),
        aq.LINEAR_ATTRIBUTION_SQL,
        sf_dir,
    )


def test_linear_attribution_conserves_credit(spark, sf_smoke):
    """Total credit equals the number of purchases that have at least
    one touch in window (each such purchase distributes exactly one
    unit), and every purchase's credit shares sum to 1."""
    got = aq.linear_attribution_events(spark, sf_smoke).toPandas()
    events = spark.read.parquet(f"{sf_smoke}/events.parquet").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    p = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("event_id").alias("pid")
    )
    t = events.where(F.col("event_type").isin("view", "click", "signup")).select(
        "user_id", "ts"
    )
    touched = (
        t.join(
            p,
            (t["user_id"] == p["user_id"])
            & (F.col("ts") < F.col("pts"))
            & (F.col("ts") >= F.col("pts") - F.expr("INTERVAL 24 HOURS")),
        )
        .select("pid")
        .distinct()
        .count()
    )
    assert abs(got["credit"].sum() - touched) < 1e-3


def test_rolling_correlation_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        aq.rolling_correlation_events(spark, sf_dir),
        aq.ROLLING_CORR_SQL,
        sf_dir,
    )


def test_rolling_correlation_bounds_and_brute_force(spark, sf_smoke):
    """corr in [-1, 1]; spot-check one full 7-day window against
    pandas' Pearson correlation."""
    got = (
        aq.rolling_correlation_events(spark, sf_smoke)
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    defined = got["corr_7d"].dropna()
    assert ((defined >= -1 - 1e-9) & (defined <= 1 + 1e-9)).all()
    if len(got) >= 7:
        i = 7
        window = got.iloc[i - 6 : i + 1]
        want = window["x"].astype(float).corr(window["y"].astype(float))
        have = got.loc[i, "corr_7d"]
        if pd.notna(want) and pd.notna(have):
            assert abs(have - want) < 1e-6


def test_hourly_seasonality_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        aq.hourly_seasonality_events(spark, sf_dir),
        aq.HOURLY_SEASONALITY_SQL,
        sf_dir,
    )


def test_hourly_seasonality_partitions_unity(spark, sf_smoke):
    got = aq.hourly_seasonality_events(spark, sf_smoke).toPandas()
    assert got["dow_iso"].between(1, 7).all()
    assert got["hour"].between(0, 23).all()
    assert abs(got["share"].sum() - 1.0) < 1e-3
    total = spark.read.parquet(f"{sf_smoke}/events.parquet").where(
        F.col("ts").isNotNull()
    ).count()
    assert int(got["n_events"].sum()) == total


def test_psi_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        aq.psi_orders_price(spark, sf_dir), aq.PSI_SQL, sf_dir
    )


def test_psi_identical_distributions_score_zero(spark, sf_smoke):
    """PSI >= 0 always; PSI of a distribution against itself is ~0
    (same deciles, same histogram), and the fixture's date split —
    prices independent of date — sits well under the 0.1 'stable'
    threshold."""
    row = aq.psi_orders_price(spark, sf_smoke).collect()[0]
    assert row["n_bins"] >= 1
    assert row["psi"] >= -1e-9
    assert row["psi"] < 0.1
    assert row["ref_rows"] > 0 and row["cur_rows"] > 0
