"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` maps every implemented operator from SURVEY.md §2 to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the
DuckDB-equivalent SQL the driver cross-checks against at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nasa_asteroid_data_lakehouse_spark.plans import (
    analytics_queries,
    curation_queries,
    llm_queries,
    neows_queries,
    r05b_queries,
    streaming_queries,
    operator_queries,
    stats_queries,
    tpch_queries,
)
from nasa_asteroid_data_lakehouse_spark.plans import queries as plans

SF0001 = "/root/testdata/sf0.001"

# Round-5 registration switch: flip to True once CORRECTNESS_r04
# confirms the frozen 190-surface (VERDICT r03 ask #1), which lifts the
# freeze and serves plans/r05_queries.py's staged batch (gate-verified
# in round 4 via driver_sim --staged; see the round-4c SKILL notes for
# the companion checklist — KEY_UNIQUE and _BNLJ_ALLOWED entries are
# already pre-wired).
REGISTER_R05 = True

# Round-6 registration switch: flip to True at round-6 start once
# CORRECTNESS_r05 lands; serves plans/r06_queries.py's staged batch
# (gate-verified in round 5 via driver_sim --staged).  On flip, add
# the batch's BNLJ-allowlist entries to tests/test_plan_quality.py
# (stl_decomposition_daily_events, stump_split_events,
# pca_power_iteration_embeddings, markov_stationary_events,
# stylometry_delta_sources, ndcg_lsh_embeddings — all bounded
# single-row / broadcast-anchor shapes) and bench entries.
REGISTER_R06 = True

# Round-7 registration switch: flip to True at round-7 start once
# CORRECTNESS_r06 lands; serves plans/r07_queries.py's 13 staged
# queries (gate-verified in round 6 via driver_sim --staged; see
# SURVEY.md M113-M125).  On flip: the _BNLJ_ALLOWED entries
# (skyline_daily_events, bootstrap_ci_orders,
# tfidf_cosine_pairs_documents) and the KEY_UNIQUE_PRECONDITION entry
# (span_dedup_rewrite_documents) are already committed; bench picks
# the batch up automatically.  Then run update_rotation 7.
REGISTER_R07 = True

# Round-8 registration switch: flip to True at round-8 start once
# CORRECTNESS_r07 lands; serves plans/r08_queries.py's 12 staged
# queries (gate-verified in round 7 via driver_sim --staged: IVF-PQ
# top-k + recall, multi-table transactional snapshot, OPTIMIZE ZORDER
# roundtrip, LSH index maintenance, CDF apply across schema
# evolution, auto-plane hubness, exactly-once streaming upsert
# replay, CDF-preimage incremental view maintenance).  On flip: the
# _BNLJ_ALLOWED entries
# (ivfpq_recall_embeddings, lsh_index_maintenance_embeddings) and the
# KEY_UNIQUE_PRECONDITION entries (ivfpq pair, txn snapshot, zorder
# roundtrip) are already committed; bench picks the batch up
# automatically.  Then run update_rotation 8.
REGISTER_R08 = True

# Round-9 registration switch: flip to True at round-9 start once
# CORRECTNESS_r08 lands; serves plans/r09_queries.py's staged batch
# (gate-verified in round 8 via driver_sim --staged + adversarial,
# pytest pins in tests/test_r09_staged.py): stream-stream
# interval-join replay, stream-static enrich replay, VACUUM/retention
# lifecycle, bucket re-partitioning round-trip, IVF nprobe tuning
# sweep, mixture temperature sweep, physical erasure audit,
# LEFT-OUTER interval-join replay (watermark-emission semantics),
# context-length packing sweep, jaccard threshold sweep.  Pre-wired: KEY_UNIQUE entry (ivf_nprobe_sweep_embeddings —
# ORDER-BY-id seed quantizer) and BNLJ allowlist entry (same name,
# broadcast anchors x corpus + 1-row count broadcasts).  Then run
# update_rotation 9.
REGISTER_R09 = True

# Round-10 registration switch: flip to True at round-10 start once
# CORRECTNESS_r09 lands; serves plans/r10_queries.py's staged batch
# (gate-verified in round 9 via driver_sim --staged across all six
# fixtures + adversarial, pytest pins in tests/test_r10_staged.py):
# timestamp-as-of time travel, RESTORE with CDF undo feed, deletion-
# vector merge-on-read + upsert materialization, lake history audit,
# CDF stream replay across commit types, quantization-bits sweep
# (int8/int4/int2), stream-stream FULL OUTER interval-join replay,
# vector-store-over-lakehouse top-k with retired vectors, OPTIMIZE
# ZORDER DV purge, streaming CDF subscription through the
# table_changes Python DataSource, decontamination n-gram sweep,
# quality-gate threshold sweep, continuous replication mirror,
# sessionization gap sweep.  Pre-wired: _BNLJ_ALLOWED entry
# (quant_bits_sweep_embeddings — broadcast anchors x corpus) and
# KEY_UNIQUE entry (dv_vector_store_topk_embeddings — per-identity
# vector store).  Then run update_rotation 10.
REGISTER_R10 = True

# Round-11 staged batch (plans/r11_queries.py, TEN queries): flip to
# True at ROUND-11 START, after CORRECTNESS_r10 lands.  Replication
# across rebucket (the data_change=false planner skip), maintenance
# CDF census, transactional snapshot across deferred-delete commits,
# upsert schema merge, schema evolution mid-subscription, Gopher
# repetition census, Lloyd-iterated k-means (SemDeDup's clustering
# step), sliding-window streaming replay, change-feed vacuum boundary
# (fail-closed), clone-bootstrap replication.  Pre-wired: KEY_UNIQUE
# entry (kmeans_lloyd_embeddings — ORDER-BY-id seeds).  Then run
# update_rotation 11.
REGISTER_R11 = False


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return plans.q1_pricing_summary(spark, SF0001)


# The round driver checks only ~50 queries per round, in queries()
# iteration order.  To get every operator a driver-green row we rotate
# the frontier each round: queries whose LAST driver check failed go
# first (re-prove the fix), never-checked queries next, already-green
# queries last.  The ordering derives from the CORRECTNESS_r*.json
# files the driver leaves in the repo (latest round wins per query);
# the hardcoded round-1 lists below are only the fallback when no
# files are present.
_ROUND1_GREEN = [
    "q1_pricing_summary", "q3_top_unshipped_orders", "q5_revenue_by_nation",
    "dedup_exact_documents", "dedup_all_columns_documents",
    "duplicate_groups_documents", "profile_documents", "normalize_documents",
    "union_by_name_parties", "topk_orders", "topk_orders_per_customer",
    "running_customer_revenue", "customers_without_orders",
    "merge_upsert_orders", "surrogate_keys_nation", "calendar_events",
    "from_json_events", "windowed_event_counts", "gap_filled_hourly_events",
    "zorder_keys_orders", "text_stats_documents", "lang_id_documents",
    "fingerprint_documents", "exact_dedup_documents", "minhash_documents",
    "ngram_jaccard_documents", "cosine_topk_embeddings",
    "lsh_buckets_embeddings", "media_metadata_documents", "simhash_documents",
    "simhash_pairs_documents", "embedding_near_dups", "lsh_topk_embeddings",
    "ivf_topk_embeddings", "minhash_lsh_pairs_documents",
    "near_dup_clusters_documents", "holdout_sample_documents",
    "decontaminate_documents", "vector_stats_embeddings",
    "repetition_stats_documents", "chunk_documents_windows",
    "pii_scrub_documents", "weighted_sample_documents",
    "semantic_dedup_embeddings", "incremental_admit_documents",
    "cms_token_counts_documents",
]
_ROUND1_RED = [
    "byte_features_documents", "curation_pipeline_documents",
    "training_shards_documents", "balanced_mixture_documents",
]


def _driver_history() -> tuple[list[str], list[str], dict[str, int]]:
    """(red, green, last_checked_round) from CORRECTNESS_r*.json, latest
    round winning per query; falls back to the round-1 constants."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    status: dict[str, bool] = {}
    last_checked: dict[str, int] = {}
    # Numeric round sort (ADVICE r06 twin): lexicographic file order only
    # matches round order while round numbers stay zero-padded two digits.
    def _round_no(path: str) -> int:
        m = re.search(r"r(\d+)\.json$", path)
        return int(m.group(1)) if m else 0

    files = sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")), key=_round_no)
    for path in files:
        rnd = _round_no(path)
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            ok = (
                isinstance(row, dict)
                and row.get("err") is None
                and row.get("rows_match") is not False
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            )
            status[name] = ok
            last_checked[name] = max(last_checked.get(name, 0), rnd)
    if not status:
        return list(_ROUND1_RED), list(_ROUND1_GREEN), {}
    red = [n for n, ok in status.items() if not ok]
    green = [n for n, ok in status.items() if ok]
    return red, green, last_checked


def _rotation_state() -> tuple[list[str], list[str], int]:
    """(pinned, demoted, pin_round) from ROTATION_STATE.json.

    The driver checks only the first ~50 queries() names per round and
    does not always leave a CORRECTNESS_r{N}.json behind; without state
    the order would repeat and the tail would never be checked.  The
    LAST recorded round's head is PINNED verbatim to the front (it was
    computed for the upcoming driver run; re-deriving it after
    recording would demote its own entries — circular).  Heads of
    EARLIER rounds are presumed already exposed and demote behind
    never-exposed names.  Real CORRECTNESS data, when present,
    supersedes both."""
    import json
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "ROTATION_STATE.json")) as fh:
            rounds = json.load(fh).get("rounds", [])
    except (OSError, ValueError):
        return [], [], 0
    if not rounds:
        return [], [], 0
    pinned = list(rounds[-1].get("head", []))
    pin_round = int(rounds[-1].get("round", 0))
    demoted: list[str] = []
    for entry in rounds[:-1]:
        for name in entry.get("head", []):
            if name not in demoted and name not in pinned:
                demoted.append(name)
    return pinned, demoted, pin_round


def _rotate(full: dict) -> dict:
    """Pinned head (this round's planned driver window) first, then red
    fixes, then names no round has surfaced, then presumed-exposed
    names from earlier rounds, greens last (stalest driver check first).

    Self-advancing (VERDICT r02 ask #2, refined r07): a pinned name is
    CONSUMED — dropped from the pin so the tail advances — only when a
    driver run from the pin's own round (or later) has re-proved it
    green, i.e. last_checked >= pin_round.  Greens checked only in
    EARLIER rounds stay pinned: the round-close rotation put them there
    deliberately to refresh stale confirmations (VERDICT r05 ask #5),
    and dropping them re-served the first-checked greens instead of the
    stalest (the r06 window re-proved q1/q3/q5 while lsh_topk et al.
    stayed r01-vintage)."""
    red, green, last_checked = _driver_history()
    pinned, demoted, pin_round = _rotation_state()
    seen = set(red) | set(green)
    green_set = set(green)
    consumed = [
        n
        for n in pinned
        if n in green_set and last_checked.get(n, 0) >= pin_round
    ]
    if consumed:
        demoted = demoted + [n for n in consumed if n not in set(demoted)]
        pinned = [n for n in pinned if n not in set(consumed)]
    ordered = [k for k in pinned if k in full]
    taken = set(ordered)
    ordered += [k for k in red if k in full and k not in taken]
    taken.update(ordered)
    ordered += [
        k for k in full if k not in taken and k not in seen and k not in set(demoted)
    ]
    taken.update(ordered)
    ordered += [k for k in demoted if k in full and k not in taken and k not in seen]
    taken.update(ordered)
    green_tail = [k for k in green if k in full and k not in taken]
    green_tail.sort(key=lambda k: last_checked.get(k, 0))
    ordered += green_tail
    return {k: full[k] for k in ordered}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out = {
        "q1_pricing_summary": plans.q1_pricing_summary,
        "q3_top_unshipped_orders": plans.q3_top_unshipped_orders,
        "q5_revenue_by_nation": plans.q5_revenue_by_nation,
    }
    out.update(operator_queries.QUERIES)
    out.update(llm_queries.QUERIES)
    out.update(analytics_queries.QUERIES)
    out.update(tpch_queries.QUERIES)
    out.update(curation_queries.QUERIES)
    out.update(stats_queries.QUERIES)
    out.update(neows_queries.QUERIES)
    out.update(streaming_queries.QUERIES)
    out.update(r05b_queries.QUERIES)
    if REGISTER_R05:
        from nasa_asteroid_data_lakehouse_spark.plans import r05_queries

        out.update(r05_queries.STAGED_QUERIES)
    if REGISTER_R06:
        from nasa_asteroid_data_lakehouse_spark.plans import r06_queries

        out.update(r06_queries.STAGED_QUERIES)
    if REGISTER_R07:
        from nasa_asteroid_data_lakehouse_spark.plans import r07_queries

        out.update(r07_queries.STAGED_QUERIES)
    if REGISTER_R08:
        from nasa_asteroid_data_lakehouse_spark.plans import r08_queries

        out.update(r08_queries.STAGED_QUERIES)
    if REGISTER_R09:
        from nasa_asteroid_data_lakehouse_spark.plans import r09_queries

        out.update(r09_queries.STAGED_QUERIES)
    if REGISTER_R10:
        from nasa_asteroid_data_lakehouse_spark.plans import r10_queries

        out.update(r10_queries.STAGED_QUERIES)
    if REGISTER_R11:
        from nasa_asteroid_data_lakehouse_spark.plans import r11_queries

        out.update(r11_queries.STAGED_QUERIES)
    return _rotate(out)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per queries() key."""
    out = {
        "q1_pricing_summary": plans.Q1_SQL,
        "q3_top_unshipped_orders": plans.Q3_SQL,
        "q5_revenue_by_nation": plans.Q5_SQL,
    }
    out.update(operator_queries.ORACLES)
    out.update(llm_queries.ORACLES)
    out.update(analytics_queries.ORACLES)
    out.update(tpch_queries.ORACLES)
    out.update(curation_queries.ORACLES)
    out.update(stats_queries.ORACLES)
    out.update(neows_queries.ORACLES)
    out.update(streaming_queries.ORACLES)
    out.update(r05b_queries.ORACLES)
    if REGISTER_R05:
        from nasa_asteroid_data_lakehouse_spark.plans import r05_queries

        out.update(r05_queries.STAGED_ORACLES)
    if REGISTER_R06:
        from nasa_asteroid_data_lakehouse_spark.plans import r06_queries

        out.update(r06_queries.STAGED_ORACLES)
    if REGISTER_R07:
        from nasa_asteroid_data_lakehouse_spark.plans import r07_queries

        out.update(r07_queries.STAGED_ORACLES)
    if REGISTER_R08:
        from nasa_asteroid_data_lakehouse_spark.plans import r08_queries

        out.update(r08_queries.STAGED_ORACLES)
    if REGISTER_R09:
        from nasa_asteroid_data_lakehouse_spark.plans import r09_queries

        out.update(r09_queries.STAGED_ORACLES)
    if REGISTER_R10:
        from nasa_asteroid_data_lakehouse_spark.plans import r10_queries

        out.update(r10_queries.STAGED_ORACLES)
    if REGISTER_R11:
        from nasa_asteroid_data_lakehouse_spark.plans import r11_queries

        out.update(r11_queries.STAGED_ORACLES)
    return _rotate(out)
