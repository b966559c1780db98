"""Corpus-distribution statistics: unigram surprisal (perplexity-proxy
quality scoring), per-group KL divergence against the corpus token
distribution, and the Zipf rank-frequency slope.

These are the distributional health gauges of a training-data pipeline:
surprisal flags boilerplate/gibberish documents under a corpus-built
language model (the CCNet-style filter), KL quantifies how differently
each mixture component uses the shared vocabulary, and the Zipf slope
summarizes whether the corpus still looks like natural language.

Scale shape (all three): one explode over the token stream + hash
aggregations keyed on term / (group, term); the per-term count table is
O(|V|) — bounded and small next to the corpus — so score joins
broadcast it and the token stream itself never shuffles for the join.
No reference analog: the reference's aggregate surface is
count/distinct only (``src/etl/silver_to_gold.py``); net-new per the
LLM-pipeline brief.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark.llm import text

__all__ = [
    "token_stream",
    "unigram_surprisal",
    "group_term_counts",
    "kl_by_group",
    "token_entropy_by_group",
    "jsd_pairs",
    "zipf_slope",
]

LN2 = math.log(2.0)


def token_stream(
    df: DataFrame,
    text_col: str = "text",
    keep: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """One row per token OCCURRENCE (not distinct): (*keep, term).
    Blank/NULL texts are excluded entirely — a document with no tokens
    has no distribution to score."""
    return (
        df.where(F.trim(text_col) != "")
        .select(
            *keep,
            F.explode(text.tokens(text.normalized_text(text_col))).alias("term"),
        )
    )


def unigram_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Per-document mean unigram surprisal under the corpus' own
    unigram LM: mean_surprisal(d) = ln(N) - sum(tf·ln(c(t)))/sum(tf)
    over the doc's DISTINCT terms (tf = the doc's term frequency),
    algebraically the mean of -ln(p(t)) over occurrences, written as
    the tf-weighted form an oracle reproduces with the same float ops.

    Returns (id_col, n_tokens, mean_surprisal).  The per-doc
    (term, tf) table is the only corpus aggregation; the corpus count
    table and total N are exact integer re-aggregations of it, and
    the score join moves O(Σ distinct terms per doc) rows instead of
    O(N) occurrences.  doc_tf is deliberately NOT localCheckpoint-ed:
    it is O(corpus)-sized, and materializing it costs more memory
    than recomputing the narrow explode+agg (measured equal-speed
    solo at 1M docs, and the materialized form degrades/OOMs when
    checkpoint blocks accumulate across a session — only the
    O(|V|)-bounded tables earn a checkpoint, per kl_by_group).  The
    O(|V|) count-table broadcast keeps the scoring join map-side.
    """
    toks = token_stream(df, text_col, keep=(id_col,))
    doc_tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    cnt = doc_tf.groupBy("term").agg(F.sum("tf").alias("c"))
    total = cnt.agg(F.sum("c")).collect()[0][0] or 0
    return (
        doc_tf.join(F.broadcast(cnt), "term")
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(
                F.log(F.lit(total).cast("double"))
                - F.sum(F.col("tf") * F.log("c")) / F.sum("tf"),
                round_to,
            ).alias("mean_surprisal"),
        )
    )


def group_term_counts(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(group, term, c_st): token-occurrence counts per group —
    localCheckpoint-ed, O(groups × |V|), the single corpus scan shared
    by the distributional comparisons (KL, JSD).  Every coarser count
    (per-term, per-group, corpus total) is an exact integer
    re-aggregation of this table."""
    toks = token_stream(df, text_col, keep=(group_col,))
    return (
        toks.groupBy(group_col, "term")
        .agg(F.count(F.lit(1)).alias("c_st"))
        .localCheckpoint(eager=False)
    )


def kl_by_group(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """KL(P_group || P_corpus) over unigram distributions, per group.
    Finite by construction (every group term has corpus support).

    Returns (group_col, n_tokens, n_terms, kl_vs_corpus).  The token
    stream is scanned exactly ONCE: the (group, term) count table —
    localCheckpoint-ed, O(groups × |V|) — is the only corpus
    aggregation; the per-term corpus counts, per-group totals, and the
    corpus total are all exact integer re-aggregations of it.
    """
    st = group_term_counts(df, group_col, text_col)
    ct = st.groupBy("term").agg(F.sum("c_st").alias("c_t"))
    grp_tot = st.groupBy(group_col).agg(
        F.sum("c_st").alias("n_tokens"), F.count(F.lit(1)).alias("n_terms")
    )
    total = st.agg(F.sum("c_st")).collect()[0][0] or 0
    joined = st.join(F.broadcast(ct), "term").join(F.broadcast(grp_tot), group_col)
    contrib = (F.col("c_st") / F.col("n_tokens")) * F.log(
        (F.col("c_st") / F.col("n_tokens")) / (F.col("c_t") / F.lit(total))
    )
    return (
        joined.groupBy(group_col, "n_tokens", "n_terms")
        .agg(F.round(F.sum(contrib), round_to).alias("kl_vs_corpus"))
        .select(group_col, "n_tokens", "n_terms", "kl_vs_corpus")
    )


def token_entropy_by_group(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Shannon entropy of each group's unigram distribution plus
    Pielou evenness (H / ln(n_terms)) — how concentrated each mixture
    component's vocabulary usage is (lexical_diversity is per-document
    TTR; this is the distribution-level gauge).

    H = ln(n) - Σ c·ln(c) / n with n = Σ c — the algebraic form whose
    only float sums are Σ c·ln(c), identical in the oracle.  One
    groupBy over the shared checkpointed (group, term) count table.
    """
    st = group_term_counts(df, group_col, text_col)
    n = F.sum("c_st")
    h = F.log(n) - F.sum(F.col("c_st") * F.log("c_st")) / n
    n_terms = F.count(F.lit(1))
    return st.groupBy(group_col).agg(
        n_terms.alias("n_terms"),
        n.alias("n_tokens"),
        F.round(h, round_to).alias("entropy"),
        F.round(
            F.when(n_terms > 1, h / F.log(n_terms.cast("double"))), round_to
        ).alias("evenness"),
    )


def jsd_pairs(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between group unigram
    distributions — the symmetric, bounded ([0, ln 2]) source
    similarity matrix (KL against the corpus is one-vs-all; this is
    all-vs-all).

    Uses the closed form over the INTERSECTION support only:
    JSD(P,Q) = ½·Σ_inter [p·ln(2p/(p+q)) + q·ln(2q/(p+q))]
             + ½·ln2·[(1-Σ_inter p) + (1-Σ_inter q)]
    (a term in only one distribution has m = p/2, contributing
    p·ln 2), so the term self-join never materializes the union
    support.  Returns (group_a, group_b, n_common_terms, jsd) for
    EVERY unordered group pair: the pair skeleton comes from the
    bounded O(groups) totals table, so pairs with disjoint
    vocabularies still appear — with n_common_terms = 0 and the exact
    maximum jsd = ln 2 the same formula yields at zero overlap.

    Scale shape: the self-join shuffles the O(groups × |V|) count
    table on term; each term yields at most groups² pair rows; the
    skeleton's inequality join is a broadcast nested loop over the
    O(groups) table — bounded by construction.  The ln 2 constant is
    injected as the same Python double the oracle SQL embeds.
    """
    st = group_term_counts(df, group_col, text_col)
    tot = st.groupBy(group_col).agg(F.sum("c_st").alias("n"))
    p = st.join(F.broadcast(tot), group_col).select(
        F.col(group_col).alias("g"), "term", (F.col("c_st") / F.col("n")).alias("p")
    )
    a, b = p.alias("a"), p.alias("b")
    pa, pb = F.col("a.p"), F.col("b.p")
    cross = pa * F.log(F.lit(2) * pa / (pa + pb)) + pb * F.log(
        F.lit(2) * pb / (pa + pb)
    )
    inter = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a.g") < F.col("b.g")))
        .groupBy(
            F.col("a.g").alias("_ia"),
            F.col("b.g").alias("_ib"),
        )
        .agg(
            F.count(F.lit(1)).alias("_n_common"),
            F.sum(pa).alias("_sum_pa"),
            F.sum(pb).alias("_sum_pb"),
            F.sum(cross).alias("_cross"),
        )
    )
    ga = tot.select(F.col(group_col).alias(f"{group_col}_a"))
    gb = tot.select(F.col(group_col).alias(f"{group_col}_b"))
    skel = ga.join(
        F.broadcast(gb), F.col(f"{group_col}_a") < F.col(f"{group_col}_b")
    )
    return (
        skel.join(
            inter,
            (F.col(f"{group_col}_a") == F.col("_ia"))
            & (F.col(f"{group_col}_b") == F.col("_ib")),
            "left",
        )
        .select(
            f"{group_col}_a",
            f"{group_col}_b",
            F.coalesce("_n_common", F.lit(0)).alias("n_common_terms"),
            F.round(
                F.lit(0.5) * F.coalesce("_cross", F.lit(0.0))
                + F.lit(0.5)
                * F.lit(LN2)
                * (
                    (F.lit(1) - F.coalesce("_sum_pa", F.lit(0.0)))
                    + (F.lit(1) - F.coalesce("_sum_pb", F.lit(0.0)))
                ),
                round_to,
            ).alias("jsd"),
        )
    )


def zipf_slope(
    df: DataFrame,
    text_col: str = "text",
    top: int = 1000,
) -> DataFrame:
    """OLS fit of ln(frequency) on ln(rank) over the ``top`` most
    frequent corpus tokens (rank = position under count DESC, term ASC
    — a deterministic tie-break).  Natural text slopes near -1.

    Returns one row (n_terms, slope, intercept, r2).  The top-k cut is
    TakeOrderedAndProject on the O(|V|) count table, so the
    single-partition ranking window only ever sees ``top`` rows —
    bounded regardless of corpus size.
    """
    toks = token_stream(df, text_col, keep=())
    cnt = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    top_terms = cnt.orderBy(F.desc("c"), "term").limit(top)
    w = Window.orderBy(F.desc("c"), "term")
    ranked = top_terms.select("term", "c", F.row_number().over(w).alias("rank"))
    ln_c, ln_r = F.log("c"), F.log("rank")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.regr_slope(ln_c, ln_r), 4).alias("slope"),
        F.round(F.regr_intercept(ln_c, ln_r), 4).alias("intercept"),
        F.round(F.regr_r2(ln_c, ln_r), 6).alias("r2"),
    )
