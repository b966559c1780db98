"""Corpus-curation operators: composite quality gating, per-domain
admission caps, lexical-diversity profiling, and dataset-card rollups.

Everything is built-in Column algebra (JVM-side, whole-stage codegen) —
the only shuffles are the per-(doc, token) aggregations that top-term
statistics fundamentally need, and those are hash aggregations keyed by
document id, so a 100 TB corpus fans out across executors with map-side
partial aggregation and no skew (doc ids are unique).

Reference scope: the reference repo (VictorClvtt/nasa-asteroid-data-
lakehouse) curates a single REST-ingested table via flatten/cast/dedup
(src/etl/silver_to_gold.py); these operators extend that curation
surface to the filters a large-scale training-data pipeline needs
(Gopher-style quality rules per Rae et al. 2021, arXiv:2112.11446;
per-domain caps per Common Crawl curation practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark.llm import text as T

# Gopher-style gate thresholds (module constants so the DuckDB oracle
# is generated from the SAME values the engine compares against).
QF_MIN_WORDS = 20
QF_MAX_WORDS = 100_000
QF_MIN_AVG_WORD_LEN = 2.0
QF_MAX_AVG_WORD_LEN = 12.0
QF_MAX_TOP_WORD_FRAC = 0.20
QF_MAX_DUP_BIGRAM_FRAC = 0.30
QF_MIN_STOPWORD_RATIO = 0.01


def _with_gate_stats(
    df: DataFrame, text_col: str, barrier: bool = True
) -> DataFrame:
    """Shared first stage of both quality-gate forms: adds the token
    array ``__w`` plus every per-row statistic except top_word_frac
    (n_words, avg_word_len, stopword_ratio, dup_bigram_frac).
    Preserves all input columns, so gated rows keep their payload.

    The ``__barrier`` column keeps downstream rule predicates from
    being pushed below this projection and re-instantiating the
    tokenizer (Catalyst has no CSE across a pushed predicate +
    project).  ``barrier=False`` for streaming callers:
    monotonically_increasing_id is rejected in streaming plans, and a
    micro-batch's pushed predicate re-tokenizes only that batch."""
    toks = T.tokens(T.normalized_text(F.coalesce(F.col(text_col), F.lit(""))))
    stop = F.array(*[F.lit(w) for w in T.STOPWORDS["en"]])
    # one fold over the materialized token array:
    # [n_tokens, total_token_chars, stopword_hits]
    core = F.aggregate(
        F.col("__w"),
        F.array(F.lit(0), F.lit(0), F.lit(0)),
        lambda acc, tk: F.array(
            acc[0] + 1,
            acc[1] + F.length(tk),
            acc[2] + F.when(F.array_contains(stop, tk), 1).otherwise(0),
        ),
    )
    n = F.col("__core")[0]
    m = n - 1
    grams = F.zip_with(
        F.slice("__w", 1, m), F.slice("__w", 2, m),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    staged = df.withColumn("__w", toks)
    if barrier:
        staged = staged.withColumn("__barrier", F.monotonically_increasing_id())
    return (
        staged
        .withColumn("__core", core)
        .withColumns(
            {
                "n_words": n,
                "avg_word_len": F.when(
                    n > 0, F.round(F.col("__core")[1] / n, 6)
                ).otherwise(F.lit(0.0)),
                "stopword_ratio": F.when(
                    n > 0, F.round(F.col("__core")[2] / n, 6)
                ).otherwise(F.lit(0.0)),
                "dup_bigram_frac": F.when(
                    m > 0, F.round(1 - F.size(F.array_distinct(grams)) / m, 6)
                ).otherwise(F.lit(0.0)),
            }
        )
    )


def _with_gate_rules(out: DataFrame) -> DataFrame:
    """Shared second stage: the five rule booleans + ``keep``, defined
    once so the shuffle and stateless forms can never diverge on
    thresholds or rule composition."""
    rules = {
        "ok_word_count": (F.col("n_words") >= QF_MIN_WORDS)
        & (F.col("n_words") <= QF_MAX_WORDS),
        "ok_avg_word_len": (F.col("avg_word_len") >= QF_MIN_AVG_WORD_LEN)
        & (F.col("avg_word_len") <= QF_MAX_AVG_WORD_LEN),
        "ok_top_word": F.col("top_word_frac") <= QF_MAX_TOP_WORD_FRAC,
        "ok_dup_bigram": F.col("dup_bigram_frac") <= QF_MAX_DUP_BIGRAM_FRAC,
        "ok_stopwords": F.col("stopword_ratio") >= QF_MIN_STOPWORD_RATIO,
    }
    out = out.withColumns(rules)
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("keep", keep)


def quality_filter(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style composite quality gate: one boolean per rule plus
    the final ``keep`` decision, so downstream consumers can both
    filter and audit *why* a document was dropped.  Input columns are
    preserved.

    Rules (over whitespace tokens of the normalized text):

    * word count in [QF_MIN_WORDS, QF_MAX_WORDS]
    * mean word length in [QF_MIN_AVG_WORD_LEN, QF_MAX_AVG_WORD_LEN]
    * most-frequent-word fraction <= QF_MAX_TOP_WORD_FRAC
    * duplicate-bigram fraction <= QF_MAX_DUP_BIGRAM_FRAC
    * stopword ratio >= QF_MIN_STOPWORD_RATIO (gibberish screen)

    Blank/empty/NULL documents fail the word-count rule (n_words = 0;
    NULL text is pinned to '' so the rule booleans are never NULL).
    All ratios are single IEEE divisions of exact integers rounded to
    the same 6-decimal lattice the oracle uses, so the rule booleans
    are engine-portable.  One narrow projection + one per-(doc, word)
    hash aggregation — the same plan shape as
    :func:`~nasa_asteroid_data_lakehouse_spark.llm.text.with_repetition_stats`.
    """
    base = _with_gate_stats(df, text_col)
    top = (
        base.select(id_col, F.explode("__w").alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.round(F.max("c") / F.sum("c"), 6).alias("top_word_frac"))
    )
    out = (
        base.drop("__w", "__core", "__barrier")
        .join(top, id_col, "left")
        .withColumn("top_word_frac", F.coalesce("top_word_frac", F.lit(0.0)))
    )
    return _with_gate_rules(out)


def quality_filter_stateless(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """:func:`quality_filter` as a pure per-row projection — no shuffle,
    no join, therefore directly usable inside a Structured Streaming
    query (stateless operators need no watermark or output-mode
    restrictions).

    The only rule that needed aggregation, the most-frequent-word
    fraction, is computed in array algebra instead:
    ``array_max(transform(array_distinct(w), t -> size(filter(w, x ->
    x = t))))`` — O(n_tokens x n_distinct) per document.  Use this
    form for streams and short/medium documents; the shuffle form for
    batch corpora with pathologically long documents (the quadratic
    per-row scan crosses the two-hash-agg cost around 10^4 tokens per
    doc).  Input columns are preserved (that is what lets the
    streaming path carry payloads through the gate without a join).
    Equivalence of the two forms is pinned in tests/test_curation.py.
    """
    n = F.col("n_words")
    max_tf = F.array_max(
        F.transform(
            F.array_distinct("__w"),
            lambda t: F.size(F.filter("__w", lambda x: x == t)),
        )
    )
    out = (
        _with_gate_stats(df, text_col, barrier=False)
        .withColumn(
            "top_word_frac",
            F.when(n > 0, F.round(max_tf / n, 6)).otherwise(F.lit(0.0)),
        )
        .drop("__w", "__core")
    )
    return _with_gate_rules(out)


def lexical_diversity(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document lexical-diversity profile over normalized tokens:
    token count, distinct types, max term frequency, the most frequent
    term (ties -> lexicographically smallest), and the type-token
    ratio.  Every output is exact integers or a single IEEE division,
    so the profile hashes identically across engines.

    Plan: explode -> hash-agg (doc, term) -> hash-agg (doc).  The
    argmax-with-tiebreak is one ``min(struct(-count, term))`` — no
    window, no second shuffle.  Blank/NULL documents are excluded (no
    tokens, profile undefined), as are NULL-id rows (a profile keyed
    on identity is undefined without one — and an oracle CTE join on
    the id would silently drop a NULL-id group; pin the semantics).
    """
    toks = T.tokens(T.normalized_text(F.coalesce(F.col(text_col), F.lit(""))))
    base = (
        df.where(F.col(id_col).isNotNull())
        .select(
            F.col(id_col),
            toks.alias("__w"),
            F.monotonically_increasing_id().alias("__barrier"),
        )
        .where(F.size("__w") > 0)
        .drop("__barrier")
    )
    per_term = (
        base.select(id_col, F.explode("__w").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        per_term.groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.max("c").alias("max_tf"),
            F.min(F.struct((-F.col("c")).alias("nc"), F.col("term"))).alias("__top"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_types",
            "max_tf",
            F.col("__top.term").alias("top_term"),
            F.round(F.col("n_types") / F.col("n_tokens"), 6).alias("type_token_ratio"),
        )
    )


def _md5_rank(domain_col: str, id_col: str, seed: str):
    """Deterministic per-domain rank: row_number over md5(seed|id)
    with the id as tiebreak — a pure function of (seed, id), so
    re-runs, repartitionings, and engines all agree.  The single
    definition behind domain_cap and temperature_mixture selection."""
    return F.row_number().over(
        Window.partitionBy(domain_col).orderBy(
            F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))),
            F.col(id_col),
        )
    )


def domain_cap(
    df: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    cap: int = 100,
    seed: str = "domain-cap-v1",
) -> DataFrame:
    """Per-domain admission cap: keep at most ``cap`` documents per
    domain, chosen by deterministic md5 rank (seeded, so re-runs and
    engines agree) — the Common Crawl-style guard against any single
    domain dominating the training mix.

    One shuffle on the domain key.  Domain cardinality is low relative
    to rows (that is the premise of capping), so at 100 TB the rank
    runs as a window per domain; a pathologically hot domain is
    bounded by the cap itself on output, and the rank's sort is a
    per-partition external sort, not a global one.  Returns the kept
    rows with their admission rank.
    """
    return (
        df.select(F.col(id_col), F.col(domain_col))
        .where(F.col(id_col).isNotNull())
        .withColumn("admission_rank", _md5_rank(domain_col, id_col, seed))
        .where(F.col("admission_rank") <= cap)
    )


def temperature_mixture(
    df: DataFrame,
    n_target: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "temp-mix-v1",
) -> DataFrame:
    """Temperature-based source rebalancing at alpha = 0.5: sample
    ``n_target`` documents with per-source quotas proportional to
    sqrt(source size) — the standard flattening between proportional
    (alpha=1) and uniform (alpha=0) mixing used for multi-source
    training corpora (e.g. multilingual sampling in XLM-R, Conneau et
    al. 2020, arXiv:1911.02116).

    alpha is FIXED at 0.5 because sqrt is IEEE-correctly-rounded and
    therefore bit-identical across engines; an arbitrary ``pow(n,
    alpha)`` is not.  Weights live on an integer lattice
    (``floor(sqrt(n) * 1000)``) and quotas use integer division, so
    the quota arithmetic has no float path at all.  Selection within a
    source is the deterministic md5 rank.  Two shuffles: the source
    count and the per-source rank window; the quota table is a handful
    of rows, broadcast back.
    """
    counts = (
        df.where(F.col(id_col).isNotNull())
        .groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            "weight",
            F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1000).cast("long"),
        )
    )
    total = counts.agg(F.sum("weight").alias("total_w"))
    quotas = (
        counts.crossJoin(F.broadcast(total))
        .withColumn(
            "n_keep",
            F.least(
                F.col("n_docs"),
                F.expr(f"({n_target} * weight) div total_w"),
            ),
        )
        .select(domain_col, "n_keep")
    )
    ranked = (
        df.where(F.col(id_col).isNotNull())
        .select(F.col(id_col), F.col(domain_col))
        .withColumn("mix_rank", _md5_rank(domain_col, id_col, seed))
    )
    return ranked.join(F.broadcast(quotas), domain_col).where(
        F.col("mix_rank") <= F.col("n_keep")
    ).select(id_col, domain_col, "mix_rank")


def dataset_card(
    df: DataFrame,
    source_col: str = "source",
    lang_col: str = "lang",
    chars_col: str = "n_chars",
    text_col: str = "text",
) -> DataFrame:
    """Per-source dataset-card rollup (the datasheet table a corpus
    release ships): document count, language count, total characters,
    total whitespace tokens, mean characters per document, and the
    source's share of the corpus.

    One hash aggregation over the source key + one single-row corpus
    total broadcast back — no window, no global sort.  ``pct_docs``
    and ``mean_chars`` are single divisions of exact BIGINT counts.
    """
    ntok = F.size(T.tokens(T.normalized_text(F.coalesce(F.col(text_col), F.lit("")))))
    per_source = (
        df.select(
            F.col(source_col).alias("source"),
            F.col(lang_col).alias("lang"),
            F.col(chars_col).alias("nc"),
            ntok.alias("ntok"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("nc").alias("total_chars"),
            F.sum("ntok").alias("total_tokens"),
        )
    )
    total = per_source.agg(F.sum("n_docs").alias("__corpus_docs"))
    return per_source.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "n_langs",
        "total_chars",
        "total_tokens",
        F.round(F.col("total_chars") / F.col("n_docs"), 6).alias("mean_chars"),
        F.round(F.col("n_docs") / F.col("__corpus_docs"), 6).alias("pct_docs"),
    )


def strip_ubiquitous_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float = 0.5,
) -> DataFrame:
    """Corpus-adaptive boilerplate removal: tokens whose DOCUMENT
    frequency exceeds ``max_df_frac`` of the corpus are stripped from
    every document, preserving the original order of what remains —
    the token-level analog of the line-level boilerplate filters
    (CCNet / RefinedWeb strip lines repeated across many pages; this
    corpus has no line structure, so the unit is the token).

    Returns (id_col, n_before, n_after, stripped_text); a document
    whose every token is boilerplate survives with ``n_after = 0`` and
    an empty string (dropping it is the CALLER's policy decision).

    Scale shape: the posexplode runs twice (exact countDistinct
    doc-frequency build, then the rebuild join) — deliberately NOT
    localCheckpoint-ed: materializing the O(total tokens) stream costs
    more memory than recomputing a narrow projection+explode from the
    column-pruned scan (measured: the checkpointed form OOMs local[32]
    at 1M×60-token docs where the recompute form runs in ~16 s).  The
    document count is a pruned base scan (no explode — Catalyst drops
    the generator under count).  The O(|V|) doc-frequency broadcast
    keeps the keep/strip decision map-side, and the rebuild is one
    hash agg on the doc id (collect_list of (pos, term) structs,
    sorted in-row — bounded by document length, never by corpus size).
    """
    base = df.where(F.trim(text_col) != "")
    toks = base.select(
        id_col,
        F.posexplode(
            T.tokens(T.normalized_text(text_col))
        ).alias("pos", "term"),
    )
    n_docs = base.count()
    cut = max_df_frac * n_docs
    dfc = toks.groupBy("term").agg(
        F.countDistinct(id_col).alias("doc_freq")
    )
    kept_struct = F.when(
        F.col("doc_freq") <= cut, F.struct("pos", "term")
    )
    return (
        toks.join(F.broadcast(dfc), "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_before"),
            F.count(F.when(F.col("doc_freq") <= cut, 1)).alias("n_after"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s.term,
                ),
                " ",
            ).alias("stripped_text"),
        )
    )
