"""Round-5 surface growth: text profiling, classical two-sample
statistics, robust estimators, event funnels/as-of joins, embedding
diagnostics (per-dimension stats, product quantization), and the
lakehouse schema-evolution / key-pruned-delete / compaction paths.

Every query follows the repo's portability contract (docs/ROUND_NOTES):
integer SUMs cast to BIGINT, data-derived denominators try_divide'd on
the engine side and NULL-on-zero in DuckDB, float constants via repr()
of the engine's own Python float, NULL text/lang/source/user treated as
real groups or excluded identically on both sides, NaN filtered via
operators/stats.finite where a metric feeds quantiles/stddev.

No reference analog for any of these: the reference
(``src/etl/silver_to_gold.py``) stops at null-count profiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark.catalog import read_table
from nasa_asteroid_data_lakehouse_spark.llm import dedup, text
from nasa_asteroid_data_lakehouse_spark.operators.stats import finite

QUERIES: dict = {}
ORACLES: dict = {}

# DuckDB twin of llm/text.normalized_text (NULL propagates)
_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
# DuckDB twin of llm/text.tokens(normalized_text): blank -> [], NULL -> NULL
_TOKS = (
    f"CASE WHEN {_NORM} = '' THEN []::VARCHAR[] "
    f"ELSE string_split({_NORM}, ' ') END"
)


# --- character-class profile per source --------------------------------------


def char_class_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source character-class census over RAW text (letters /
    digits / whitespace / other) — the encoding-health screen a crawl
    pipeline runs before tokenizer decisions.

    One narrow projection (four subtraction-counted regexp_replace
    lengths, whole-stage codegen), one hash aggregate keyed on the
    bounded source domain.  NULL text rows stay visible (counted in
    ``n_null_text``, contributing no characters — the byte-profiler
    convention from round 4b); NULL source is a real group."""
    docs = read_table(spark, sf_dir, "documents").select("source", "text")
    ln = F.length("text")
    letters = ln - F.length(F.regexp_replace("text", "[A-Za-z]", ""))
    digits = ln - F.length(F.regexp_replace("text", "[0-9]", ""))
    spaces = ln - F.length(F.regexp_replace("text", r"\s", ""))
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("text").isNull(), 1)).alias("n_null_text"),
            F.coalesce(F.sum(ln), F.lit(0)).alias("n_chars"),
            F.coalesce(F.sum(letters), F.lit(0)).alias("n_letters"),
            F.coalesce(F.sum(digits), F.lit(0)).alias("n_digits"),
            F.coalesce(F.sum(spaces), F.lit(0)).alias("n_spaces"),
        )
        .select(
            "source",
            "n_docs",
            "n_null_text",
            "n_chars",
            "n_letters",
            "n_digits",
            "n_spaces",
            (
                F.col("n_chars")
                - F.col("n_letters")
                - F.col("n_digits")
                - F.col("n_spaces")
            ).alias("n_other"),
            F.round(F.try_divide("n_letters", "n_chars"), 6).alias(
                "letter_ratio"
            ),
        )
    )


CHAR_CLASS_PROFILE_SQL = r"""
WITH per_doc AS (
  SELECT source,
         text IS NULL AS is_null,
         length(text) AS n,
         length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS l,
         length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS d,
         length(text) - length(regexp_replace(text, '\s', '', 'g')) AS s
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (is_null) AS BIGINT) AS n_null_text,
       CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_chars,
       CAST(COALESCE(SUM(l), 0) AS BIGINT) AS n_letters,
       CAST(COALESCE(SUM(d), 0) AS BIGINT) AS n_digits,
       CAST(COALESCE(SUM(s), 0) AS BIGINT) AS n_spaces,
       CAST(COALESCE(SUM(n), 0) - COALESCE(SUM(l), 0)
            - COALESCE(SUM(d), 0) - COALESCE(SUM(s), 0) AS BIGINT) AS n_other,
       ROUND(COALESCE(SUM(l), 0) / NULLIF(COALESCE(SUM(n), 0), 0), 6)
         AS letter_ratio
FROM per_doc
GROUP BY source
"""

QUERIES["char_class_profile_documents"] = char_class_profile_documents
ORACLES["char_class_profile_documents"] = CHAR_CLASS_PROFILE_SQL


# --- hapax legomena ratio ----------------------------------------------------


def hapax_ratio_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary size and hapax-legomena share (tokens seen
    exactly once) — the classic heap-of-the-Zipf-tail health check for
    tokenizer training.  Token explode -> hash aggregate on the token
    (map-side partials shrink the shuffle to |vocab|), then one bounded
    reduction.  NULL text tokenizes to NULL and explodes to nothing."""
    docs = read_table(spark, sf_dir, "documents").select("text")
    toks = docs.select(
        F.explode(text.tokens(text.normalized_text("text"))).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    return freq.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.count(F.when(F.col("c") == 1, 1)).alias("hapax_count"),
        F.round(
            F.try_divide(
                F.count(F.when(F.col("c") == 1, 1)), F.count(F.lit(1))
            ),
            6,
        ).alias("hapax_ratio"),
    )


HAPAX_RATIO_SQL = f"""
WITH toks AS (
  SELECT unnest({_TOKS}) AS tok FROM documents WHERE text IS NOT NULL
),
freq AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok)
SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(COUNT(*) FILTER (c = 1) AS BIGINT) AS hapax_count,
       ROUND(COUNT(*) FILTER (c = 1) / NULLIF(COUNT(*), 0), 6) AS hapax_ratio
FROM freq
"""

QUERIES["hapax_ratio_documents"] = hapax_ratio_documents
ORACLES["hapax_ratio_documents"] = HAPAX_RATIO_SQL


# --- readability profile -----------------------------------------------------


def readability_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document readability proxies: word count, mean word length,
    vowel-cluster syllable estimate per word, long-word share — the
    cheap complexity screen (a Flesch-style score needs sentence
    boundaries the corpus does not have; these are its deterministic
    ingredients).  One narrow projection, no shuffle, no UDFs.

    NULL text -> NULL metrics (hygiene convention: failed fetches stay
    visible, never fold into the empty-document bucket)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    norm = text.normalized_text("text")
    toks = text.tokens(norm)
    n_words = F.size(toks)
    n_letters = F.length(F.regexp_replace(norm, " ", ""))
    n_syll = F.size(F.regexp_extract_all(norm, F.lit("[aeiouy]+"), 0))
    n_long = F.size(F.filter(toks, lambda t: F.length(t) >= 7))
    return docs.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        F.round(F.try_divide(n_letters, n_words), 4).alias("avg_word_len"),
        F.round(F.try_divide(n_syll, n_words), 4).alias("syll_per_word"),
        F.round(F.try_divide(n_long, n_words), 4).alias("long_word_ratio"),
    )


READABILITY_SQL = f"""
SELECT doc_id,
  CAST(len({_TOKS}) AS BIGINT) AS n_words,
  ROUND(length(replace({_NORM}, ' ', ''))
        / NULLIF(len({_TOKS}), 0), 4) AS avg_word_len,
  ROUND(len(regexp_extract_all({_NORM}, '[aeiouy]+'))
        / NULLIF(len({_TOKS}), 0), 4) AS syll_per_word,
  ROUND(len(list_filter({_TOKS}, t -> length(t) >= 7))
        / NULLIF(len({_TOKS}), 0), 4) AS long_word_ratio
FROM documents
"""

QUERIES["readability_documents"] = readability_documents
ORACLES["readability_documents"] = READABILITY_SQL


# --- TF-IDF keyword extraction ----------------------------------------------


_KW_MAX_DOC = 100
_KW_TOP = 3


def keyword_extract_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document (first 100 doc_ids) — the
    per-document topical fingerprint.  Document frequency is computed
    over the WHOLE corpus (two hash aggregates keyed on token), the
    per-document ranking is a window partitioned by doc_id — the
    distributed-safe window shape (InferWindowGroupLimit turns the
    rank filter into a per-partition top-k).  The anchor-doc filter is
    applied to the tf side only, so at scale the expensive df table is
    shared while the ranked side stays small."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()  # bounded scalar (driver-side literal)
    toks = docs.select(
        "doc_id", F.explode(text.tokens(text.normalized_text("text"))).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        toks.select("doc_id", "tok")
        .distinct()
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    scored = (
        tf.where(F.col("doc_id") < _KW_MAX_DOC)
        .join(dfreq, "tok")
        .select(
            "doc_id",
            F.col("tok").alias("keyword"),
            "tf",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("keyword")
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= _KW_TOP)
        .select("doc_id", "keyword", "tf", "tfidf")
    )


KEYWORD_EXTRACT_SQL = f"""
WITH n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents WHERE text IS NOT NULL
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
dfreq AS (
  SELECT tok, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM toks)
  GROUP BY tok
),
scored AS (
  SELECT tf.doc_id, tf.tok AS keyword, tf.tf,
         ROUND(tf.tf * ln(n.n_docs / dfreq.df), 6) AS tfidf
  FROM tf JOIN dfreq USING (tok), n
  WHERE tf.doc_id < {_KW_MAX_DOC}
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, keyword ASC
  ) AS rk FROM scored
)
SELECT doc_id, keyword, CAST(tf AS BIGINT) AS tf, tfidf
FROM ranked WHERE rk <= {_KW_TOP}
"""

QUERIES["keyword_extract_documents"] = keyword_extract_documents
ORACLES["keyword_extract_documents"] = KEYWORD_EXTRACT_SQL


# --- shingle novelty (who introduces n-grams) --------------------------------


def ngram_novelty_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the share of a document's distinct 3-gram
    shingles that it INTRODUCES to the corpus (no lower-id document
    contains them) — the incremental-information complement of
    containment dedup.

    Shuffle is keyed on the shingle (the LSH family's partitioning);
    the min-id reduction and the join-back are both shingle-local, so
    the plan scales as two hash aggregates + one equi-join.  NULL text
    has NULL shingles and joins nothing (round-4b contract); empty
    docs carry the canonical ``''`` shingle and pool together, exactly
    like the MinHash oracle."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    ex = docs.select(
        "doc_id", F.explode(dedup.word_shingles("text", 3)).alias("sh")
    )
    first = ex.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    return (
        ex.join(first, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1)).alias(
                "n_novel"
            ),
            F.round(
                F.try_divide(
                    F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1)),
                    F.count(F.lit(1)),
                ),
                6,
            ).alias("novel_ratio"),
        )
    )


NGRAM_NOVELTY_SQL = f"""
WITH sh AS (
  SELECT doc_id,
    CASE WHEN len({_TOKS}) >= 3
         THEN list_distinct(list_transform(range(1, len({_TOKS}) - 1),
                            j -> array_to_string({_TOKS}[j:j+2], ' ')))
         -- COALESCE: DuckDB array_to_string([], ' ') is NULL, Spark
         -- concat_ws over [] is '' — pin the engine's '' shingle
         ELSE [COALESCE(array_to_string({_TOKS}, ' '), '')] END AS shingles
  FROM documents WHERE text IS NOT NULL
),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
first AS (SELECT s, MIN(doc_id) AS first_doc FROM ex GROUP BY s)
SELECT ex.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(COUNT(*) FILTER (first.first_doc = ex.doc_id) AS BIGINT)
         AS n_novel,
       ROUND(COUNT(*) FILTER (first.first_doc = ex.doc_id)
             / NULLIF(COUNT(*), 0), 6) AS novel_ratio
FROM ex JOIN first USING (s)
GROUP BY ex.doc_id
"""

QUERIES["ngram_novelty_documents"] = ngram_novelty_documents
ORACLES["ngram_novelty_documents"] = NGRAM_NOVELTY_SQL
