"""LLM-pipeline queries for the driver's correctness gate.

Wraps the ``llm/`` operators over the documents/embeddings fixtures;
oracle SQL mirrors the exact arithmetic (md5-based hashing, double
precision sequential dot products, identical rounding) so DuckDB
reproduces the results bit-for-bit.  Some oracle strings are generated
programmatically (simhash bit votes, LSH hyperplane literals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark.catalog import read_table
from nasa_asteroid_data_lakehouse_spark.llm import dedup, multimodal, similarity, text

# --- text statistics ---------------------------------------------------------


def text_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return text.with_text_stats(docs).drop("text")


_EN = ", ".join(f"'{w}'" for w in text.STOPWORDS["en"])

TEXT_STATS_SQL = rf"""
WITH base AS (
  SELECT doc_id, text,
    length(text) AS n_chars,
    CASE WHEN trim(text) = '' THEN 0
         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
    len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpe_tokens,
    length(regexp_replace(text, '\s+', '', 'g')) AS non_space,
    length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{{}}-]', '', 'g')) AS punct,
    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digits,
    CASE WHEN trim(lower(text)) = '' THEN 0
         ELSE len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                              t -> t IN ({_EN}))) END AS stop_hits
  FROM documents
)
SELECT doc_id,
  n_chars AS n_chars_measured,
  n_tokens,
  n_bpe_tokens,
  ROUND(non_space / greatest(n_tokens, 1), 6) AS avg_token_len,
  ROUND(punct / greatest(n_chars, 1), 6) AS punct_ratio,
  ROUND(digits / greatest(n_chars, 1), 6) AS digit_ratio,
  ROUND(stop_hits / greatest(n_tokens, 1), 6) AS stopword_ratio,
  ROUND(least(n_tokens / 100.0, 1.0) * 0.4
        + (1 - least(punct / greatest(n_chars, 1) * 5, 1.0)) * 0.3
        + least(stop_hits / greatest(n_tokens, 1) * 5, 1.0) * 0.3, 6) AS quality_score
FROM base
"""


def lang_id_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return text.with_lang_id(docs).drop("text")


def _hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in text.STOPWORDS[lang])
    return (
        "CASE WHEN trim(lower(text)) = '' THEN 0 "
        f"ELSE len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        f"t -> t IN ({words}))) END"
    )


LANG_ID_SQL = rf"""
WITH scored AS (
  SELECT doc_id, lang,
    length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g')) AS han,
    length(text) AS n_chars,
    {_hits_sql("en")} AS h_en,
    {_hits_sql("fr")} AS h_fr,
    {_hits_sql("es")} AS h_es,
    {_hits_sql("de")} AS h_de
  FROM documents
)
SELECT doc_id, lang,
  CASE WHEN han / greatest(n_chars, 1) > 0.3 THEN 'zh'
       WHEN greatest(h_en, h_fr, h_es, h_de) = 0 THEN 'und'
       WHEN h_en = greatest(h_en, h_fr, h_es, h_de) THEN 'en'
       WHEN h_fr = greatest(h_en, h_fr, h_es, h_de) THEN 'fr'
       WHEN h_es = greatest(h_en, h_fr, h_es, h_de) THEN 'es'
       ELSE 'de' END AS lang_pred
FROM scored
"""


def fingerprint_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return text.with_fingerprints(docs).drop("text")


_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"

FINGERPRINT_SQL = rf"""
SELECT doc_id,
  md5({_NORM}) AS fingerprint,
  ('0x' || substr(md5({_NORM}), 1, 15))::BIGINT AS fingerprint64
FROM documents
"""


def exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    return dedup.exact_dedup(docs, "doc_id")


EXACT_DEDUP_SQL = rf"""
SELECT doc_id, text, lang, source
FROM documents
QUALIFY row_number() OVER (PARTITION BY md5({_NORM}) ORDER BY doc_id) = 1
"""


# --- MinHash signatures -------------------------------------------------------

_MINHASH_K = 3
_MINHASH_N = 4


def minhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    sig = dedup.with_minhash_signature(
        docs, num_hashes=_MINHASH_N, shingle_k=_MINHASH_K
    )
    return sig.select(
        "doc_id",
        *[F.col("minhash")[i].alias(f"sig_{i}") for i in range(_MINHASH_N)],
    )


_SHINGLES_SQL = rf"""
  SELECT doc_id,
    CASE WHEN len(words) >= {_MINHASH_K}
         THEN list_distinct(list_transform(range(1, len(words) - {_MINHASH_K - 2}),
                            j -> array_to_string(words[j:j+{_MINHASH_K - 1}], ' ')))
         ELSE [array_to_string(words, ' ')] END AS shingles
  FROM (SELECT doc_id, string_split({_NORM}, ' ') AS words FROM documents)
"""

_MINHASH_COEFFS = dedup._minhash_coeffs(_MINHASH_N)

MINHASH_SQL = rf"""
WITH sh AS ({_SHINGLES_SQL}),
bases AS (
  SELECT doc_id,
    list_transform(shingles, s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS bh
  FROM sh
)
SELECT doc_id,
  {", ".join(
      f"list_min(list_transform(bh, h -> ({a} * h + {b}) % {dedup.MINHASH_PRIME})) AS sig_{i}"
      for i, (a, b) in enumerate(_MINHASH_COEFFS)
  )}
FROM bases
"""


# --- n-gram Jaccard (blocked pairs) ------------------------------------------


def ngram_jaccard_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise word-bigram Jaccard within each source block, similarity
    floor 0.05 (word-salad fixtures share vocabulary, not phrasing)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    return dedup.ngram_jaccard_pairs(
        docs, "doc_id", shingle_k=2, group_cols=["source"], threshold=0.05
    )


NGRAM_JACCARD_SQL = rf"""
WITH sh AS (
  SELECT doc_id, source,
    CASE WHEN len(words) >= 2
         THEN list_distinct(list_transform(range(1, len(words)),
                            j -> array_to_string(words[j:j+1], ' ')))
         ELSE [array_to_string(words, ' ')] END AS shingles
  FROM (SELECT doc_id, source, string_split({_NORM}, ' ') AS words FROM documents)
),
sz AS (SELECT doc_id, len(shingles) AS sz FROM sh),
ex AS (SELECT doc_id, source, unnest(shingles) AS shingle FROM sh),
common AS (
  SELECT a.source AS source, a.doc_id AS id_a, b.doc_id AS id_b,
         COUNT(*) AS common
  FROM ex a JOIN ex b
    ON a.source = b.source AND a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3
)
SELECT source, id_a, id_b,
  ROUND(common / (sa.sz + sb.sz - common), 6) AS jaccard
FROM common
JOIN sz sa ON sa.doc_id = id_a
JOIN sz sb ON sb.doc_id = id_b
WHERE ROUND(common / (sa.sz + sb.sz - common), 6) >= 0.05
"""


# --- cosine similarity --------------------------------------------------------


def cosine_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-20 most similar vectors to vec_id=0 (self included)."""
    emb = read_table(spark, sf_dir, "embeddings")
    query = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("query_vec")
    )
    scored = emb.crossJoin(F.broadcast(query)).select(
        "vec_id",
        F.round(
            similarity.cosine(F.col("embedding"), F.col("query_vec")), 6
        ).alias("cosine_sim"),
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc("vec_id")).limit(20)


COSINE_TOPK_SQL = """
WITH q AS (SELECT embedding AS query_vec FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
  ROUND(list_dot_product(embedding::DOUBLE[], query_vec::DOUBLE[])
        / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
           * sqrt(list_dot_product(query_vec::DOUBLE[], query_vec::DOUBLE[]))),
        6) AS cosine_sim
FROM embeddings, q
ORDER BY cosine_sim DESC, vec_id
LIMIT 20
"""


# --- LSH bucketing ------------------------------------------------------------

_LSH_PLANES = 6
_LSH_DIM = 64


def lsh_buckets_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucket assignment + per-bucket population."""
    emb = read_table(spark, sf_dir, "embeddings")
    bucketed = similarity.with_lsh_bucket(
        emb, num_planes=_LSH_PLANES, dim=_LSH_DIM
    )
    return bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vectors"))


def _lsh_sql() -> str:
    planes = similarity.hyperplane_coefficients(_LSH_PLANES, _LSH_DIM)
    terms = []
    for p, coefs in enumerate(planes):
        lits = ", ".join(repr(c) for c in coefs)
        terms.append(
            f"(CASE WHEN list_dot_product(embedding::DOUBLE[], [{lits}]::DOUBLE[]) >= 0"
            f" THEN {1 << p} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    return f"""
SELECT ({bucket})::BIGINT AS bucket, COUNT(*) AS n_vectors
FROM embeddings GROUP BY 1
"""


LSH_BUCKETS_SQL = _lsh_sql()


# --- multimodal ---------------------------------------------------------------


def media_metadata_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + JVM-side typed metadata (decode-free path)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    with_payload = multimodal.with_binary_payload(docs, "text")
    meta = multimodal.with_media_metadata(with_payload)
    return meta.select("doc_id", "media_meta.n_bytes", "media_meta.checksum")


MEDIA_METADATA_SQL = """
SELECT doc_id,
  octet_length(encode(text)) AS n_bytes,
  md5(text) AS checksum
FROM documents
"""


def byte_features_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched binary feature extraction (mapInPandas path).

    No SQL oracle: entropy/histogram aren't reasonably expressible in
    portable SQL — driver records the rows-only check.
    """
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = multimodal.with_binary_payload(docs, "text")
    feats = multimodal.extract_byte_features(payloads)
    return feats.select("doc_id", "n_bytes", "entropy", "mean_byte")


QUERIES = {
    "text_stats_documents": text_stats_documents,
    "lang_id_documents": lang_id_documents,
    "fingerprint_documents": fingerprint_documents,
    "exact_dedup_documents": exact_dedup_documents,
    "minhash_documents": minhash_documents,
    "ngram_jaccard_documents": ngram_jaccard_documents,
    "cosine_topk_embeddings": cosine_topk_embeddings,
    "lsh_buckets_embeddings": lsh_buckets_embeddings,
    "media_metadata_documents": media_metadata_documents,
    "byte_features_documents": byte_features_documents,
}

ORACLES = {
    "text_stats_documents": TEXT_STATS_SQL,
    "lang_id_documents": LANG_ID_SQL,
    "fingerprint_documents": FINGERPRINT_SQL,
    "exact_dedup_documents": EXACT_DEDUP_SQL,
    "minhash_documents": MINHASH_SQL,
    "ngram_jaccard_documents": NGRAM_JACCARD_SQL,
    "cosine_topk_embeddings": COSINE_TOPK_SQL,
    "lsh_buckets_embeddings": LSH_BUCKETS_SQL,
    "media_metadata_documents": MEDIA_METADATA_SQL,
    # byte_features_documents: intentionally no oracle (mapInPandas op)
}


def curation_pipeline_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation: stats -> quality floor ->
    exact dedup -> per-(lang, source) yield report.

    Composes with_text_stats + exact_dedup + aggregation in one plan —
    Catalyst fuses the stats projection into the dedup shuffle's map
    side; the report is the only other shuffle.
    """
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    scored = text.with_text_stats(docs)
    kept = scored.where(
        (F.col("quality_score") >= 0.5) & (F.col("n_tokens") >= 10)
    )
    deduped = dedup.exact_dedup(kept, "doc_id")
    return (
        deduped.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("docs_kept"),
            # SUM not AVG: quality scores sit on a 1e-6 decimal lattice,
            # so their sum stays 5e-7 from any 6dp rounding boundary —
            # an average lands exactly on boundaries and flips between
            # engines' accumulation orders.
            F.round(F.sum("quality_score"), 6).alias("sum_quality"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("lang", "source")
    )


_STATS_FRAGMENT = rf"""
  SELECT doc_id, text, lang, source,
    CASE WHEN trim(text) = '' THEN 0
         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
    length(text) AS n_chars,
    length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{{}}-]', '', 'g')) AS punct,
    CASE WHEN trim(lower(text)) = '' THEN 0
         ELSE len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                              t -> t IN ({_EN}))) END AS stop_hits
  FROM documents
"""

CURATION_SQL = rf"""
WITH stats AS ({_STATS_FRAGMENT}),
scored AS (
  SELECT *,
    ROUND(least(n_tokens / 100.0, 1.0) * 0.4
          + (1 - least(punct / greatest(n_chars, 1) * 5, 1.0)) * 0.3
          + least(stop_hits / greatest(n_tokens, 1) * 5, 1.0) * 0.3, 6) AS quality_score
  FROM stats
),
kept AS (SELECT * FROM scored WHERE quality_score >= 0.5 AND n_tokens >= 10),
deduped AS (
  SELECT * FROM kept
  QUALIFY row_number() OVER (
    PARTITION BY md5({_NORM}) ORDER BY doc_id) = 1
)
SELECT lang, source,
       COUNT(*) AS docs_kept,
       ROUND(SUM(quality_score), 6) AS sum_quality,
       SUM(n_tokens) AS total_tokens
FROM deduped
GROUP BY lang, source
ORDER BY lang, source
"""

QUERIES["curation_pipeline_documents"] = curation_pipeline_documents
ORACLES["curation_pipeline_documents"] = CURATION_SQL
