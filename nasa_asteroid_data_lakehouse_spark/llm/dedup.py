"""Document deduplication for training-data pipelines.

Exact and fuzzy families, all as DataFrame column algebra (no Python
UDFs — md5/conv/array lambdas are JVM built-ins):

* exact: normalized-content hash -> keyed dedup (one shuffle).
* MinHash + LSH: word-shingles -> per-seed min content hash ->
  banded bucket join -> candidate pairs -> exact Jaccard verify.
  This is the scalable near-dup path: candidates come from equi-joins
  on band hashes (shuffle on band key), never an O(n²) cross join.
* SimHash: 60-bit weighted bit-vote fingerprint; near-dups = small
  Hamming distance within LSH-style prefix buckets.
* n-gram Jaccard: exact similarity on shingle sets for candidate pairs.

Skew note (100 TB): boilerplate documents create hot LSH buckets; cap
bucket size (``max_bucket``) so a degenerate bucket can't produce a
quadratic pair explosion — the cap drops only pathological buckets
(near-identical boilerplate), which callers usually want to drop anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark.llm.text import normalized_text, tokens


# --- exact ------------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Keep one row per normalized content hash (lowest id wins).

    Hash-groupBy dedup: one shuffle on the 128-bit content key, no
    text comparison — at 100 TB the shuffle carries 16-byte keys, not
    documents.
    """
    from pyspark.sql import Window

    keyed = df.withColumn("__content_key", F.md5(normalized_text(text_col)))
    w = Window.partitionBy("__content_key").orderBy(id_col)
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__content_key")
    )


# --- shingles + MinHash -------------------------------------------------------

def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct word k-grams of the normalized text (array<string>).

    Documents shorter than k words contribute their full token string
    as a single shingle so they still participate in hashing.
    """
    toks = tokens(normalized_text(col))
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.array_distinct(
        F.when(n >= k, grams).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def minhash_value(shingles: Column, seed: int) -> Column:
    """One MinHash coordinate: the minimum md5 digest (hex string) of
    the salted shingles.  Lexicographic order on hex strings is a total
    order on the 128-bit hash values, which is all MinHash needs — and
    it is identical in every engine, making results portable."""
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat_ws("|", F.lit(str(seed)), s)))
    )


def with_minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_k: int = 3,
    out: str = "minhash",
) -> DataFrame:
    """Add an array<string> MinHash signature column."""
    sh = word_shingles(text_col, shingle_k)
    sig = F.array(*[minhash_value(sh, seed) for seed in range(num_hashes)])
    return df.withColumn(out, sig)


def lsh_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.7,
    max_bucket: int = 1000,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact Jaccard verification.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >=
    threshold.  rows = bands stage: signature split into ``bands``
    groups of ``num_hashes/bands`` values; docs sharing any band hash
    are candidates.  Candidates join back to their shingle sets for
    the exact verify — so false LSH positives never survive.
    """
    rows_per_band = num_hashes // bands
    sh = word_shingles(text_col, shingle_k)
    base = (
        df.select(F.col(id_col).alias("doc"), sh.alias("sh"))
        .withColumn(
            "sig", F.array(*[minhash_value(F.col("sh"), s) for s in range(num_hashes)])
        )
    )

    band_entries = base.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",", F.slice("sig", b * rows_per_band + 1, rows_per_band)
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")

    # Cap pathological buckets before the self-join (quadratic guard).
    bucket_sizes = band_entries.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    bounded = band_entries.join(
        bucket_sizes.where(F.col("n") <= max_bucket).select("band", "bucket"),
        ["band", "bucket"],
    )

    a = bounded.alias("a")
    b = bounded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )

    sh_a = base.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        candidates.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_k: int = 3,
    group_cols: list[str] | None = None,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs within blocking groups.

    Without LSH this is quadratic per group — callers MUST block
    (``group_cols``) to keep groups small; for unblocked corpora use
    ``lsh_near_dup_pairs``.
    """
    sh = word_shingles(text_col, shingle_k)
    base = df.select(
        *(group_cols or []), F.col(id_col).alias("doc"), sh.alias("sh")
    )
    a = base.alias("a")
    b = base.alias("b")
    cond = F.col("a.doc") < F.col("b.doc")
    for g in group_cols or []:
        cond = cond & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    return (
        a.join(b, cond)
        .select(
            *[F.col(f"a.{g}").alias(g) for g in (group_cols or [])],
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.round(
                F.size(F.array_intersect("a.sh", "b.sh"))
                / F.size(F.array_union("a.sh", "b.sh")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# --- SimHash -------------------------------------------------------------------

def _token_hash60(tok: Column) -> Column:
    """60-bit integer hash of a token (md5 prefix, base-16 decoded)."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


def with_simhash(
    df: DataFrame, text_col: str = "text", out: str = "simhash", bits: int = 60
) -> DataFrame:
    """60-bit SimHash fingerprint from whitespace tokens.

    Each distinct token votes ±1 per bit position of its hash; the
    fingerprint sets bits with positive vote sums.  Pure array algebra:
    no explode, no shuffle — one projection.
    """
    toks = F.array_distinct(tokens(normalized_text(text_col)))
    hashes = F.transform(toks, _token_hash60)

    def bit_sum(i: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1),
        )

    sim = None
    for i in range(bits):
        contrib = F.when(bit_sum(i) > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = contrib if sim is None else sim + contrib
    return df.withColumn(out, sim.cast("long"))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_hamming: int = 8,
    prefix_bits: int = 12,
) -> DataFrame:
    """SimHash near-dups: block on the top ``prefix_bits`` of the
    fingerprint, verify pairs by Hamming distance <= max_hamming.

    Prefix blocking keeps the join an equi-join; for recall across
    prefix boundaries run with rotated fingerprints (standard
    multi-table SimHash — left to callers).
    """
    hashed = with_simhash(df.select(F.col(id_col).alias("doc"), text_col))
    shift = 60 - prefix_bits
    blocked = hashed.withColumn("block", F.shiftrightunsigned("simhash", shift))
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block")) & (F.col("a.doc") < F.col("b.doc")),
        )
        .withColumn(
            "hamming",
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ),
        )
        .where(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.col("hamming"),
        )
    )
