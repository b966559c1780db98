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

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark.llm.text import normalized_text, tokens


def _fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's default parallelism.

    The hash-heavy operators below (md5 per shingle/token) are
    CPU-bound projections; when the input arrives as a handful of
    small parquet splits (one file ⇒ one task), the whole fold runs on
    one core.  A cheap repartition of the raw text rows spreads it
    across the cluster; on inputs that are already well-partitioned
    (files ≫ cores, the 100 TB case) the exchange is noise.
    """
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


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

    Built by zip_with over k shifted slices of the token array — one
    pass, no per-index slice.  (The obvious
    ``transform(sequence(1, n-k+1), i -> concat_ws(' ', slice(toks,i,k)))``
    measured ~10x slower: slice-per-index copies O(n) per element.)

    Documents shorter than k words contribute their full token string
    as a single shingle so they still participate in hashing.
    """
    return F.array_distinct(word_shingle_sequence(col, k))


def word_shingle_sequence(col: Column | str, k: int = 3) -> Column:
    """Word k-grams IN DOCUMENT ORDER, duplicates preserved — the
    positional form :func:`longest_common_spans` needs (element i is
    the k-gram starting at token i).  :func:`word_shingles` is the
    distinct-set view of the same array.

    NULL text -> NULL (not ``['']``): a NULL payload is a fetch/decode
    failure, distinct from an empty document.  Without the explicit
    guard the short-doc fallback's ``concat_ws`` (which IGNORES null
    args) would manufacture the ``''`` shingle for NULL docs, silently
    pairing every failed-fetch row with every empty document — while
    SQL engines' NULL propagation drops them.  NULL shingles cascade
    NULL signatures / zero exploded rows, so NULL docs participate in
    NO shingle-keyed operator (the text twin of the NULL-vector rule).
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(normalized_text(col))
    n = F.size(toks)
    m = F.greatest(n - (k - 1), F.lit(0))  # shingle count when n >= k
    parts = [F.slice(toks, j + 1, m) for j in range(k)]
    grams = parts[0]
    for p in parts[1:]:
        grams = F.zip_with(grams, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return (
        F.when(c.isNull(), F.lit(None).cast("array<string>"))
        .when(n >= k, grams)
        .otherwise(F.array(F.concat_ws(" ", toks)))
    )


MINHASH_PRIME = 4294967311  # smallest prime > 2^32


def _minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic universal-hash coefficients (aᵢ odd 28-bit, bᵢ
    32-bit, derived from md5 so every engine/run agrees).  28-bit aᵢ
    keeps aᵢ·h + bᵢ < 2^61 — no 64-bit overflow in any engine."""
    import hashlib

    def h32(s: str, bits: int) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[: bits // 4], 16)

    return [(h32(f"a{i}", 28) | 1, h32(f"b{i}", 32)) for i in range(num_hashes)]


def shingle_base_hash(shingle: Column) -> Column:
    """32-bit base hash per shingle: md5 computed ONCE, first 8 hex
    chars decoded.  All num_hashes MinHash coordinates derive from this
    single digest via affine mixing — md5 is the expensive part."""
    return F.conv(F.substring(F.md5(shingle), 1, 8), 16, 10).cast("long")


def minhash_value(base_hashes: Column, a: int, b: int) -> Column:
    """One MinHash coordinate: min over shingles of (a·h + b) mod p."""
    return F.array_min(
        F.transform(base_hashes, lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_PRIME)
    )


def minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """array<long> MinHash signature via a single fold over the shingles.

    One md5 per shingle total, one traversal for ALL hash functions: the
    accumulator is the running vector of minima and each element updates
    every coordinate with its affine mix.  (Building the signature as N
    independent ``array_min(transform(...))`` expressions re-evaluates
    the shingle+md5 pipeline N times — Catalyst does not CSE across
    lambda functions; measured ~4x slower at N=4.)
    """
    coeffs = _minhash_coeffs(num_hashes)
    init = F.array(*[F.lit(MINHASH_PRIME).cast("long") for _ in coeffs])

    def step(acc: Column, s: Column) -> Column:
        h = shingle_base_hash(s)
        return F.array(
            *[
                F.least(acc[i], (F.lit(a) * h + F.lit(b)) % MINHASH_PRIME)
                for i, (a, b) in enumerate(coeffs)
            ]
        )

    return F.aggregate(shingles, init, step)


def with_minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_k: int = 3,
    out: str = "minhash",
) -> DataFrame:
    """Add an array<long> MinHash signature column."""
    return df.withColumn(
        out, minhash_signature(word_shingles(text_col, shingle_k), num_hashes)
    )


def lsh_signature_base(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Checkpointed ``(doc, sh, sig)`` frame — the shared input of LSH
    banding and exact-Jaccard verification.  The md5-per-shingle
    signature fold is the expensive projection; the checkpoint lets the
    plan reference it three times (banding + both verify sides) without
    recomputing (~3x at sf0.1), and callers running SEVERAL queries
    over the same corpus/parameters can share one build (VERDICT r11
    #4: the band sweep rebuilt ~5 s of shingles+signatures the near-dup
    family had already computed in the same session)."""
    sh = word_shingles(text_col, shingle_k)
    return (
        _fan_out(df.select(F.col(id_col).alias("doc"), text_col))
        .select("doc", sh.alias("sh"))
        .withColumn("sig", minhash_signature(F.col("sh"), num_hashes))
        .localCheckpoint(eager=False)
    )


def lsh_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.7,
    max_bucket: int = 1000,
    base: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact Jaccard verification.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >=
    threshold.  rows = bands stage: signature split into ``bands``
    groups of ``num_hashes/bands`` values; docs sharing any band hash
    are candidates.  Candidates join back to their shingle sets for
    the exact verify — so false LSH positives never survive.

    Pass a precomputed ``base`` (a :func:`lsh_signature_base` frame
    built with the SAME num_hashes/shingle_k) to share the signature
    build across callers; ``df``/``text_col`` are then ignored.
    """
    rows_per_band = num_hashes // bands
    if base is None:
        base = lsh_signature_base(
            df, id_col, text_col, num_hashes=num_hashes, shingle_k=shingle_k
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
    # Shape note (measured at sf0.1): aggregate + join-back beats a
    # count-over-window rewrite here — the filtered bucket list is
    # tiny, so AQE broadcasts the join-back, while WindowExec pays a
    # per-partition sort on the full band_entries.
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

    # Exact-Jaccard verify: one array_intersect per pair, with
    # |A∪B| = |A| + |B| − |A∩B| (saves the second hash-set pass) and a
    # pushdown barrier so the threshold filter stays ABOVE the
    # projection — Catalyst otherwise pushes the predicate under it and
    # the interpreted intersect runs twice per pair (no CSE between a
    # pushed filter and its project; measured 2x at sf0.1).
    #
    # Shape choice, measured at 200k docs / 10.9M candidate pairs: the
    # explode-join alternative (count common shingles via (pair,
    # shingle) hash joins) explodes candidates × shingles rows through
    # a shuffle — 38 s vs 18 s for this per-pair form, which shuffles
    # O(pairs) rows and keeps the verify embarrassingly parallel.
    sh_a = base.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    verified = (
        candidates.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                inter / (F.size("sh_a") + F.size("sh_b") - inter), 6
            ).alias("jaccard"),
            F.monotonically_increasing_id().alias("__barrier"),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .drop("__barrier")
    )
    return verified


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_k: int = 3,
    group_cols: list[str] | None = None,
    threshold: float = 1e-9,
    metric: str = "jaccard",
) -> DataFrame:
    """Exact n-gram Jaccard similarity via the explode-join formulation.

    ``metric="containment"`` emits ``common / min(|A|, |B|)`` instead —
    the asymmetric doc-contained-in-doc signal (a short document fully
    embedded in a long one scores 1.0 where its jaccard is tiny), the
    right metric for quote/boilerplate/subset dedup.

    Instead of materializing pairs and intersecting sets per pair
    (quadratic in set size per pair), explode (doc, shingle) rows and
    equi-join on shingle: each shared shingle contributes one pair-row,
    so |A∩B| is a count per (id_a, id_b) group and
    jaccard = common / (|A| + |B| - common).  Pairs sharing zero
    shingles never materialize — which is also why ``threshold`` must
    be > 0 (disjoint pairs are by definition not near-dups).

    ``group_cols`` additionally block the join (pairs only within a
    group).  The shuffle key is the shingle (plus group): one exchange,
    no cross join anywhere — the formulation that survives 100 TB.
    """
    if threshold <= 0:
        raise ValueError("threshold must be > 0 (disjoint pairs are never emitted)")
    groups = list(group_cols or [])
    sh = word_shingles(text_col, shingle_k)
    # Checkpoint the shingle sets: the plan references them four times
    # (both self-join sides + both size joins) and the shingle build is
    # the expensive projection — 2.3x at sf0.1.
    base = (
        _fan_out(df.select(*groups, F.col(id_col).alias("doc"), text_col))
        .select(*groups, "doc", sh.alias("sh"))
        .localCheckpoint(eager=False)
    )
    sizes = base.select(*groups, "doc", F.size("sh").alias("sz"))
    exploded = base.select(*groups, "doc", F.explode("sh").alias("shingle"))

    a, b = exploded.alias("a"), exploded.alias("b")
    cond = (F.col("a.shingle") == F.col("b.shingle")) & (
        F.col("a.doc") < F.col("b.doc")
    )
    for g in groups:
        cond = cond & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    common = (
        a.join(b, cond)
        .groupBy(
            *[F.col(f"a.{g}").alias(g) for g in groups],
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sz_a = sizes.select(*[F.col(g).alias(f"__ga_{g}") for g in groups],
                        F.col("doc").alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(*[F.col(g).alias(f"__gb_{g}") for g in groups],
                        F.col("doc").alias("id_b"), F.col("sz").alias("sz_b"))
    joined = common.join(sz_a.drop(*[f"__ga_{g}" for g in groups]), "id_a").join(
        sz_b.drop(*[f"__gb_{g}" for g in groups]), "id_b"
    )
    if metric == "jaccard":
        score = F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
    elif metric == "containment":
        score = F.col("common") / F.least(F.col("sz_a"), F.col("sz_b"))
    else:
        raise ValueError("metric must be 'jaccard' or 'containment'")
    return (
        joined.withColumn(metric, F.round(score, 6))
        .where(F.col(metric) >= threshold)
        .select(*groups, "id_a", "id_b", metric)
    )


def dup_span_coverage(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_k: int = 3,
    min_docs: int = 2,
) -> DataFrame:
    """Sequence-level duplication profile: how much of each document is
    made of word k-gram spans that also occur in other documents.

    Precondition: ``id_col`` is unique (the table sits after exact
    dedup in any pipeline); duplicate ids produce per-row rather than
    per-document coverage rows (driver_sim --const documents this).

    The span-level complement to whole-document dedup (exact/MinHash):
    a document can be globally unique while 90% of its n-grams are
    boilerplate shared with the rest of the corpus — exactly the
    duplicated-text signal sequence-level training-data dedup targets
    (cf. "Deduplicating Training Data Makes Language Models Better",
    Lee et al. 2022 — here at n-gram granularity, not suffix-array).

    Per document: ``n_shingles`` (distinct k-grams), ``n_dup_shingles``
    (those appearing in >= ``min_docs`` documents), ``dup_fraction``.

    Scale shape: explode distinct shingles, count docs per shingle
    (map-side partial agg collapses the frequency count before the
    exchange), join the per-shingle doc-frequency back to the exploded
    rows on the shingle key, re-aggregate per doc.  Two exchanges
    (shingle, doc); no pair materialization anywhere — cost is linear
    in corpus shingle volume, unlike pairwise jaccard.
    """
    base = (
        # NULL text = failed fetch: no span profile (the totals-side
        # left join would otherwise retain such rows with NULL counts
        # while every shingle-keyed engine drops them).
        _fan_out(
            df.select(F.col(id_col).alias("doc"), text_col).where(
                F.col(text_col).isNotNull()
            )
        )
        .select("doc", word_shingles(text_col, shingle_k).alias("sh"))
        .localCheckpoint(eager=False)
    )
    ex = base.select("doc", F.explode("sh").alias("shingle"))
    # shingles are distinct per doc, so count(*) per shingle == doc
    # frequency.  Filter to the duplicated ones BEFORE the join-back:
    # in a mostly-unique corpus that shrinks the join's build relation
    # from |vocabulary| to |duplicated shingles| — the totals never
    # needed the join (size(sh) is a narrow projection).
    dup_shingles = (
        ex.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("shingle")
    )
    dup_counts = (
        ex.join(dup_shingles, "shingle")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_dup_shingles"))
    )
    totals = base.select("doc", F.size("sh").alias("n_shingles"))
    return (
        totals.join(dup_counts, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            "n_shingles",
            F.coalesce(F.col("n_dup_shingles"), F.lit(0)).cast("long").alias(
                "n_dup_shingles"
            ),
            F.round(
                F.coalesce(F.col("n_dup_shingles"), F.lit(0))
                / F.col("n_shingles"),
                6,
            ).alias("dup_fraction"),
        )
    )


def longest_common_spans(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_k: int = 3,
    group_cols: list[str] | None = None,
    min_span_words: int = 4,
) -> DataFrame:
    """Longest common word span per document pair — the exact-substring
    dedup signal ("Deduplicating Training Data Makes Language Models
    Better" finds duplicated 50-token spans with a suffix array; this
    is the same signal at k-gram resolution, as pure relational
    algebra).

    The diagonal trick: explode k-grams WITH their positions, equi-join
    on the k-gram across documents, and note that matches belonging to
    one contiguous common substring all share the same diagonal
    ``pos_a - pos_b`` at CONSECUTIVE ``pos_a`` — so a gaps-and-islands
    pass per (pair, diagonal) turns match runs into spans:
    ``span_words = run_length + k - 1``.  Shuffle keys: the shingle
    (join), then (pair, diagonal) for the window — no quadratic
    per-pair set intersection anywhere.

    Output: group cols, id_a, id_b, ``span_words`` (longest), and
    ``n_spans`` (count of maximal spans of at least ``min_span_words``),
    for pairs whose longest span reaches ``min_span_words``.
    ``group_cols`` block the pair space exactly like
    :func:`ngram_jaccard_pairs`; at corpus scale feed LSH candidates.
    """
    from pyspark.sql import Window

    groups = list(group_cols or [])
    base = (
        _fan_out(df.select(*groups, F.col(id_col).alias("doc"), text_col))
        .select(
            *groups, "doc",
            F.posexplode(word_shingle_sequence(text_col, shingle_k)).alias(
                "pos", "shingle"
            ),
        )
        .localCheckpoint(eager=False)
    )
    a, b = base.alias("a"), base.alias("b")
    cond = (F.col("a.shingle") == F.col("b.shingle")) & (
        F.col("a.doc") < F.col("b.doc")
    )
    for g in groups:
        cond = cond & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    matches = a.join(b, cond).select(
        *[F.col(f"a.{g}").alias(g) for g in groups],
        F.col("a.doc").alias("id_a"),
        F.col("b.doc").alias("id_b"),
        F.col("a.pos").alias("pos_a"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )
    w = Window.partitionBy(*groups, "id_a", "id_b", "diag").orderBy("pos_a")
    runs = matches.withColumn(
        "grp", F.col("pos_a") - F.row_number().over(w)
    )
    spans = runs.groupBy(*groups, "id_a", "id_b", "diag", "grp").agg(
        (F.count(F.lit(1)) + F.lit(shingle_k - 1)).alias("span_words")
    )
    return (
        spans.where(F.col("span_words") >= min_span_words)
        .groupBy(*groups, "id_a", "id_b")
        .agg(
            F.max("span_words").alias("span_words"),
            F.count(F.lit(1)).alias("n_spans"),
        )
    )


# --- benchmark decontamination ------------------------------------------------

def decontamination_hits(
    corpus: DataFrame,
    eval_docs: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_k: int = 3,
) -> DataFrame:
    """Train/eval overlap scrub: corpus docs sharing any word k-gram
    with a benchmark/eval set, with the count of distinct shared
    k-grams per doc.

    The eval side (benchmarks are small — thousands of docs vs billions
    in the corpus) collapses to a distinct-shingle set and is broadcast,
    so the 100 TB corpus side never shuffles: scan → explode → broadcast
    hash join → partial-agg count per doc.  Pair with
    :func:`decontaminate` to drop the hits.
    """
    ev = (
        eval_docs.select(
            F.explode(word_shingles(text_col, shingle_k)).alias("shingle")
        )
        .distinct()
    )
    sh = corpus.select(
        F.col(id_col), F.explode(word_shingles(text_col, shingle_k)).alias("shingle")
    )
    return (
        sh.join(F.broadcast(ev), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )


def decontaminate(
    corpus: DataFrame,
    eval_docs: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_k: int = 3,
) -> DataFrame:
    """Corpus minus every doc flagged by :func:`decontamination_hits`
    (left_anti on the hit ids)."""
    hits = decontamination_hits(corpus, eval_docs, id_col, text_col, shingle_k)
    return corpus.join(hits.select(id_col), id_col, "left_anti")


# --- SimHash -------------------------------------------------------------------

def _token_hash60(tok: Column) -> Column:
    """60-bit integer hash of a token (md5 prefix, base-16 decoded)."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


def with_simhash(
    df: DataFrame, text_col: str = "text", out: str = "simhash", bits: int = 60
) -> DataFrame:
    """60-bit SimHash fingerprint from whitespace tokens.

    Each distinct token votes ±1 per bit position of its hash; the
    fingerprint sets bits with positive vote sums.  One fold over the
    token array carries the full vote vector (each token hashed once);
    the ``finish`` lambda assembles the bits.  Pure array algebra: no
    explode, no shuffle, no Python — one projection.
    """
    toks = F.array_distinct(tokens(normalized_text(text_col)))
    init = F.array(*[F.lit(0) for _ in range(bits)])

    def step(acc: Column, tok: Column) -> Column:
        h = _token_hash60(tok)
        return F.array(
            *[
                acc[i] + F.when(h.bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1)
                for i in range(bits)
            ]
        )

    def finish(acc: Column) -> Column:
        sim = F.lit(0).cast("long")
        for i in range(bits):
            sim = sim + F.when(acc[i] > 0, F.lit(1 << i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        return sim

    return df.withColumn(out, F.aggregate(toks, init, step, finish))


def simhash_by_key(
    df: DataFrame,
    key_col: str,
    text_col: str = "text",
    out: str = "simhash",
    bits: int = 60,
) -> DataFrame:
    """``(key, simhash)`` via explode + 60 conditional-count aggregates.

    Equivalent to :func:`with_simhash` (bit i of the fingerprint is set
    iff more than half the distinct tokens have bit i set in their hash:
    ±1 votes sum positive ⟺ 2·countᵢ > n) but shaped for scale: no
    per-token array construction, each token hashed exactly once, and
    the 60 ``sum((h >> i) & 1)`` aggregates partial-aggregate map-side
    before the single shuffle on ``key_col``.  Prefer this form whenever
    a key column exists; ``with_simhash`` remains the zero-shuffle
    projection form for keyless frames.
    """
    toks = F.array_distinct(tokens(normalized_text(text_col)))
    exploded = (
        _fan_out(df.select(F.col(key_col).alias("__k"), text_col))
        .select("__k", F.explode(toks).alias("__t"))
        .withColumn("__h", _token_hash60(F.col("__t")))
    )
    counts = exploded.groupBy("__k").agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.shiftright("__h", i).bitwiseAND(F.lit(1))).alias(f"__c{i}")
            for i in range(bits)
        ],
    )
    sim = F.lit(0).cast("long")
    for i in range(bits):
        sim = sim + F.when(
            F.col(f"__c{i}") * 2 > F.col("__n"), F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return counts.select(F.col("__k").alias(key_col), sim.alias(out))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_hamming: int = 8,
    prefix_bits: int = 12,
    hashed: DataFrame | None = None,
) -> DataFrame:
    """SimHash near-dups: block on the top ``prefix_bits`` of the
    fingerprint, verify pairs by Hamming distance <= max_hamming.

    Prefix blocking keeps the join an equi-join; for recall across
    prefix boundaries run with rotated fingerprints (standard
    multi-table SimHash — left to callers).

    The (doc, simhash) table is localCheckpoint-ed before the
    self-join: it is tiny (two columns) and the checkpoint stops Spark
    recomputing the token-hash aggregation on both join sides.  Pass a
    precomputed ``hashed`` (doc, simhash) table to share the signature
    computation across callers (e.g. a fingerprint query and this pair
    generator over the same corpus).
    """
    if hashed is None:
        hashed = simhash_by_key(
            df.select(F.col(id_col).alias("doc"), text_col), "doc", text_col
        ).localCheckpoint(eager=False)
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


# --- near-dup clustering ------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 30,
    small_graph_edges: int = 500_000,
) -> DataFrame:
    """Connected components of the near-dup pair graph: ``(node,
    component)`` with component = the minimum node id reachable.

    **Adaptive execution** (same philosophy as Spark's own
    broadcast-join selection): the edge list a near-dup pair generator
    emits is a verified, thresholded graph — orders of magnitude
    smaller than the corpus — so when it fits comfortably on the
    driver (≤ ``small_graph_edges`` edges; collect() materializes
    Row objects at ~10× the raw-byte estimate, hence the conservative
    500k default ≈ low hundreds of MB worst case) a driver-side
    union-find answers in one collect instead of paying
    2-4 rounds of join+groupBy shuffles whose fixed cost dominates at
    small |E|.  Larger graphs take the distributed path unchanged.
    Both paths return identical (node, min-reachable-id) labels.

    Distributed path: iterative min-label propagation as DataFrame
    jobs (the same driver-loop pattern as ``similarity.kmeans_fit``):
    each round every node takes the min of its own label and its
    neighbors' labels; convergence in O(graph diameter) rounds —
    near-dup clusters are shallow, so typically 2-4.  Each round is
    one join + one groupBy (shuffles on node id); ``localCheckpoint``
    cuts the lineage so the plan doesn't grow with iterations.
    Converged state is detected by counting changed labels (a
    driver-side scalar, not a collect of rows).

    Only nodes that appear in ``pairs`` are returned; singleton
    documents are their own trivial component by construction and
    don't need rows.
    """
    # Materialize the edge projection ONCE: the pair generator's plan
    # ends in an (often expensive, un-checkpointed) verify stage, and
    # every action below — size probe, collect, or the iterative
    # loop's first join — would otherwise re-run it.
    fwd = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).localCheckpoint(eager=True)
    n_edges = fwd.limit(small_graph_edges + 1).count()
    if n_edges <= small_graph_edges:
        edge_rows = fwd.collect()
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in edge_rows:
            a, b = r["src"], r["dst"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
        # component label = min member id (matches the iterative path)
        comp_min: dict = {}
        for node in parent:
            root = find(node)
            if root not in comp_min or node < comp_min[root]:
                comp_min[root] = node
        id_type = dict(pairs.dtypes)[id_a]  # labels keep the id's type
        # Ship the result back through Arrow (one pandas frame), not a
        # local list of tuples — createDataFrame over Python tuples
        # pickles per-row and is the slow path at hundreds of
        # thousands of labels.
        out = pd.DataFrame(
            {
                "node": list(parent),
                "component": [comp_min[find(node)] for node in parent],
            }
        )
        return pairs.sparkSession.createDataFrame(
            out, schema=f"node {id_type}, component {id_type}"
        )
    edges = (
        fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, F.col("dst") == F.col("node"))
            .groupBy("src")
            .agg(F.min("component").alias("nb_min"))
        )
        new_labels = (
            labels.join(neighbor_min, F.col("node") == F.col("src"), "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nb_min", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("component", "__old"), "node"
            )
            .where(F.col("component") != F.col("__old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_by_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
) -> DataFrame:
    """Drop every near-duplicate except each cluster's minimum-id
    survivor: pairs -> connected components -> anti-join the losers.
    Composes with any pair generator (MinHash-LSH, SimHash, embedding
    cosine)."""
    components = connected_components(pairs)
    losers = components.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("__loser")
    )
    return df.join(
        losers, F.col(id_col) == F.col("__loser"), "left_anti"
    )

# --- incremental corpus dedup ------------------------------------------------

def incremental_admit(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.7,
    max_bucket: int = 1000,
) -> DataFrame:
    """Admit only the ``batch`` rows that are NOT near-duplicates of the
    accepted ``corpus`` nor of a lower-id row in the same batch — the
    continuous-ingest dedup pattern: each day's crawl is screened
    against everything already admitted without re-pairing the corpus
    with itself.

    Candidate generation is the same shingle → minhash → band →
    bucket-join as :func:`lsh_near_dup_pairs`, but the self-join is
    side-constrained: corpus×corpus pairs are never formed (the corpus
    is already deduplicated), so the quadratic term is |batch|-driven.
    At scale the corpus band-bucket table is persisted (computed once
    per admitted doc, bucketed by (band, bucket)), making each
    incremental run a shuffle of the new batch only.  Verification is
    exact Jaccard on the candidates; a corpus match rejects the batch
    doc regardless of id order.  Returns the admitted ``batch`` rows
    with their original columns.
    """
    rows_per_band = num_hashes // bands
    tagged = (
        corpus.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__txt"))
        .withColumn("side", F.lit("corpus"))
        .unionByName(
            batch.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__txt"))
            .withColumn("side", F.lit("batch"))
        )
    )
    base = (
        _fan_out(tagged)
        .select("doc", "side", word_shingles("__txt", shingle_k).alias("sh"))
        .withColumn("sig", minhash_signature(F.col("sh"), num_hashes))
        .localCheckpoint(eager=False)
    )
    band_entries = base.select(
        "doc",
        "side",
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
    ).select("doc", "side", "bb.band", "bb.bucket")

    bucket_sizes = band_entries.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    bounded = band_entries.join(
        bucket_sizes.where(F.col("n") <= max_bucket).select("band", "bucket"),
        ["band", "bucket"],
    )

    a, b = bounded.alias("a"), bounded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("b.side") == "batch")
            & ((F.col("a.side") == "corpus") | (F.col("a.doc") < F.col("b.doc"))),
        )
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )

    sh_a = base.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    dropped = (
        candidates.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select(
            "id_b",
            F.round(
                inter / (F.size("sh_a") + F.size("sh_b") - inter), 6
            ).alias("__jac"),
            # pushdown barrier (same Catalyst CSE gap as lsh_near_dup_pairs)
            F.monotonically_increasing_id().alias("__barrier"),
        )
        .where(F.col("__jac") >= jaccard_threshold)
        .select("id_b")
        .distinct()
    )
    return batch.join(
        dropped, F.col(id_col) == F.col("id_b"), "left_anti"
    )

def dedup_by_clusters_best(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    order_by: list,
) -> DataFrame:
    """Like :func:`dedup_by_clusters`, but each cluster's survivor is
    chosen by an explicit ordering (e.g. highest quality score or
    longest text) instead of minimum id — the curation pattern where
    near-duplicate groups keep their best exemplar.  ``order_by``
    must be deterministic (include an id tie-break).

    The ranking runs on the component table (only clustered docs, a
    tiny fraction of the corpus), so the quality-column join-back and
    the window both touch O(|clustered|) rows, never the full corpus.
    """
    from pyspark.sql import Window

    components = connected_components(pairs)
    attrs = df.select(F.col(id_col).alias("__node"), *[
        c for c in df.columns if c != id_col
    ])
    ranked = (
        components.join(attrs, F.col("node") == F.col("__node"))
        .withColumn(
            "__rk",
            F.row_number().over(Window.partitionBy("component").orderBy(*order_by)),
        )
    )
    losers = ranked.where(F.col("__rk") > 1).select(F.col("node").alias("__loser"))
    return df.join(losers, F.col(id_col) == F.col("__loser"), "left_anti")
