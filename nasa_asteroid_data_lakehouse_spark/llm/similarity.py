"""Similarity search over embedding columns (array<float>).

Two paths:

* ``cosine_topk`` — brute-force exact top-k: one narrow projection
  computing the cosine in double precision via array algebra
  (``zip_with`` + ``aggregate``, JVM built-ins), then
  TakeOrderedAndProject.  O(n·d) scan, no shuffle — the right baseline,
  and at 100 TB still viable when filters prune the candidate set.
* ``hyperplane_lsh`` — sign-random-projection buckets: B deterministic
  pseudo-random hyperplanes (coefficients derived from md5, so every
  run/engine agrees) give a B-bit bucket id; search only the query's
  bucket (optionally ± Hamming-1 probes).  Turns top-k into an
  equi-join on bucket id: the 1000-executor path.

An IVF variant (k-means coarse quantizer) would slot in the same way —
assign-to-centroid replaces the bucket id; omitted because the fixture
is small and hyperplane LSH covers the bucketing pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, sequential order (portable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k by cosine similarity against a constant query vector.

    Plans as scan -> projection -> TakeOrderedAndProject: each partition
    keeps its local k, the driver merges — no global sort, no shuffle.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), round_to).alias("cosine_sim"),
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


# --- hyperplane LSH -------------------------------------------------------------

def _plane_coef(plane: int, dim: int) -> float:
    """Deterministic pseudo-random coefficient in [-1, 1): derived from
    md5(plane_dim), so identical across engines and runs."""
    import hashlib

    h = hashlib.md5(f"{plane}_{dim}".encode()).hexdigest()
    return (int(h[:15], 16) % 2000 - 1000) / 1000.0


def hyperplane_coefficients(num_planes: int, dim: int) -> list[list[float]]:
    return [[_plane_coef(p, d) for d in range(dim)] for p in range(num_planes)]


def bucket_id(vec_col: Column, planes: list[list[float]]) -> Column:
    """B-bit bucket: bit p set iff vec · plane_p >= 0."""
    bucket = F.lit(0).cast("long")
    for p, coefs in enumerate(planes):
        plane = F.array(*[F.lit(c) for c in coefs])
        bit = F.when(dot(vec_col, plane) >= 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit
    return bucket


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
    out: str = "bucket",
) -> DataFrame:
    planes = hyperplane_coefficients(num_planes, dim)
    return df.withColumn(out, bucket_id(F.col(vec_col), planes))


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    probe_hamming: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k: score only vectors whose bucket is within
    ``probe_hamming`` bits of the query's bucket.

    At scale the table is written bucketed/partitioned by ``bucket`` so
    this prunes partitions instead of filtering a full scan.
    """
    dim = len(query_vec)
    planes = hyperplane_coefficients(num_planes, dim)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    q_bucket = sum(
        (1 << p)
        for p, coefs in enumerate(planes)
        if sum(c * v for c, v in zip(coefs, query_vec)) >= 0
    )
    bucketed = with_lsh_bucket(df, vec_col, num_planes, dim)
    candidates = bucketed.where(
        F.bit_count(F.col("bucket").bitwiseXOR(F.lit(q_bucket))) <= probe_hamming
    )
    scored = candidates.select(
        F.col(id_col),
        F.col("bucket"),
        F.round(cosine(F.col(vec_col), q), round_to).alias("cosine_sim"),
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    threshold: float = 0.95,
    round_to: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicates via bucketed self-join.

    Same-bucket pairs only (sign-LSH: cos-similar vectors collide with
    high probability); exact cosine verify on candidates.
    """
    sample = df.select(vec_col).first()
    dim = len(sample[vec_col])
    bucketed = with_lsh_bucket(df, vec_col, num_planes, dim).select(
        F.col(id_col).alias("doc"), F.col(vec_col).alias("v"), "bucket"
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), round_to).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )
