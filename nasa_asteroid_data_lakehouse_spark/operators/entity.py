"""Entity resolution: blocked fuzzy string matching (net-new surface;
the reference joins nothing — SURVEY.md §2.C — and its only key logic
is exact sha2 surrogate keys, `src/etl/silver_to_gold.py:118-121`).

The scalable pattern for fuzzy matching a name-like column:

1. **Canonicalize to the vocabulary first.**  ``groupBy(name)`` the
   raw rows down to distinct names + occurrence counts.  On real data
   the vocabulary is orders of magnitude smaller than the row count,
   so the quadratic step never sees row-scale data.
2. **Block.**  Self-joining the vocabulary is O(V²); joining within a
   blocking key (a token, a phonetic code, a prefix) is
   O(sum-of-block²).  The block expression is caller-supplied.
3. **Score within blocks** with ``levenshtein`` (JVM built-in — stays
   inside whole-stage codegen, no UDF).

At 100 TB: step 1 is one shuffle on the name; the vocabulary side is
usually broadcastable, so step 2 is a broadcast hash join with zero
extra shuffles.  If the vocabulary itself is huge, the same plan
degrades gracefully to a sort-merge join on ``block``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def blocked_fuzzy_pairs(
    df: DataFrame,
    name_col: str,
    block: Column,
    min_dist: int = 1,
    max_dist: int = 3,
    broadcast_names: bool = True,
) -> DataFrame:
    """All within-block name pairs with edit distance in [min, max].

    Output: ``name_a, name_b, distance, n_a, n_b`` where ``n_*`` are
    the raw-row occurrence counts of each name (``name_a < name_b``
    canonical ordering — each pair reported once).

    ``broadcast_names=False`` drops the broadcast hint when the
    vocabulary itself is too large to ship to every executor; the
    self-join then plans as a sort-merge join on the block key.

    A NULL block expression is coalesced to ``''`` so those names still
    pair with each other (NULL join keys never match and would silently
    drop them) — this also mirrors SQL ``split_part``, which returns
    ``''`` rather than NULL when the separator is absent.
    """
    names = df.groupBy(
        F.col(name_col).alias("name"), F.coalesce(block, F.lit("")).alias("block")
    ).agg(F.count(F.lit(1)).alias("n"))
    a = names.select(
        F.col("name").alias("name_a"), "block", F.col("n").alias("n_a")
    )
    b = names.select(
        F.col("name").alias("name_b"), "block", F.col("n").alias("n_b")
    )
    return (
        a.join(broadcast(b) if broadcast_names else b, "block")
        .where(F.col("name_a") < F.col("name_b"))
        .withColumn("distance", F.levenshtein("name_a", "name_b"))
        .where(F.col("distance").between(min_dist, max_dist))
        .select("name_a", "name_b", "distance", "n_a", "n_b")
    )
