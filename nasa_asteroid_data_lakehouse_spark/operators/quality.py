"""Data-quality gates.

The reference's correctness mechanisms are observational — printSchema
echoes and print-based null/distinct profiling (reference
``src/etl/bronze_to_silver.py:127-143``) plus try/except runtime guards.
These operators make the same checks *enforceable*: each returns a
violations DataFrame (empty = pass) and ``enforce`` raises with a
sample of offending rows.  All checks are single aggregate passes or
semi-joins — no per-column job storms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class QualityError(ValueError):
    """A data-quality expectation failed."""


def expect_columns(df: DataFrame, expected: list[str]) -> None:
    """Schema gate: the enforceable version of the reference's
    printSchema echo.  Exact column-name set and order."""
    if df.columns != expected:
        raise QualityError(
            f"schema mismatch: expected {expected}, got {df.columns}"
        )


def non_null_violations(df: DataFrame, columns: list[str]) -> DataFrame:
    """Rows where any required column is null."""
    cond = None
    for c in columns:
        clause = F.col(c).isNull()
        cond = clause if cond is None else cond | clause
    return df.where(cond)


def unique_key_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key groups occurring more than once (key cols + dup_count)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )


def referential_violations(child: DataFrame, parent: DataFrame, key: str) -> DataFrame:
    """Child rows whose key has no parent (anti-join orphan check)."""
    return child.join(parent.select(key).distinct(), key, "left_anti")


def accepted_values_violations(df: DataFrame, column: str, allowed: list) -> DataFrame:
    return df.where(~F.col(column).isin(allowed) | F.col(column).isNull())


def enforce(violations: DataFrame, check_name: str, sample: int = 5) -> None:
    """Raise QualityError with a row sample if any violations exist.

    One job: take(sample+ nothing else) — don't count() first (that's a
    second full scan just to learn what take() already tells us).
    """
    rows = violations.take(sample)
    if rows:
        raise QualityError(
            f"quality check '{check_name}' failed; sample violations: "
            + "; ".join(str(r.asDict()) for r in rows)
        )
