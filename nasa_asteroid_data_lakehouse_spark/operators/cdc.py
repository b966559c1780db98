"""Change-data-capture style snapshot diffing.

Given two snapshots of the same logical table, classify every key as
inserted / deleted / updated / unchanged — the feed a downstream
incremental consumer (or a MERGE writer) needs when the upstream only
publishes full snapshots.  Complements ``operators/merge.py`` (which
APPLIES a change set) by DERIVING the change set.

Scale shape: one full shuffle on the key for the full-outer join —
unavoidable (every key must meet its counterpart) but minimal: both
sides are pruned to key + compared columns before the exchange, so the
shuffle moves only the diffable payload, not whole rows.  For repeated
diffs of bucketed snapshots written with the same bucketing spec, the
join is exchange-free (see ``operators/joins.py`` bucketed path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Full-outer diff of two snapshots keyed on ``key_cols``.

    Output: key columns, ``change_type`` ('insert' | 'delete' |
    'update' | 'unchanged'), and ``old_<c>`` / ``new_<c>`` for every
    compared column.  Comparison is null-safe (``<=>``): NULL -> value
    is an update, NULL -> NULL is not.  Rows with NULL keys never match
    across snapshots by definition; they surface as delete+insert,
    which is the honest reading of an unkeyed row.
    """
    if not key_cols:
        raise ValueError("snapshot_diff needs at least one key column")
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    cond = None
    for k in key_cols:
        eq = F.col(f"__ok_{k}") == F.col(f"__nk_{k}")
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer")

    # no compare columns = membership-only diff: keys classify as
    # insert/delete, present-in-both rows are unchanged
    changed = F.lit(False)
    for c in compare_cols:
        neq = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        changed = changed | neq
    change_type = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(
        *[
            F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k)
            for k in key_cols
        ],
        change_type.alias("change_type"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )
    if not include_unchanged:
        out = out.where(F.col("change_type") != "unchanged")
    return out
