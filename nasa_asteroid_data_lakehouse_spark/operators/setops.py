"""Set operations (SURVEY.md §2 G).

The reference's only set op is schema-tolerant union-by-name inside its
merge (reference ``src/utils/bucket.py:80``); the rest of the ANSI set
surface is provided for completeness.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_by_name(*dfs: DataFrame, allow_missing: bool = True) -> DataFrame:
    """Union any number of frames by column NAME, null-filling columns a
    side lacks.  This is how the merge tolerates schema drift between
    runs (columns added/removed over time).
    """
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), dfs)


def intersect_rows(a: DataFrame, b: DataFrame, all_rows: bool = False) -> DataFrame:
    return a.intersectAll(b) if all_rows else a.intersect(b)


def except_rows(a: DataFrame, b: DataFrame, all_rows: bool = False) -> DataFrame:
    return a.exceptAll(b) if all_rows else a.subtract(b)
