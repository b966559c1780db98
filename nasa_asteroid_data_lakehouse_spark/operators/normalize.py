"""Placeholder-to-null normalization, typed.

Capability parity with the reference's silver cleanup loop (reference
``src/etl/bronze_to_silver.py:117-124``) which rewrites every column as
``when(trim(c) == 'NULL', None).when(... 'Null').when(... '')
.otherwise(trim(c))``.  The reference applies it to *all* columns;
because ``trim`` casts to string, that silently turns the whole table
into strings (SURVEY.md §1.3).  This implementation keeps the intent —
trim + placeholder→null — but only touches string columns, preserving
the schema.  At 100 TB this matters beyond hygiene: typed parquet
columns keep min/max stats and dictionary encodings, so downstream
predicates still push down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

DEFAULT_PLACEHOLDERS = ("NULL", "Null", "null", "")


def normalize_placeholders(
    df: DataFrame,
    columns: list[str] | None = None,
    placeholders: tuple[str, ...] = DEFAULT_PLACEHOLDERS,
) -> DataFrame:
    """Trim string columns and convert placeholder literals to null.

    ``columns`` defaults to every StringType column.  One single
    ``withColumns`` call (not a per-column loop) keeps the Catalyst plan
    flat — the reference's 27 chained ``withColumn`` calls each clone
    the logical plan, which bloats analysis time at wide schemas.
    """
    if columns is None:
        columns = [f.name for f in df.schema.fields if isinstance(f.dataType, StringType)]
    if not columns:
        return df
    replacements = {}
    for c in columns:
        trimmed = F.trim(F.col(c))
        replacements[c] = F.when(trimmed.isin(*placeholders), F.lit(None)).otherwise(
            trimmed
        )
    return df.withColumns(replacements)
