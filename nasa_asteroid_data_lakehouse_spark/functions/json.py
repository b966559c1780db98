"""JSON-string column kit (SURVEY.md §2 H10).

The reference only parses JSON at the source level (``read.json``);
embedded JSON-string columns (like the fixtures' ``events.props``) need
in-query extraction.  ``from_json`` with an explicit schema is the
scale path: typed once, whole-stage-codegen friendly, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def parse_json_column(
    df: DataFrame, col: str, schema: StructType | str, out: str | None = None
) -> DataFrame:
    """Parse a JSON-string column into a typed struct column."""
    return df.withColumn(out or f"{col}_parsed", F.from_json(F.col(col), schema))


def json_get(col: str, path: str):
    """Extract one field lazily via get_json_object ('$.field' path).

    Use for ad-hoc single-field pulls; prefer ``parse_json_column`` when
    several fields are read (one parse instead of N).
    """
    return F.get_json_object(F.col(col), path)
