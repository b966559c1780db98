"""Calendar kit (SURVEY.md §2 H6-H8).

Parity with the reference's date-dimension derivations (reference
``src/etl/silver_to_gold.py:55-65``): parse the NeoWs
``yyyy-MMM-dd HH:mm`` full-date strings and decompose into calendar
parts.  The MMM month abbreviation is locale-sensitive — the session
factory pins UTC and Spark's default locale handling covers English
abbreviations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

NEOWS_TS_FORMAT = "yyyy-MMM-dd HH:mm"


def parse_neows_timestamp(col: Column | str, fmt: str = NEOWS_TS_FORMAT) -> Column:
    return F.to_timestamp(col, fmt)


def calendar_parts(ts: Column | str) -> dict[str, Column]:
    """The standard calendar decomposition used by the date dimension."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return {
        "year": F.year(c),
        "month": F.month(c),
        "day": F.dayofmonth(c),
        "hour": F.hour(c),
        "minute": F.minute(c),
        "week_of_year": F.weekofyear(c),  # ISO week, matches DuckDB weekofyear
    }


def with_calendar_parts(df: DataFrame, ts_col: str, prefix: str = "") -> DataFrame:
    parts = calendar_parts(ts_col)
    return df.withColumns({f"{prefix}{k}": v for k, v in parts.items()})
