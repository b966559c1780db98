"""Minimal catalog: name -> path registry with temp-view registration.

The reference's "catalog" is a Streamlit page running DuckDB
``read_parquet('s3://.../gold/<t>/*.parquet')`` per table (reference
``src/streamlit_app.py:35-53``).  The Spark-native equivalent is
``spark.read.parquet`` + ``createOrReplaceTempView`` so the whole
surface is queryable via ``spark.sql``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# The driver's synthetic star schema (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Columns stored as parquet TIMESTAMP(NANOS); Spark reads them as long
# (see session.py nanosAsLong) and we convert to micros-truncated
# timestamps so semantics match DuckDB's TIMESTAMP_NS -> TIMESTAMP cast.
NS_TIMESTAMP_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, normalizing nanos-timestamp columns.

    Sets ``nanosAsLong`` at read time so the engine works under any
    caller-provided session (the round driver builds its own), not just
    ones from our session factory.
    """
    if name in NS_TIMESTAMP_COLS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in NS_TIMESTAMP_COLS.get(name, ()):
        if isinstance(df.schema[col].dataType, LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


class Catalog:
    """Name -> parquet path registry over a lake root directory."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._tables: dict[str, str] = {}

    def register(self, name: str, path: str | None = None) -> None:
        self._tables[name] = path or os.path.join(self.root, f"{name}.parquet")

    def table(self, name: str) -> DataFrame:
        if name not in self._tables:
            self.register(name)
        return self.spark.read.parquet(self._tables[name])

    def create_views(self, names: tuple[str, ...] = TESTDATA_TABLES) -> None:
        """Register each table as a temp view for ``spark.sql`` serving."""
        for name in names:
            self.table(name).createOrReplaceTempView(name)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load the synthetic star-schema tables from an sf directory."""
    return {n: read_table(spark, sf_dir, n) for n in names}
