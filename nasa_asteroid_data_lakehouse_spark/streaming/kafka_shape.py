"""Kafka-wire-shaped streaming source adapter.

Structured Streaming's Kafka source always presents the same seven
columns — ``key``/``value`` binary, ``topic``, ``partition``,
``offset``, ``timestamp``, ``timestampType`` — regardless of broker.
This module reproduces that wire shape over file-backed fixtures so
the downstream graph (decode → watermark → window / dedup / merge,
``streaming/events.py``) is written once against the Kafka schema and
deploys unchanged by swapping :func:`read_kafka_shaped_stream` for
``spark.readStream.format("kafka")`` (the real connector needs the
spark-sql-kafka package, not present in this environment).

The reference has no streaming at all (SURVEY.md §2 I — its
incrementality is Airflow daily batch); this is the scale path for the
same ingest: at 100 TB/day the per-day REST pull becomes a Kafka topic
partitioned by key, and offsets+checkpoints replace the per-day file
naming as the exactly-once bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from nasa_asteroid_data_lakehouse_spark.streaming.events import EVENTS_SCHEMA

# to_json/from_json default to millisecond precision; events carry
# microseconds, so pin the format on both sides of the wire.  The NTZ
# variant must be pinned separately: parquet fixtures read back as
# TIMESTAMP_NTZ, and to_json ignores `timestampFormat` for NTZ columns
# (it would otherwise emit ISO millis that the decoder's 6-digit
# pattern rejects into nulls).
_TS_PATTERN = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT = {"timestampFormat": _TS_PATTERN, "timestampNTZFormat": _TS_PATTERN}

KAFKA_WIRE_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)


def to_kafka_wire(
    events: DataFrame,
    topic: str = "events",
    num_partitions: int = 8,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Encode an events frame into Kafka's wire shape: JSON value bytes,
    key-hash partition assignment, per-partition monotone offsets.

    The offset window is per topic-partition — exactly the order a real
    broker would assign — and only exists in this test encoder; a real
    topic arrives with offsets already assigned."""
    cols = events.columns
    shaped = events.select(
        F.col(key_col).cast("string").cast("binary").alias("key"),
        F.to_json(F.struct(*cols), _TS_FMT).cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod(F.xxhash64(key_col), F.lit(num_partitions)).cast("int").alias("partition"),
        F.col(ts_col).cast("timestamp").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    w = Window.partitionBy("topic", "partition").orderBy("timestamp", "key")
    return shaped.select(
        "key",
        "value",
        "topic",
        "partition",
        (F.row_number().over(w) - 1).cast("long").alias("offset"),
        "timestamp",
        "timestampType",
    )


def write_kafka_wire(events: DataFrame, path: str, **kwargs) -> None:
    """Materialize the wire shape as parquet files the file-source
    stream can discover incrementally."""
    to_kafka_wire(events, **kwargs).write.mode("overwrite").parquet(path)


def read_kafka_shaped_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 10
) -> DataFrame:
    """File-backed stream with the exact Kafka source schema.  Swap for
    ``spark.readStream.format("kafka").option("subscribe", topic)`` in
    production — downstream code cannot tell the difference."""
    return (
        spark.readStream.format("parquet")
        .schema(KAFKA_WIRE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def decode_events(kafka_df: DataFrame) -> DataFrame:
    """Kafka wire → typed events: JSON-decode ``value`` with the
    explicit events schema (bad records become null structs and are
    dropped, the permissive-parse pattern)."""
    parsed = kafka_df.select(
        F.from_json(F.col("value").cast("string"), EVENTS_SCHEMA, _TS_FMT).alias("e")
    )
    return parsed.where(F.col("e").isNotNull()).select("e.*")
