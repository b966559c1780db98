"""Silver stage: flatten the NeoWs document into the 27-column table.

Capability parity with the reference flatten (reference
``src/etl/bronze_to_silver.py:34-153``): double explode (per-date NEO
list, per-NEO close-approach list), nested-leaf projection with casts,
placeholder->null normalization, partitioned parquet write.

Intentional divergence (SURVEY.md §1.3): the reference's normalization
loop re-casts every column to string, so its silver layer is entirely
string-typed on disk.  Here normalization touches string columns only,
so the silver schema keeps the declared types — parquet keeps min/max
stats and typed encodings, and gold doesn't need to re-cast (it still
does, for byte-identical observable schemas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from nasa_asteroid_data_lakehouse_spark.operators.normalize import (
    normalize_placeholders,
)
from nasa_asteroid_data_lakehouse_spark.sources.readers import read_json_multiline
from nasa_asteroid_data_lakehouse_spark.sources.writers import write_partitioned


def _diameter_struct() -> StructType:
    return StructType(
        [
            StructField("estimated_diameter_min", DoubleType()),
            StructField("estimated_diameter_max", DoubleType()),
        ]
    )


def neo_struct() -> StructType:
    """Explicit schema for one NEO element.  NeoWs numeric leaves under
    relative_velocity / miss_distance are JSON *strings* (matching the
    real API), hence StringType there and casts in the flatten."""
    return StructType(
        [
            StructField("id", StringType()),
            StructField("neo_reference_id", StringType()),
            StructField("name", StringType()),
            StructField("absolute_magnitude_h", DoubleType()),
            StructField("is_potentially_hazardous_asteroid", BooleanType()),
            StructField("is_sentry_object", BooleanType()),
            StructField("nasa_jpl_url", StringType()),
            StructField("links", StructType([StructField("self", StringType())])),
            StructField(
                "estimated_diameter",
                StructType(
                    [
                        StructField("kilometers", _diameter_struct()),
                        StructField("meters", _diameter_struct()),
                        StructField("miles", _diameter_struct()),
                        StructField("feet", _diameter_struct()),
                    ]
                ),
            ),
            StructField(
                "close_approach_data",
                ArrayType(
                    StructType(
                        [
                            StructField("close_approach_date", StringType()),
                            StructField("close_approach_date_full", StringType()),
                            StructField("epoch_date_close_approach", LongType()),
                            StructField(
                                "relative_velocity",
                                StructType(
                                    [
                                        StructField("kilometers_per_second", StringType()),
                                        StructField("kilometers_per_hour", StringType()),
                                        StructField("miles_per_hour", StringType()),
                                    ]
                                ),
                            ),
                            StructField(
                                "miss_distance",
                                StructType(
                                    [
                                        StructField("astronomical", StringType()),
                                        StructField("lunar", StringType()),
                                        StructField("kilometers", StringType()),
                                        StructField("miles", StringType()),
                                    ]
                                ),
                            ),
                            StructField("orbiting_body", StringType()),
                        ]
                    )
                ),
            ),
        ]
    )


def neows_schema(dates: list[str]) -> StructType:
    """Explicit feed schema for known dates — skips the inference pass
    (which reads the whole document twice; at scale the difference is a
    full extra scan).  The near_earth_objects object is logically a map
    keyed by date; with explicit dates we type it as a struct with one
    array field per date, matching what inference would produce."""
    neo = neo_struct()
    return StructType(
        [
            StructField(
                "near_earth_objects",
                StructType([StructField(d, ArrayType(neo)) for d in dates]),
            )
        ]
    )

# 27-column silver schema (SURVEY.md §1.3), as (name, source path, type).
_SCALARS = [
    ("id", "neo.id", "int"),
    ("neo_reference_id", "neo.neo_reference_id", "int"),
    ("name", "neo.name", "string"),
    ("absolute_magnitude_h", "neo.absolute_magnitude_h", "double"),
    ("is_hazardous", "neo.is_potentially_hazardous_asteroid", "boolean"),
    ("is_sentry", "neo.is_sentry_object", "boolean"),
    ("nasa_jpl_url", "neo.nasa_jpl_url", "string"),
    ("link_self", "neo.links.self", "string"),
]
_DIAMETERS = [
    (f"diam_{mm}_{unit_alias}", f"neo.estimated_diameter.{unit}.estimated_diameter_{mm}")
    for unit, unit_alias in [
        ("feet", "feet"),
        ("kilometers", "km"),
        ("meters", "m"),
        ("miles", "mi"),
    ]
    for mm in ("min", "max")
]
_APPROACH = [
    ("approach_date", "approach.close_approach_date", "string"),
    ("approach_date_full", "approach.close_approach_date_full", "string"),
    ("approach_epoch", "approach.epoch_date_close_approach", "double"),
    ("velocity_km_h", "approach.relative_velocity.kilometers_per_hour", "double"),
    ("velocity_km_s", "approach.relative_velocity.kilometers_per_second", "double"),
    ("velocity_mi_h", "approach.relative_velocity.miles_per_hour", "double"),
    ("miss_au", "approach.miss_distance.astronomical", "double"),
    ("miss_km", "approach.miss_distance.kilometers", "double"),
    ("miss_lunar", "approach.miss_distance.lunar", "double"),
    ("miss_mi", "approach.miss_distance.miles", "double"),
    ("orbiting_body", "approach.orbiting_body", "string"),
]

SILVER_COLUMNS = (
    [n for n, _, _ in _SCALARS]
    + [n for n, _ in _DIAMETERS]
    + [n for n, _, _ in _APPROACH]
)


def feed_dates(feed: DataFrame) -> list[str]:
    """Date keys present under near_earth_objects (JSON objects infer as
    structs, so the dates are the struct's field names)."""
    neo_field = feed.schema["near_earth_objects"].dataType
    return sorted(f.name for f in neo_field.fields)


def flatten_feed(feed: DataFrame, dates: list[str] | None = None) -> DataFrame:
    """NeoWs document -> one row per (asteroid, close approach).

    The reference flattens exactly one date per run; this accepts any
    subset of the document's dates and unions the per-date explodes
    (schema-identical by construction).
    """
    dates = dates or feed_dates(feed)
    per_date = [
        feed.select(F.explode(F.col(f"near_earth_objects.`{d}`")).alias("neo"))
        for d in dates
    ]
    neos = per_date[0]
    for other in per_date[1:]:
        neos = neos.unionByName(other)

    projected = neos.select(
        *[F.col(path).cast(t).alias(n) for n, path, t in _SCALARS],
        *[F.col(path).cast("double").alias(n) for n, path in _DIAMETERS],
        F.explode(F.col("neo.close_approach_data")).alias("approach"),
    ).select(
        *SILVER_COLUMNS[:16],
        *[F.col(path).cast(t).alias(n) for n, path, t in _APPROACH],
    )
    return normalize_placeholders(projected)


def build_silver(
    spark: SparkSession,
    bronze_paths: str | list[str],
    dates: list[str] | None = None,
) -> DataFrame:
    """Bronze JSON -> silver flatten.  With known ``dates`` the read uses
    the explicit schema (single pass); otherwise schema inference (an
    extra scan) discovers the date keys."""
    schema = neows_schema(dates) if dates else None
    feed = read_json_multiline(spark, bronze_paths, schema=schema)
    return flatten_feed(feed, dates)


def write_silver(df: DataFrame, lake_root: str) -> str:
    """Partitioned silver write; dynamic overwrite replaces only the
    approach_date partitions present in this batch."""
    path = f"{lake_root}/silver/asteroids"
    write_partitioned(df, path, partition_by=["approach_date"], mode="overwrite")
    return path
