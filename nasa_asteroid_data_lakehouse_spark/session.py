"""SparkSession factory.

The reference builds ad-hoc sessions per ETL script with inline S3A
credentials (reference ``src/etl/bronze_to_silver.py:15-29``).  Here the
session is centralized and tuned for the lakehouse workload:

* AQE on (runtime coalescing + skew-join handling) -- at 100 TB the
  static ``spark.sql.shuffle.partitions`` is always wrong for some stage;
  AQE re-plans from runtime stats.
* UTC session timezone (the reference parses ``yyyy-MMM-dd HH:mm``
  strings, which are locale/zone sensitive -- SURVEY.md §7).
* Arrow enabled for the Pandas-UDF paths (LLM operators).
* Shuffle partitions default sized for local testing; on a real cluster
  AQE coalesces and the caller can override via ``extra_conf``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(
    app_name: str = "nasa-asteroid-lakehouse-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[N]`` with N from ``$SPARK_GRAFT_CPUS``
    (falling back to ``local[*]``) so tests, bench, and the driver
    harness share one code path.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Idempotent daily re-runs replace only the partitions present in
        # the incoming data instead of truncating the whole table
        # (SURVEY.md §2 A7).
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # Nested-column pruning so the NeoWs flatten reads only the
        # projected struct leaves from parquet/JSON (SURVEY.md §4).
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        # Parquet TIMESTAMP(NANOS) columns (e.g. the events fixture) read
        # as long nanos-since-epoch instead of erroring; catalog.read_table
        # converts them to truncated-to-micros timestamps (matching DuckDB's
        # TIMESTAMP_NS -> TIMESTAMP cast).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def configure_s3a(
    spark: SparkSession,
    endpoint: str,
    access_key: str,
    secret_key: str,
    path_style: bool = True,
    ssl: bool = False,
) -> SparkSession:
    """Optional S3A/MinIO connector config (SURVEY.md §2 A10).

    Mirrors the connection settings the reference passes per job
    (reference ``src/etl/bronze_to_silver.py:21-29``); kept as a thin
    utility because object-store config is environment, not engine.
    """
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    conf.set("fs.s3a.endpoint", endpoint)
    conf.set("fs.s3a.access.key", access_key)
    conf.set("fs.s3a.secret.key", secret_key)
    conf.set("fs.s3a.path.style.access", str(path_style).lower())
    conf.set("fs.s3a.connection.ssl.enabled", str(ssl).lower())
    return spark
