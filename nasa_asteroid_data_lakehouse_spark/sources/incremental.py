"""Incremental file-listing source (Auto-Loader-style bronze ingest).

The reference ingests one file per day and rereads whole paths on every
run (``src/etl/bronze_ingest.py:30-37``, ``src/etl/bronze_to_silver.py:34-38``);
the scalable pattern (SURVEY.md §1.1) is a growing raw zone where each
pipeline run processes ONLY files it has not seen.  This module tracks
processed files in a JSON manifest beside the data:

1. ``discover_new_files`` — list the directory, subtract the manifest.
2. ``read_new_files`` — one DataFrame over just the new files (the file
   list is passed to the reader explicitly, so the scan plans exactly
   those splits — no re-listing, no reprocessing).
3. ``commit_files`` — atomically (write-temp + rename) record them.

Process-then-commit gives at-least-once delivery across crashes; pair
with the key-based merge (``operators/merge.py``) for effective
exactly-once into silver/gold — the same contract Structured Streaming's
``foreachBatch`` + MERGE gives (``streaming/events.py:merge_sink``).

At 100 TB the per-run listing is a driver-side metadata operation —
O(files), not O(bytes).  Beyond ~1M files per directory, swap the
listing step for storage inventory or event notifications; the
manifest contract (discover → read → commit) is unchanged.
"""

from __future__ import annotations

import fnmatch
import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

MANIFEST_VERSION = 1


def _load_manifest(manifest_path: str) -> dict:
    if not os.path.exists(manifest_path):
        return {"version": MANIFEST_VERSION, "files": {}}
    with open(manifest_path) as f:
        return json.load(f)


def discover_new_files(
    data_dir: str, manifest_path: str, pattern: str = "*.parquet"
) -> list[str]:
    """Files under ``data_dir`` matching ``pattern`` not yet committed.

    A file is "seen" by path; a changed size for a seen path raises —
    raw-zone files are immutable by contract (appenders must write new
    files, the lakehouse invariant that makes incremental listing
    sound).
    """
    manifest = _load_manifest(manifest_path)
    seen = manifest["files"]
    new: list[str] = []
    for root, _dirs, files in os.walk(data_dir):
        for name in sorted(files):
            if not fnmatch.fnmatch(name, pattern) or name.startswith(("_", ".")):
                continue
            path = os.path.join(root, name)
            size = os.path.getsize(path)
            if path in seen:
                if seen[path]["size"] != size:
                    raise ValueError(
                        f"raw-zone file mutated after commit: {path} "
                        f"(committed size {seen[path]['size']}, now {size})"
                    )
                continue
            new.append(path)
    return sorted(new)


def read_new_files(
    spark: SparkSession,
    files: list[str],
    fmt: str = "parquet",
    schema: StructType | str | None = None,
) -> DataFrame | None:
    """One DataFrame over exactly ``files`` (None when the list is
    empty).  Explicit file lists keep the scan incremental: Spark plans
    splits for these paths only, and parquet footers/JSON schemas of
    already-processed files are never touched again."""
    if not files:
        return None
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "parquet":
        return reader.parquet(*files)
    if fmt == "json":
        return reader.json(*files)
    return reader.format(fmt).load(*files)


def commit_files(manifest_path: str, files: list[str]) -> None:
    """Record ``files`` as processed — atomic via temp-file + rename so
    a crash mid-commit leaves the previous manifest intact (rerun
    reprocesses the batch; merge dedup absorbs it)."""
    manifest = _load_manifest(manifest_path)
    for path in files:
        manifest["files"][path] = {"size": os.path.getsize(path)}
    directory = os.path.dirname(os.path.abspath(manifest_path))
    os.makedirs(directory, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=directory, prefix=".manifest-")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=0, sort_keys=True)
        os.replace(tmp, manifest_path)
    except BaseException:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise


def read_incremental(
    spark: SparkSession,
    data_dir: str,
    manifest_path: str,
    pattern: str = "*.parquet",
    fmt: str = "parquet",
    schema: StructType | str | None = None,
) -> tuple[DataFrame | None, list[str]]:
    """discover + read in one call; caller commits AFTER its write
    succeeds:

        df, batch = read_incremental(spark, raw, manifest)
        if df is not None:
            merge_upsert(df, ...)          # idempotent sink
            commit_files(manifest, batch)  # only now mark processed
    """
    files = discover_new_files(data_dir, manifest_path, pattern)
    return read_new_files(spark, files, fmt=fmt, schema=schema), files
