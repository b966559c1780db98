"""REST API source — NASA NeoWs feed (SURVEY.md §2 A1).

The reference fetches one day per run driver-side (reference
``src/etl/bronze_ingest.py:18-27``) and writes raw JSON to the bronze
zone.  Two modes here:

* ``fetch_feed``: single driver-side GET (parity; fine for 1 request/day).
* ``fetch_feed_distributed``: a date-range backfill fans the URL list
  out to executors via ``mapInPandas`` so N days download in parallel —
  the scale path for historical loads.

The HTTP dependency is import-gated: tests inject ``fetch_fn`` with a
fixture payload instead of hitting the network.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from datetime import date, timedelta

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

NEOWS_URL = "https://api.nasa.gov/neo/rest/v1/feed"


def _default_fetch(url: str, params: dict[str, str]) -> dict:
    try:
        import requests  # noqa: PLC0415 — optional dependency
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "requests not installed; pass fetch_fn= to inject a fetcher"
        ) from exc
    resp = requests.get(url, params=params, timeout=60)
    resp.raise_for_status()
    return resp.json()


def fetch_feed(
    start_date: str,
    end_date: str,
    api_key: str = "DEMO_KEY",
    fetch_fn: Callable[[str, dict], dict] | None = None,
) -> dict:
    """One NeoWs feed document for [start_date, end_date] (max 7 days)."""
    fn = fetch_fn or _default_fetch
    return fn(NEOWS_URL, {"start_date": start_date, "end_date": end_date, "api_key": api_key})


def date_chunks(start: date, end: date, days: int = 7) -> list[tuple[str, str]]:
    """Split [start, end] into NeoWs-sized windows."""
    out = []
    cur = start
    while cur <= end:
        stop = min(cur + timedelta(days=days - 1), end)
        out.append((cur.isoformat(), stop.isoformat()))
        cur = stop + timedelta(days=1)
    return out


def fetch_feed_distributed(
    spark: SparkSession,
    start: date,
    end: date,
    api_key: str = "DEMO_KEY",
    fetch_fn: Callable[[str, dict], dict] | None = None,
) -> DataFrame:
    """Backfill: fan per-window fetches out to executors.

    Returns (start_date, end_date, payload_json string) — one row per
    window, ready to write as JSONL bronze.  fetch_fn must be
    serializable (a module-level function).
    """
    chunks = date_chunks(start, end)
    fn = fetch_fn or _default_fetch
    chunk_df = spark.createDataFrame(chunks, ["start_date", "end_date"]).repartition(
        min(len(chunks), 64)
    )

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                json.dumps(
                    fn(NEOWS_URL, {"start_date": s, "end_date": e, "api_key": api_key})
                )
                for s, e in zip(pdf["start_date"], pdf["end_date"])
            ]
            yield pdf.assign(payload=payloads)

    return chunk_df.mapInPandas(
        fetch_batches, "start_date string, end_date string, payload string"
    )
