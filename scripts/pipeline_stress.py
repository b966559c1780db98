#!/usr/bin/env python
"""End-to-end showcase-pipeline stress: D daily runs of
bronze -> silver flatten -> gold merge at ~1000x the reference's daily
volume (the real feed carries tens of NEOs/day; this generates
``--neos`` per day).  Prints one JSON line with per-day timings and
final gold row counts.

What it demonstrates / measures:
* the double-explode flatten and typed normalization at volume;
* merge-upsert growth: each day's gold upsert rewrites the table
  (union+dedup+staged overwrite), so per-day cost grows with table
  size — the documented O(table) plain-parquet limitation whose scale
  path is lake/table.VersionedTable (O(changed buckets)).

Usage: python scripts/pipeline_stress.py [days] [neos_per_day]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from nasa_asteroid_data_lakehouse_spark.session import get_spark  # noqa: E402
from nasa_asteroid_data_lakehouse_spark.pipeline.runner import run_pipeline  # noqa: E402
from fixtures_neows import _approach, _neo  # noqa: E402


def synth_document(day: str, n_neos: int) -> dict:
    neos = []
    for i in range(n_neos):
        neo_id = f"{3_000_000 + i}"
        approaches = [
            _approach(
                day,
                f"{day[:4]}-Jan-{day[8:]} {i % 24:02d}:{i % 60:02d}",
                1700000000000 + i,
            )
        ]
        if i % 7 == 0:  # fan-out: some NEOs approach twice in a day
            approaches.append(
                _approach(day, f"{day[:4]}-Jan-{day[8:]} 23:59", 1700000099000 + i)
            )
        neos.append(
            _neo(neo_id, f"({2000 + i} SYN{i})", 20.0 + (i % 80) / 10.0, i % 5 == 0, approaches)
        )
    return {
        "element_count": len(neos),
        "near_earth_objects": {day: neos},
    }


def main() -> None:
    days = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    neos = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    spark = get_spark(app_name="pipeline-stress")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="ndl_pipeline_stress_")
    per_day = []
    try:
        for d in range(1, days + 1):
            day = f"2026-01-{d:02d}"
            doc = synth_document(day, neos)
            t0 = time.perf_counter()
            tables = run_pipeline(spark, root, day, doc)
            per_day.append(round(time.perf_counter() - t0, 2))
        counts = {
            name: spark.read.parquet(path).count()
            for name, path in sorted(tables.items())
        }
        print(
            json.dumps(
                {
                    "metric": "pipeline_stress",
                    "days": days,
                    "neos_per_day": neos,
                    "per_day_sec": per_day,
                    "total_sec": round(sum(per_day), 2),
                    "gold_counts": counts,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
