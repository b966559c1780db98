#!/usr/bin/env python
"""Snapshot .explain('formatted') of named queries into plans/<dir>/.

    python scripts/plan_snapshot.py before name1,name2,... [--dir plans/r11]

Writes plans/<dir>/<name>_<suffix>.txt per query.  For replay-style
queries (streaming / lakehouse round-trips) the returned DataFrame is
the final read-back aggregate — the interesting machinery runs inside
the query body — so the snapshot is the optimizer-visible tail; the
OPTIMIZATION notes carry the timing evidence for those.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from nasa_asteroid_data_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("suffix")
    ap.add_argument("names")
    ap.add_argument("--dir", default="plans/r11")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark(app_name="plan-snapshot", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out_dir = os.path.join(REPO, args.dir)
    os.makedirs(out_dir, exist_ok=True)
    for name in [n.strip() for n in args.names.split(",") if n.strip()]:
        buf = io.StringIO()
        try:
            with redirect_stdout(buf):
                qs[name](spark, args.sf).explain("formatted")
            plan = buf.getvalue()
        except Exception as ex:  # diagnostic path
            plan = f"EXPLAIN FAILED: {ex}\n"
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(path)
    spark.stop()


if __name__ == "__main__":
    main()
