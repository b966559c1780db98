"""DuckDB-oracle differential check, mirroring the driver harness:
row count + column names + order-insensitive value comparison.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from nasa_asteroid_data_lakehouse_spark.catalog import TESTDATA_TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_matches_oracle(spark_df, sql: str, sf_dir: str, rel_tol: float = 1e-9):
    """Assert a Spark result matches the DuckDB oracle result."""
    actual = _normalize(spark_df.toPandas())
    con = duckdb_con(sf_dir)
    expected = _normalize(con.execute(sql).df())
    con.close()

    assert list(actual.columns) == list(expected.columns), (
        f"columns differ: spark={list(actual.columns)} duckdb={list(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"row counts differ: spark={len(actual)} duckdb={len(expected)}"
    )
    for c in actual.columns:
        a, e = actual[c], expected[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(e):
            for i, (x, y) in enumerate(zip(a, e)):
                xa = float("nan") if pd.isna(x) else float(x)
                ya = float("nan") if pd.isna(y) else float(y)
                if math.isnan(xa) and math.isnan(ya):
                    continue
                assert math.isclose(xa, ya, rel_tol=rel_tol, abs_tol=1e-9), (
                    f"col {c} row {i}: spark={x} duckdb={y}"
                )
        else:
            mismatched = (a.astype(str) != e.astype(str))
            assert not mismatched.any(), (
                f"col {c}: first mismatch at row {mismatched.idxmax()}: "
                f"spark={a[mismatched.idxmax()]} duckdb={e[mismatched.idxmax()]}"
            )
