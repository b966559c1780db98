"""Smoke + oracle tests for the driver contract in __spark_entry__.py."""

import importlib.util
import os

import pytest

from tests.oracle import assert_matches_oracle

_spec = importlib.util.spec_from_file_location(
    "__spark_entry__",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"),
)
spark_entry = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(spark_entry)


def test_entry_smoke(spark):
    df = spark_entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_every_query_has_oracle_or_is_declared():
    qs = spark_entry.queries()
    oracles = spark_entry.oracle_sql()
    assert set(oracles) <= set(qs)


@pytest.mark.parametrize("name", list(spark_entry.oracle_sql()))
def test_query_matches_oracle(spark, sf_dir, name):
    fn = spark_entry.queries()[name]
    sql = spark_entry.oracle_sql()[name]
    assert_matches_oracle(fn(spark, sf_dir), sql, sf_dir)


def test_entry_twice_same_session(spark):
    a = spark_entry.entry(spark).collect()
    b = spark_entry.entry(spark).collect()
    assert a == b


def test_queries_fail_cleanly_on_missing_sf_dir(spark):
    from pyspark.errors import AnalysisException

    fn = spark_entry.queries()["q1_pricing_summary"]
    with pytest.raises(AnalysisException):
        fn(spark, "/root/testdata/does-not-exist").collect()
