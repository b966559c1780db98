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


def test_rotate_serves_pinned_head_first(monkeypatch):
    full = {f"q{i}": i for i in range(8)}
    monkeypatch.setattr(spark_entry, "_driver_history", lambda: (["q5"], ["q0", "q1"]))
    monkeypatch.setattr(spark_entry, "_rotation_state", lambda: (["q3", "q2"], []))
    order = list(spark_entry._rotate(full))
    # pinned head verbatim, then red, then never-seen, greens last
    assert order[:2] == ["q3", "q2"]
    assert order[2] == "q5"
    assert set(order[-2:]) == {"q0", "q1"}


def test_rotate_consumes_all_green_pin(monkeypatch):
    """VERDICT r02 ask #2: a stale pin whose names are ALL driver-green
    must not be re-served — fall through to red -> never-seen order."""
    full = {f"q{i}": i for i in range(8)}
    monkeypatch.setattr(
        spark_entry, "_driver_history", lambda: (["q6"], ["q2", "q3", "q0"])
    )
    monkeypatch.setattr(spark_entry, "_rotation_state", lambda: (["q3", "q2"], []))
    order = list(spark_entry._rotate(full))
    assert order[0] == "q6"  # red fix first, not the consumed pin
    never_seen = {"q1", "q4", "q5", "q7"}
    assert set(order[1:5]) == never_seen
    # consumed pin names demoted behind never-seen, greens last
    assert set(order[5:]) == {"q0", "q2", "q3"}


def test_rotate_drops_green_members_from_pin(monkeypatch):
    """A pin's already-green members drop out individually; its red and
    never-checked members keep the front — a partially-consumed pin no
    longer wastes driver slots re-proving greens."""
    full = {f"q{i}": i for i in range(4)}
    monkeypatch.setattr(spark_entry, "_driver_history", lambda: ([], ["q1"]))
    monkeypatch.setattr(spark_entry, "_rotation_state", lambda: (["q1", "q2"], []))
    order = list(spark_entry._rotate(full))
    # q2 (never checked) stays pinned first; green q1 demotes to last
    assert order[0] == "q2"
    assert order[-1] == "q1"
    assert set(order[1:3]) == {"q0", "q3"}
