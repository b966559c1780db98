"""Unit tests for range join, as-of join, and sequence packing."""

import datetime

import pytest
from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark.llm.packing import pack_documents
from nasa_asteroid_data_lakehouse_spark.operators.temporal import asof_join, range_join

T0 = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes):
    return T0 + datetime.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            (1, _ts(0), 100.0),
            (1, _ts(10), 101.0),
            (1, _ts(30), 99.0),
            (2, _ts(5), 50.0),
        ],
        ["sym", "q_ts", "price"],
    )
    trades = spark.createDataFrame(
        [
            (1, _ts(12), 5),   # last quote before: 101.0 @ t+10
            (1, _ts(10), 7),   # exactly at quote time -> 101.0 (at-or-before)
            (1, _ts(-5), 9),   # before any quote -> null
            (2, _ts(60), 2),   # -> 50.0
        ],
        ["sym", "t_ts", "qty"],
    )
    return quotes, trades


def test_asof_backward(quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, ["sym"], "t_ts", "q_ts", direction="backward")
    rows = {(r["sym"], r["qty"]): r for r in out.collect()}
    assert rows[(1, 5)]["price_right"] == 101.0
    assert rows[(1, 7)]["price_right"] == 101.0
    assert rows[(1, 9)]["price_right"] is None
    assert rows[(2, 2)]["price_right"] == 50.0
    assert out.count() == trades.count()  # one row per left row, always


def test_asof_forward(quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, ["sym"], "t_ts", "q_ts", direction="forward")
    rows = {(r["sym"], r["qty"]): r for r in out.collect()}
    assert rows[(1, 9)]["price_right"] == 100.0  # next quote at t0
    assert rows[(1, 7)]["price_right"] == 101.0  # at-or-after includes t+10
    assert rows[(2, 2)]["price_right"] is None   # no later quote


def test_range_join(quotes_trades):
    quotes, trades = quotes_trades
    out = range_join(
        quotes, trades, ["sym"], "q_ts", "t_ts", lower="0 seconds", upper="15 minutes"
    )
    pairs = {(r["price"], r["qty"]) for r in out.collect()}
    # quote@0 pairs with trades at +12 and +10; quote@10 pairs with +12, +10
    assert (100.0, 5) in pairs and (100.0, 7) in pairs
    assert (101.0, 5) in pairs and (101.0, 7) in pairs
    # trade before the quote is never paired
    assert not any(q == 9 for _, q in pairs)


def test_pack_documents(spark):
    docs = spark.createDataFrame(
        [
            (1, "w " * 100),   # 100 tokens
            (2, "w " * 100),
            (3, "w " * 100),   # cumulative 300 > budget 256 -> new pack
            (4, "w " * 400),   # oversized -> own pack
            (5, "w"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in pack_documents(docs, budget=256).collect()}
    assert out[1]["pack_id"] == 0 and out[1]["pack_offset"] == 0
    assert out[2]["pack_id"] == 0 and out[2]["pack_offset"] == 100
    assert out[3]["pack_id"] == 0 and out[3]["pack_offset"] == 200
    assert out[4]["pack_id"] == 1  # starts at cum 300 -> bin 1
    assert out[5]["pack_id"] == 2  # after the 400-token doc
    # cumulative bookkeeping is exact
    assert out[5]["cum_tokens"] == 701


def test_pack_documents_partitioned(spark):
    docs = spark.createDataFrame(
        [("a", 1, "w " * 10), ("a", 2, "w " * 10), ("b", 3, "w " * 10)],
        ["lang", "doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in pack_documents(docs, budget=15, partition_cols=["lang"]).collect()}
    assert out[1]["pack_id"] == 0
    assert out[2]["pack_id"] == 0 and out[2]["pack_offset"] == 10
    assert out[3]["pack_id"] == 0 and out[3]["pack_offset"] == 0  # fresh per lang
