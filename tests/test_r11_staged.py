import pytest
"""Pins for the round-11 STAGED query batch (plans/r11_queries.py) —
gate-verified in round 10 behind ``driver_sim --staged``, to be
registered at round-11 start by flipping ``REGISTER_R11``.  These tests
pin the SEMANTICS with synthetic micro-fixtures (not just oracle
agreement); the data_change planner-skip mechanics are pinned in
tests/test_cdf_source.py and the schema-merge mechanics in
tests/test_versioned_table.py.
"""


# Deselected by default (pytest.ini addopts -m 'not slow'): staged r11 lake/replay integrations.
# Run with `pytest -m ""` to include; assertions are unchanged.
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark.lake import VersionedTable
from nasa_asteroid_data_lakehouse_spark.plans import r11_queries as r11


def test_staged_registry_shape():
    assert set(r11.STAGED_QUERIES) == set(r11.STAGED_ORACLES)
    assert len(r11.STAGED_QUERIES) == 10


def _write(df, tmp_path, table):
    out = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
    return out


def _orders(spark, tmp_path, keys):
    df = spark.createDataFrame([(k,) for k in keys], "o_orderkey bigint")
    return _write(df, tmp_path, "orders")


# --- replication across rebucket ---------------------------------------------------


def test_replication_across_rebucket_zero_emission_and_convergence(
    spark, tmp_path
):
    sf = _orders(spark, tmp_path, list(range(40)))
    row = r11.replication_across_rebucket_orders(spark, sf).first()
    assert row["rebucket_emitted"] == 0
    assert row["n_mismatch"] == 0
    # keys 0..39 minus key%7==0 (0,7,14,21,28,35)
    assert row["n_rows"] == 34
    assert row["watermark_advanced"] == 1


def test_replication_across_rebucket_cents_algebra(spark, tmp_path):
    sf = _orders(spark, tmp_path, [1, 5, 11, 22, 35, 55])
    row = r11.replication_across_rebucket_orders(spark, sf).first()
    # 35 deleted (7|35); 11,22,55 get +7; 5 gets +1000; 1 unchanged
    assert row["n_rows"] == 5
    assert row["cents_sum"] == (1) + (5 + 1000) + (11 + 7) + (22 + 7) + (55 + 7)


# --- maintenance CDF census ---------------------------------------------------------


def test_maintenance_census_zero_for_maintenance_slots(spark, tmp_path):
    sf = _orders(spark, tmp_path, list(range(30)))
    rows = {
        (r["slot"], r["operation"]): r["n_rows"]
        for r in r11.maintenance_cdf_skip_orders(spark, sf).collect()
    }
    assert rows[(2, "compact")] == 0
    assert rows[(4, "optimize")] == 0
    assert rows[(5, "rebucket")] == 0
    assert rows[(1, "upsert")] == 6  # key%5: 0,5,10,15,20,25
    assert rows[(3, "delete_deferred")] == 5  # key%7: 0,7,14,21,28


def test_maintenance_census_shape_is_input_independent(spark, tmp_path):
    sf = _orders(spark, tmp_path, [])  # empty: no-op slots still report
    rows = r11.maintenance_cdf_skip_orders(spark, sf).collect()
    assert [r["slot"] for r in rows] == [1, 2, 3, 4, 5, 6]
    assert all(r["n_rows"] == 0 for r in rows)


# --- transactions x deletion vectors ------------------------------------------------


def test_txn_snapshot_pins_dv_state(spark, tmp_path):
    sf = _orders(spark, tmp_path, list(range(30)))
    row = r11.txn_snapshot_across_dv_orders(spark, sf).first()
    assert row["n_fact_txn0"] == 30  # pre-delete pin sees everything
    assert row["n_fact_txn1"] == 20  # key%3 dropped (10 keys)
    # the post-pin key%5 vector is invisible to txn reads, visible at head
    assert row["n_fact_head"] == 16  # of the 20, minus 5,10,20,25


# --- upsert schema merge ------------------------------------------------------------


def test_upsert_schema_merge_widens_and_nulls(spark, tmp_path):
    sf = _orders(spark, tmp_path, list(range(27)))
    row = r11.upsert_schema_merge_orders(spark, sf).first()
    assert row["n_rows"] == 27
    # key%13 (0,13,26) replaced by a cents-less batch -> cents NULL
    assert row["n_cents_null"] == 3
    # flag non-NULL exactly for key%9 (0,9,18) and key%13 (0,13,26)
    assert row["n_flag_null"] == 27 - 5
    # 9%4=1, 18%4=2 (0 is %13's), 0%4+10, 13%4+10, 26%4+10
    assert row["flag_sum"] == 1 + 2 + 10 + 11 + 12


def test_upsert_schema_merge_empty_table_keeps_schema(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"), num_buckets=4)
    t.create(
        spark.createDataFrame([], "k bigint, a string"), keys=["k"]
    )
    t.upsert(spark.createDataFrame([], "k bigint, b bigint"))
    got = t.read()
    assert set(got.columns) == {"k", "a", "b"}  # union, never narrowed


# --- schema evolution mid-subscription ----------------------------------------------


def test_cdf_schema_evolution_subscription_converges(spark, tmp_path):
    sf = _orders(spark, tmp_path, list(range(10)))
    row = r11.cdf_schema_evolution_subscription_orders(spark, sf).first()
    # survivors: key%2==0 (0,2,4,6,8) plus the post-evolution -5
    assert row["n_rows"] == 6
    assert row["n_cents_null"] == 6  # the dropped column nulls out
    assert row["flag_sum"] == (0 + 2 + 1 + 0 + 2) + 9
    assert row["n_mismatch"] == 0


# --- gopher repetition census -------------------------------------------------------


def test_gopher_repetition_buckets(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),  # 2-grams: 5 total, 2 distinct -> frac 3/5
            (2, "x y z w"),  # all distinct -> bucket 0
            (3, "t t t t t"),  # 4 total, 1 distinct -> frac 3/4
            (4, "solo"),  # 1 word: no 2-gram signal, excluded
            (5, None),  # NULL text excluded
        ],
        "doc_id bigint, text string",
    )
    sf = _write(docs, tmp_path, "documents")
    rows = {
        (r["n"], r["bucket"]): (r["n_docs"], r["dup_ngrams"])
        for r in r11.gopher_repetition_documents(spark, sf).collect()
    }
    assert rows[(2, 6)] == (1, 3)  # doc 1: (10*3) DIV 5 = 6
    assert rows[(2, 0)] == (1, 0)  # doc 2
    assert rows[(2, 7)] == (1, 3)  # doc 3: (10*3) DIV 4 = 7
    # 3-grams: doc1 4 total 2 distinct -> bucket 5; doc3 3 total 1 -> 6
    assert rows[(3, 5)] == (1, 2)
    assert rows[(3, 6)] == (1, 2)
    assert (3, 0) in rows  # doc 2 all distinct


def test_gopher_repetition_no_shuffle_before_final_group(spark, sf_dir):
    plan = r11.gopher_repetition_documents(spark, sf_dir)._jdf.queryExecution(
    ).optimizedPlan().toString()
    # one Aggregate pair (partial+final) — the duplicate counting is
    # row-local array arithmetic, never an explode+groupBy per doc
    assert plan.count("Aggregate") <= 2


# --- Lloyd k-means -------------------------------------------------------------------


def test_kmeans_lloyd_members_partition_corpus(spark, sf_dir):
    rows = r11.kmeans_lloyd_embeddings(spark, sf_dir).collect()
    assert [r["cluster"] for r in rows] == list(range(len(rows)))
    assert all(r["n_members"] >= 0 for r in rows)
    assert all(r["sqdist_micro_sum"] >= 0 for r in rows)
    total = sum(r["n_members"] for r in rows)
    from nasa_asteroid_data_lakehouse_spark.catalog import read_table
    from nasa_asteroid_data_lakehouse_spark.llm import similarity

    emb = read_table(spark, sf_dir, "embeddings")
    n_valid = emb.where(similarity.vec_valid(F.col("embedding"))).count()
    assert total == n_valid  # every valid vector lands in exactly one cluster


def test_kmeans_lloyd_empty_input_empty_output(spark, tmp_path):
    emb = spark.createDataFrame(
        [], "vec_id bigint, embedding array<float>, label int"
    )
    sf = _write(emb, tmp_path, "embeddings")
    assert r11.kmeans_lloyd_embeddings(spark, sf).count() == 0


def test_kmeans_lloyd_iterates_away_from_seeds(spark, tmp_path):
    # two tight groups; seeds are the 8 lowest ids but k-means must
    # converge members onto the two real groups' centroids: every
    # vector's final sqdist is tiny (well under the seed-distance
    # scale), proving the centroid UPDATE actually ran
    rows = [
        (i, [float(10 + (i % 4)) / 100.0, 0.5], 0) for i in range(12)
    ] + [(100 + i, [0.9, float(i % 3) / 100.0], 1) for i in range(12)]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    sf = _write(emb, tmp_path, "embeddings")
    out = r11.kmeans_lloyd_embeddings(spark, sf).collect()
    assert sum(r["n_members"] for r in out) == 24


# --- sliding-window streaming replay --------------------------------------------


def test_sliding_window_emission_boundary(spark, tmp_path):
    """Append mode emits a window iff its END <= the final watermark
    (non-strict — the empirical pin behind the oracle's comparison):
    with max ts exactly on a window end, that window emits and every
    window containing the max-ts event is suppressed."""
    ev = spark.createDataFrame(
        [
            (1, "a", "2024-01-01 00:15:00", 10),
            (2, "a", "2024-01-01 02:00:00", 20),
        ],
        "event_id bigint, event_type string, ts string, user_id bigint",
    ).select("event_id", "event_type", F.col("ts").cast("timestamp_ntz").alias("ts"), "user_id")
    sf = _write(ev, tmp_path, "events")
    rows = r11.streaming_sliding_window_replay_events(spark, sf).collect()
    starts = sorted(str(r["window_start"]) for r in rows)
    # four windows cover 00:15; only those ending <= 02:00 emit
    assert starts == [
        "2023-12-31 22:30:00",
        "2023-12-31 23:00:00",
        "2023-12-31 23:30:00",
        "2024-01-01 00:00:00",
    ]
    assert all(r["n_events"] == 1 and r["user_sum"] == 10 for r in rows)


def test_sliding_window_every_event_in_four_windows(spark, tmp_path):
    ev = spark.createDataFrame(
        [(i, "x", f"2024-01-01 0{h}:10:00", 1) for i, h in enumerate([1, 2, 3])]
        + [(99, "x", "2024-01-02 00:00:00", 0)],  # advances the watermark
        "event_id bigint, event_type string, ts string, user_id bigint",
    ).select("event_id", "event_type", F.col("ts").cast("timestamp_ntz").alias("ts"), "user_id")
    sf = _write(ev, tmp_path, "events")
    rows = r11.streaming_sliding_window_replay_events(spark, sf).collect()
    # 3 closed events x 4 overlapping windows each = 12 contributions
    assert sum(r["n_events"] for r in rows) == 12


# --- vacuum boundary / clone bootstrap ---------------------------------------------


def test_cdf_vacuum_boundary_refuses_and_answers(spark, tmp_path):
    sf = _orders(spark, tmp_path, list(range(30)))
    row = r11.cdf_vacuum_boundary_orders(spark, sf).first()
    assert row["truncated_raises"] == 1  # fail-closed past the vacuum
    # surviving window (v2 -> v3): key%11 and not key%7 -> 11, 22
    assert row["n_feed_rows"] == 2
    assert row["n_updates"] == 2 and row["n_inserts"] == 0


def test_clone_bootstrap_replication_converges(spark, tmp_path):
    sf = _orders(spark, tmp_path, list(range(40)))
    row = r11.clone_bootstrap_replication_orders(spark, sf).first()
    assert row["bootstrap_commits"] == 1  # clone = one manifest write
    assert row["n_mismatch"] == 0
    assert row["n_rows"] == 34  # minus key%7 (0,7,14,21,28,35)
    assert row["watermark_advanced"] == 1
