"""Round-5 contracts.

ADVICE r04 medium: a missing/invalid probe vector (vec_id 0 absent, or
its embedding NULL/NaN) must make the probe queries EMPTY — matching
the DuckDB oracles, whose ``q`` CTE filters by the same validity
predicate and therefore yields zero rows.  The old zero-vector
fallback instead produced k rows of NULL cosine_sim.
"""

from __future__ import annotations

import pytest

import nasa_asteroid_data_lakehouse_spark.plans.curation_queries as cq
import nasa_asteroid_data_lakehouse_spark.plans.llm_queries as lq


def _write_fixture(spark, tmp_path, probe_embedding):
    """documents + embeddings dir where vec_id 0's vector is
    ``probe_embedding`` (None → NULL; 'absent' → no row 0 at all)."""
    rows = [
        (i, [float((i * 13) % 7) + 0.5, float((i * 5) % 11), 1.0])
        for i in range(1, 30)
    ]
    if probe_embedding != "absent":
        rows = [(0, probe_embedding)] + rows
    embs = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    docs = spark.createDataFrame(
        [(i, f"window merge query join text {i}") for i in range(30)],
        "doc_id bigint, text string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    embs.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


@pytest.mark.parametrize(
    "probe", [None, [float("nan"), 1.0, 1.0], "absent"], ids=["null", "nan", "absent"]
)
def test_lsh_ivf_topk_empty_on_invalid_probe(spark, tmp_path, probe):
    sf = _write_fixture(spark, tmp_path, probe)
    lsh = lq.lsh_topk_embeddings(spark, sf)
    assert lsh.count() == 0
    assert lsh.columns == ["vec_id", "bucket", "cosine_sim"]
    ivf = lq.ivf_topk_embeddings(spark, sf)
    assert ivf.count() == 0
    assert ivf.columns == ["vec_id", "cluster", "cosine_sim"]


def test_hybrid_ranks_on_bm25_alone_when_probe_invalid(spark, tmp_path):
    sf = _write_fixture(spark, tmp_path, [float("nan"), 1.0, 1.0])
    rows = cq.hybrid_retrieval_documents(spark, sf).collect()
    assert rows  # BM25 side still ranks
    assert all(r["r_cos"] is None for r in rows)
    assert all(r["r_bm25"] is not None for r in rows)


def test_valid_probe_unchanged(spark, tmp_path):
    sf = _write_fixture(spark, tmp_path, [1.0, 2.0, 3.0])
    assert lq.lsh_topk_embeddings(spark, sf).count() > 0
    assert lq.ivf_topk_embeddings(spark, sf).count() > 0


def test_recall_denominator_caps_at_n_exact(spark, tmp_path):
    """ADVICE r04 low: recall@k divides by least(k, n_exact) so a
    perfect index on a corpus smaller than k reports 1.0, not
    n_exact/k.  Fixture: 5 valid vectors (n_exact = 4 < k = 10)."""
    from nasa_asteroid_data_lakehouse_spark.llm import similarity

    embs = spark.createDataFrame(
        [(i, [1.0 + i, 2.0, 3.0]) for i in range(5)],
        "vec_id bigint, embedding array<float>",
    )
    out = similarity.ann_recall_lsh(
        embs, anchor_max_id=1, k=10, num_planes=4, probe_hamming=4
    ).collect()
    assert len(out) == 1
    assert out[0]["n_exact"] == 4
    # probe_hamming=4 over 4 planes probes every bucket ⇒ perfect index
    assert out[0]["recall_at_k"] == 1.0
