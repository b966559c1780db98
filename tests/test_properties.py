"""Property-based tests (hypothesis) for operator invariants.

Spark round-trips are slow, so examples are capped; the properties are
the point: merge idempotency/key-uniqueness, normalization idempotency,
dedup determinism under row order, minhash containment in signature
space.
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark import operators as ops
from nasa_asteroid_data_lakehouse_spark.llm import dedup as ldedup

KEYS = st.integers(min_value=0, max_value=5)
VALS = st.text(
    alphabet="abc NULL", min_size=0, max_size=8
)

ROWS = st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=12)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


def _df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "v"]).astype({"k": "int64", "v": "string"})
    return spark.createDataFrame(pdf, schema="k long, v string")


@given(old=ROWS, new=ROWS)
@SLOW
def test_merge_key_unique_and_incoming_wins(sp, old, new):
    old_df, new_df = _df(sp, old), _df(sp, new)
    merged = ops.merge_dataframes(old_df, new_df, ["k"], order_by=["v"]).collect()
    ks = [r["k"] for r in merged]
    # one row per key
    assert len(ks) == len(set(ks))
    # every key from either side survives
    assert set(ks) == {k for k, _ in old} | {k for k, _ in new}
    # incoming wins: any key present in new maps to a new-side value
    new_by_key = {}
    for k, v in new:
        new_by_key.setdefault(k, set()).add(v)
    for r in merged:
        if r["k"] in new_by_key:
            assert r["v"] in new_by_key[r["k"]]


@given(rows=ROWS)
@SLOW
def test_normalize_idempotent(sp, rows):
    df = _df(sp, rows)
    once = ops.normalize_placeholders(df)
    twice = ops.normalize_placeholders(once)
    key = lambda t: tuple(map(repr, t))
    assert sorted(map(tuple, once.collect()), key=key) == sorted(map(tuple, twice.collect()), key=key)


@given(rows=ROWS)
@SLOW
def test_dedup_deterministic_order_invariant(sp, rows):
    df = _df(sp, rows)
    shuffled = df.orderBy(F.rand(seed=7))
    key = lambda t: tuple(map(repr, t))
    a = sorted(map(tuple, ops.dedup_deterministic(df, ["k"], ["v"]).collect()), key=key)
    b = sorted(map(tuple, ops.dedup_deterministic(shuffled, ["k"], ["v"]).collect()), key=key)
    assert a == b


TEXTS = st.lists(
    st.text(alphabet="ab cd", min_size=1, max_size=30).filter(str.strip),
    min_size=1,
    max_size=6,
)


@given(texts=TEXTS)
@SLOW
def test_minhash_identical_texts_identical_signatures(sp, texts):
    rows = [(i, t) for i, t in enumerate(texts)] + [
        (100 + i, t) for i, t in enumerate(texts)  # duplicate content, new ids
    ]
    df = sp.createDataFrame(rows, ["doc_id", "text"])
    sigs = {
        r["doc_id"]: tuple(r["minhash"])
        for r in ldedup.with_minhash_signature(df, num_hashes=4).collect()
    }
    for i in range(len(texts)):
        assert sigs[i] == sigs[100 + i]


WORDS = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
    min_size=1,
    max_size=10,
)
DOCSETS = st.lists(WORDS, min_size=2, max_size=8)


@given(docsets=DOCSETS)
@SLOW
def test_lsh_pairs_subset_of_exact_jaccard(sp, docsets):
    """Soundness of LSH candidate generation: every (id_a, id_b,
    jaccard) the banded-MinHash pipeline emits must appear in the
    brute-force n-gram Jaccard pairs with the SAME score (LSH may miss
    pairs — that's recall — but must never invent or mis-score one)."""
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docsets)]
    df = sp.createDataFrame(rows, ["doc_id", "text"])
    lsh = ldedup.lsh_near_dup_pairs(
        df, "doc_id", num_hashes=8, bands=4, shingle_k=2, jaccard_threshold=0.1
    ).collect()
    exact = ldedup.ngram_jaccard_pairs(df, "doc_id", shingle_k=2, threshold=1e-9).collect()
    exact_scores = {(r["id_a"], r["id_b"]): r["jaccard"] for r in exact}
    for r in lsh:
        key = (r["id_a"], r["id_b"])
        assert key in exact_scores, f"LSH invented pair {key}"
        assert r["jaccard"] == pytest.approx(exact_scores[key], abs=1e-9)


EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # key
        st.integers(min_value=0, max_value=50),  # ts (int seconds)
        st.sampled_from(["a", "b", "c"]),        # attr
    ),
    min_size=0,
    max_size=20,
)


@given(rows=EVENTS)
@SLOW
def test_scd2_tiles_the_timeline(sp, rows):
    """SCD2 invariants for any observation stream: per key, intervals
    are ordered and contiguous (valid_to == next valid_from), exactly
    one open interval, versions are 1..n, adjacent runs differ in
    attribute, and interval count == run count of the (ts, seq)-sorted
    attribute sequence."""
    import itertools

    pdf = pd.DataFrame(rows, columns=["k", "t", "attr"])
    pdf["seq"] = range(len(pdf))  # unique tiebreak like event_id
    df = sp.createDataFrame(pdf, schema="k long, t long, attr string, seq long")
    hist = (
        ops.scd2_compress(df, ["k"], "attr", "t", tiebreak=["seq"])
        .orderBy("k", "version")
        .collect()
    )

    by_key = {}
    for r in hist:
        by_key.setdefault(r["k"], []).append(r)
    # expected run counts from a plain python reference
    expected_runs = {}
    for k, grp in pdf.sort_values(["k", "t", "seq"]).groupby("k"):
        expected_runs[int(k)] = len(
            [1 for _, _g in itertools.groupby(grp["attr"])]
        )
    assert {k: len(v) for k, v in by_key.items()} == expected_runs

    for k, ivs in by_key.items():
        assert [r["version"] for r in ivs] == list(range(1, len(ivs) + 1))
        assert sum(1 for r in ivs if r["is_current"]) == 1
        assert ivs[-1]["is_current"] and ivs[-1]["valid_to"] is None
        for cur, nxt in zip(ivs, ivs[1:]):
            assert cur["valid_to"] == nxt["valid_from"]  # contiguous
            assert cur["attr"] != nxt["attr"]


ASOF_LEFT = st.lists(
    st.tuples(KEYS, st.integers(min_value=0, max_value=1000)),
    min_size=0,
    max_size=12,
)
ASOF_RIGHT = st.lists(
    st.tuples(
        KEYS,
        st.integers(min_value=0, max_value=1000),
        st.integers(min_value=0, max_value=99),
    ),
    min_size=0,
    max_size=12,
    unique_by=lambda t: (t[0], t[1]),  # no (key, ts) dupes: tie
    # semantics differ between engine (max carried value) and
    # pandas merge_asof (positionally last) — out of contract here
)


@given(left=ASOF_LEFT, right=ASOF_RIGHT)
@SLOW
def test_asof_join_matches_pandas_merge_asof(sp, left, right):
    """Backward as-of join == pandas.merge_asof on unique (key, ts)
    right sides (the reference semantics: latest right at-or-before
    each left row, per key; NULL-free keys here — NULL-key behavior is
    pinned by the adversarial gate instead)."""
    from nasa_asteroid_data_lakehouse_spark.operators.temporal import asof_join

    lpdf = pd.DataFrame(left, columns=["k", "ts"]).astype("int64")
    rpdf = pd.DataFrame(right, columns=["k", "ts", "rv"]).astype("int64")
    ldf = sp.createDataFrame(lpdf, schema="k long, ts long")
    rdf = sp.createDataFrame(rpdf, schema="k long, ts long, rv long")

    got = (
        asof_join(ldf, rdf, ["k"], "ts", "ts")
        .select("k", "ts", "rv_right")
        .toPandas()
        .sort_values(["k", "ts", "rv_right"])
        .reset_index(drop=True)
    )

    expected = pd.merge_asof(
        lpdf.sort_values("ts", kind="mergesort"),
        rpdf.sort_values("ts", kind="mergesort"),
        on="ts",
        by="k",
        direction="backward",
    )[["k", "ts", "rv"]].rename(columns={"rv": "rv_right"})
    expected = expected.sort_values(["k", "ts", "rv_right"]).reset_index(drop=True)

    assert len(got) == len(expected)
    for col in ("k", "ts"):
        assert got[col].tolist() == expected[col].tolist()
    ga, ea = got["rv_right"].fillna(-1).tolist(), expected["rv_right"].fillna(-1).tolist()
    assert ga == ea


# --- longest_common_spans vs brute-force word-level LCS -----------------------

WORDS = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
DOCPAIR = st.tuples(
    st.lists(WORDS, min_size=1, max_size=14),
    st.lists(WORDS, min_size=1, max_size=14),
)


def _lcs_words(xs: list, ys: list) -> int:
    """O(n*m) longest common contiguous subsequence length in words."""
    best = 0
    for i in range(len(xs)):
        for j in range(len(ys)):
            length = 0
            while (
                i + length < len(xs)
                and j + length < len(ys)
                and xs[i + length] == ys[j + length]
            ):
                length += 1
            best = max(best, length)
    return best


@SLOW
@given(pair=DOCPAIR)
def test_longest_common_span_equals_bruteforce_lcs(sp, pair):
    from nasa_asteroid_data_lakehouse_spark.llm import dedup

    xs, ys = pair
    k, min_span = 3, 4
    docs = sp.createDataFrame(
        [(1, " ".join(xs)), (2, " ".join(ys))], ["doc_id", "text"]
    )
    rows = dedup.longest_common_spans(
        docs, "doc_id", shingle_k=k, min_span_words=min_span
    ).collect()
    truth = _lcs_words(xs, ys)
    if truth >= min_span:
        assert len(rows) == 1
        assert rows[0]["span_words"] == truth
    else:
        # below threshold (or shorter than a full k-gram run) -> no row
        assert rows == []


# --- round-2 curation properties ---------------------------------------------

VEC = st.lists(
    st.floats(min_value=-2.0, max_value=2.0, allow_nan=False, width=32),
    min_size=4,
    max_size=8,
)


@given(vecs=st.lists(VEC, min_size=1, max_size=6))
@SLOW
def test_quantization_error_within_half_step(sp, vecs):
    from nasa_asteroid_data_lakehouse_spark.llm import similarity as sim

    dim = min(len(v) for v in vecs)
    rows = [(i, [float(x) for x in v[:dim]]) for i, v in enumerate(vecs)]
    df = sp.createDataFrame(rows, "vec_id long, embedding array<float>")
    for r in sim.quantize_embeddings(df).collect():
        # |v - code/scale| <= 0.5/scale by construction of the
        # half-up lattice snap (strict except float rounding slack)
        assert r["max_abs_err"] <= 0.5 / r["scale"] + 1e-9
        assert abs(r["code_sum"]) <= 127 * dim
        assert 0 <= r["n_sat"] <= dim


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=5),
    n_target=st.integers(min_value=1, max_value=60),
)
@SLOW
def test_temperature_mixture_quota_invariants(sp, sizes, n_target):
    from nasa_asteroid_data_lakehouse_spark.llm import curation

    rows = [
        (src * 1000 + i, f"s{src}")
        for src, n in enumerate(sizes)
        for i in range(n)
    ]
    df = sp.createDataFrame(rows, "doc_id long, source string")
    out = curation.temperature_mixture(df, n_target=n_target).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # mirror the integer quota arithmetic exactly: weight on the
    # sqrt lattice, floor division, size cap (no reallocation of a
    # size-capped source's unused quota — documented behavior)
    import math

    weights = {f"s{i}": math.floor(math.sqrt(n) * 1000) for i, n in enumerate(sizes)}
    total_w = sum(weights.values())
    for i, n in enumerate(sizes):
        src = f"s{i}"
        expected = min(n, (n_target * weights[src]) // total_w)
        assert len(by_src.get(src, [])) == expected
    assert len(out) <= n_target


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 30), st.sampled_from(["a", "b", "c"])),
        min_size=0,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
    cap=st.integers(min_value=1, max_value=6),
)
@SLOW
def test_domain_cap_never_exceeds_cap(sp, rows, cap):
    from nasa_asteroid_data_lakehouse_spark.llm import curation

    if not rows:
        return
    df = sp.createDataFrame(rows, "doc_id long, source string")
    out = curation.domain_cap(df, cap=cap).collect()
    per = {}
    for r in out:
        per[r["source"]] = per.get(r["source"], 0) + 1
    for src, n in per.items():
        assert n <= cap
    # every domain with any rows contributes min(cap, its size)
    have = {}
    for _, s in rows:
        have[s] = have.get(s, 0) + 1
    for s, n in have.items():
        assert per.get(s, 0) == min(cap, n)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=0,
        max_size=16,
    )
)
@SLOW
def test_triangle_counts_match_bruteforce(sp, edges):
    from itertools import combinations

    from nasa_asteroid_data_lakehouse_spark.operators.graph import triangle_counts

    undirected = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    if not undirected:
        return
    df = sp.createDataFrame(list(undirected), "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    nodes = {n for e in undirected for n in e}
    expect = {}
    for a, b, c in combinations(sorted(nodes), 3):
        if (
            (a, b) in undirected
            and (b, c) in undirected
            and (a, c) in undirected
        ):
            for n in (a, b, c):
                expect[n] = expect.get(n, 0) + 1
    assert got == expect


NUMS = st.lists(
    st.one_of(
        st.none(),
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
    ),
    min_size=0,
    max_size=40,
)


@given(vals=NUMS)
@SLOW
def test_equidepth_partitions_nonnull_rows_exactly(sp, vals):
    """Invariants under arbitrary (nullable) inputs: bucket counts sum
    to the non-null row count, buckets are contiguous [lo, hi] ranges
    in order, and NULLs never appear (round-3 fix)."""
    from nasa_asteroid_data_lakehouse_spark.operators.stats import (
        equidepth_histogram,
    )

    pdf = pd.DataFrame({"v": pd.Series(vals, dtype="float64")})
    df = sp.createDataFrame(pdf, schema="v double")
    got = equidepth_histogram(df, "v", buckets=4).toPandas()
    n_nonnull = int(pdf["v"].notna().sum())
    assert int(got["n"].sum()) == n_nonnull
    ordered = got.sort_values("bucket")
    his = ordered["hi"].tolist()
    los = ordered["lo"].tolist()
    for i in range(1, len(his)):
        assert his[i - 1] <= los[i] + 1e-9


@given(vals=st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
    min_size=1, max_size=30,
))
@SLOW
def test_winsorize_bounds_and_clipping(sp, vals):
    """winsorize: output stays within [lo, hi], rows already inside the
    band pass through unchanged, and row count is preserved."""
    from nasa_asteroid_data_lakehouse_spark.operators.robust import winsorize

    pdf = pd.DataFrame({"g": ["a"] * len(vals), "v": vals})
    df = sp.createDataFrame(pdf, schema="g string, v double")
    out = winsorize(df, "v", ["g"], 0.1, 0.9, exact=True).toPandas()
    assert len(out) == len(vals)
    assert (out["v_winsorized"] >= out["v_lo"] - 1e-9).all()
    assert (out["v_winsorized"] <= out["v_hi"] + 1e-9).all()
    inside = out[(out["v"] >= out["v_lo"]) & (out["v"] <= out["v_hi"])]
    assert (inside["v_winsorized"] == inside["v"]).all()
