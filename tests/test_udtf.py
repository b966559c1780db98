"""Python UDTF surface check (SURVEY.md §2.J: the reference registers
no UDFs of any kind; this repo keeps hot paths UDF-free but the
engine must still OFFER the full UDF/pandas-UDF/UDTF triad).

The UDTF here is deliberately reproducible with built-ins
(posexplode + split), and the test pins the two paths equal — the
point is API coverage plus a reminder that the native form is the
production path (UDTFs run row-at-a-time in Python workers).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import lit, udtf

from nasa_asteroid_data_lakehouse_spark.catalog import read_table


def test_udtf_matches_native_explode(spark, sf_smoke):
    @udtf(returnType="idx: int, token: string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            n = 0
            for tok in text.split(" "):
                if tok:  # index counts emitted tokens, like the
                    yield n, tok  # filtered-array posexplode below
                    n += 1

    docs = read_table(spark, sf_smoke, "documents").select("doc_id", "text").limit(50)
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("tokenize", Tokenize)

    via_udtf = spark.sql(
        """
        SELECT d.doc_id, t.idx, t.token
        FROM udtf_docs d, LATERAL tokenize(d.doc_id, d.text) t
        """
    )
    native = docs.select(
        "doc_id",
        F.posexplode(F.filter(F.split("text", " "), lambda x: x != lit(""))).alias(
            "idx", "token"
        ),
    )
    a = {(r["doc_id"], r["idx"], r["token"]) for r in via_udtf.collect()}
    b = {(r["doc_id"], r["idx"], r["token"]) for r in native.collect()}
    assert a == b and a
