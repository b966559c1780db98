"""Sequence packing: assign documents to fixed-token-budget training
bins (the concat-and-chunk packing every LLM data pipeline runs before
tokenized shards are written).

Contiguous greedy packing in a deterministic document order: bin id =
how many full budgets precede the document's cumulative token count.
One window over the ordering key — no shuffle beyond the ordering
partition.  At 100 TB, run per shard/partition key (pass
``partition_cols``) so the window never sees a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nasa_asteroid_data_lakehouse_spark.llm.text import token_count, tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into overlapping fixed-token windows
    (context-window chunking: ``chunk_size`` tokens every ``stride``
    tokens, so consecutive chunks overlap by ``chunk_size - stride``).

    Pure array algebra + ``posexplode`` — a narrow per-row transform
    with no shuffle and no UDF, so it fans out linearly at 100 TB.
    The trailing chunk keeps whatever tokens remain (shorter than
    ``chunk_size``); oversized-doc handling for :func:`pack_documents`
    is exactly this split.  Blank documents produce no chunks.
    """
    if stride <= 0 or chunk_size <= 0 or stride > chunk_size:
        raise ValueError("need 0 < stride <= chunk_size")
    w = tokens(text_col)
    starts = F.sequence(F.lit(1), F.size(w), F.lit(stride))
    chunks = F.transform(starts, lambda s: F.slice(w, s, chunk_size))
    return (
        df.where(F.size(w) > 0)
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .select(
            id_col,
            "chunk_idx",
            F.size("chunk").alias("n_chunk_tokens"),
            F.concat_ws(" ", "chunk").alias("chunk_text"),
        )
    )


def pack_documents(
    df: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Assign each document a pack id and offset within its pack.

    Documents longer than ``budget`` get a pack of their own (their
    offset is 0 and they overflow — callers split oversized docs before
    packing; kept simple and deterministic here).

    Scale note: ALWAYS pass ``partition_cols`` (lang/shard/source) at
    corpus scale — the no-partition fallback is a single-reducer global
    cumsum kept only for small inputs and tests.  For a budget-capped
    GLOBAL ordering without the global sort, see the bucketed
    base-offset decomposition in
    ``plans/llm_queries.budget_select_documents``.
    """
    parts = list(partition_cols or [])
    w = (
        Window.partitionBy(*parts).orderBy(id_col)
        if parts
        else Window.orderBy(id_col)
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)

    toks = token_count(text_col)
    out = (
        df.withColumn("n_tokens", toks)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn(
            "pack_id",
            ((F.col("cum_tokens") - F.col("n_tokens")) / budget).cast("long"),
        )
        .withColumn(
            "pack_offset",
            (F.col("cum_tokens") - F.col("n_tokens")) % budget,
        )
    )
    return out.select(
        *parts, id_col, "n_tokens", "cum_tokens", "pack_id", "pack_offset"
    )
