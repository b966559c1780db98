from nasa_asteroid_data_lakehouse_spark.llm import (
    corpus_stats,
    curation,
    dedup,
    multimodal,
    packing,
    sharding,
    similarity,
    text,
    tokenizer,
)

__all__ = [
    "corpus_stats",
    "curation",
    "dedup",
    "multimodal",
    "packing",
    "sharding",
    "similarity",
    "text",
    "tokenizer",
]
