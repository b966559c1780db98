from nasa_asteroid_data_lakehouse_spark.llm import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
