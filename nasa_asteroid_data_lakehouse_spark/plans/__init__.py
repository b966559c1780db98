from nasa_asteroid_data_lakehouse_spark.plans import queries

__all__ = ["queries"]
