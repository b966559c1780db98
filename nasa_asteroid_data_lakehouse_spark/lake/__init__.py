from nasa_asteroid_data_lakehouse_spark.lake.table import VersionedTable

__all__ = ["VersionedTable"]
