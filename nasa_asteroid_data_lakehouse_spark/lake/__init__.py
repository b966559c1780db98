from nasa_asteroid_data_lakehouse_spark.lake.table import VersionedTable
from nasa_asteroid_data_lakehouse_spark.lake.transaction import (
    MultiTableTransaction,
)

__all__ = ["VersionedTable", "MultiTableTransaction"]
