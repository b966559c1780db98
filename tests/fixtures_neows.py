"""Re-export of the canonical NeoWs fixture (moved into the package
so the driver-checked neows queries embed the same documents)."""

from nasa_asteroid_data_lakehouse_spark.pipeline.neows_fixture import (  # noqa: F401
    DAY1,
    DAY2,
    DOC_DAY1,
    DOC_DAY2,
    _approach,
    _neo,
)
