from tansu_spark.lake.sink import LakeSink
from tansu_spark.lake.maintain import (
    compact_table,
    retention_sweep,
    vacuum,
    zorder_key,
    zorder_table,
)

__all__ = [
    "LakeSink",
    "compact_table",
    "retention_sweep",
    "vacuum",
    "zorder_key",
    "zorder_table",
]
