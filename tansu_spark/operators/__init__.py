from tansu_spark.operators.kafka import (
    compact,
    fetch,
    fetch_max_bytes,
    list_offsets,
    offsets_for_timestamp,
    retain,
    with_meta,
)

__all__ = [
    "compact",
    "fetch",
    "fetch_max_bytes",
    "list_offsets",
    "offsets_for_timestamp",
    "retain",
    "with_meta",
]
