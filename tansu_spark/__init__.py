"""tansu_spark — a PySpark-native engine with the query and data-processing
capabilities of tansu-io/tansu (reference surveyed in /root/repo/SURVEY.md).

Not a port: the reference is a Rust Kafka-compatible broker with lakehouse
sinks; this package re-expresses its semantics (schema-enforced partitioned
topics, offset/watermark bookkeeping, compaction/retention, config-driven
lake materialization) as idiomatic DataFrame / Structured Streaming code,
and extends it with large-scale training-data pipeline operators
(dedup, similarity search, text analysis).
"""

from tansu_spark.session import get_spark

__version__ = "0.1.0"
__all__ = ["get_spark", "__version__"]
