from tansu_spark.registry.registry import (
    SchemaRegistry,
    UnsupportedSchemaError,
    ValidationError,
)

__all__ = ["SchemaRegistry", "UnsupportedSchemaError", "ValidationError"]
