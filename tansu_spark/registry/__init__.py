from tansu_spark.registry.registry import SchemaRegistry, ValidationError

__all__ = ["SchemaRegistry", "ValidationError"]
