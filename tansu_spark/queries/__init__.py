"""Query registry — the surface the driver's correctness gate sees.

Every operator from SURVEY.md §2 that is SQL-expressible registers here
twice: a Spark DataFrame implementation (``QUERIES``) and a DuckDB oracle
(``ORACLE``). Registration happens at import time via the ``@query``
decorator.

Numeric-parity rule (applies to every query): aggregate money/ratio columns
through DECIMAL casts (exact arithmetic, identical in both engines) and cast
the final value to DOUBLE, or round deterministically — so the driver's
order-insensitive value-hash matches bit-for-bit. Column names are aliased
identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a (spark, sf_dir) -> DataFrame query, optionally with a
    DuckDB oracle SQL string. Queries without an oracle get the driver's
    weaker rows-only check (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # Import for registration side effects.
    from tansu_spark.queries import (  # noqa: F401
        analytics,
        kafka_ops,
        lake_ops,
        pipeline,
        similarity,
        tpch,
        tpch_ext,
    )


_load_all()
