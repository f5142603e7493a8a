"""Bucketed (co-located) tables — shuffle-free repeated joins.

Problem: every `big.join(big2, key)` shuffles BOTH sides on the key. A
table joined on the same key by many queries (fact-to-fact, topic-to-
topic enrichment) pays that shuffle every time — at 100 TB the dominant
cost of the whole workload.

Spark's answer is bucketing: write the table hash-partitioned into N
buckets on the join key (`bucketBy` + `saveAsTable`); a join between two
tables bucketed on the same key with the same N reads co-located buckets
and plans a sort-merge join with NO Exchange on either side. The shuffle
is paid once at write time and amortized over every subsequent join —
the same reasoning as the reference's per-topition physical layout (one
directory per partition, SURVEY §2.1 S6), promoted to the lake.

tests/test_bucketed.py asserts the no-Exchange property on the executed
plan; that assertion IS the feature.
"""

from __future__ import annotations

import pathlib
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed managed table (overwrite).

    ``sort_cols`` additionally sorts within buckets, letting the
    sort-merge join skip its sort as well (plan becomes scan->merge).

    The in-memory catalog is per-session but the warehouse directory is
    not: a table written by a previous session leaves its location on
    disk with no catalog entry, and ``saveAsTable`` then raises
    LOCATION_ALREADY_EXISTS instead of overwriting. Drop both first."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    stale = pathlib.Path(warehouse.removeprefix("file:")) / name.lower()
    shutil.rmtree(stale, ignore_errors=True)
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def bucketed_join(
    spark: SparkSession, left_name: str, right_name: str, on: list[str] | str
) -> DataFrame:
    """Join two same-key same-N bucketed tables; with bucketing enabled
    (default) the plan contains no Exchange. `merge` hint pins the
    sort-merge strategy so small test tables don't broadcast instead."""
    left = spark.table(left_name)
    right = spark.table(right_name)
    return left.hint("merge").join(right, on)
