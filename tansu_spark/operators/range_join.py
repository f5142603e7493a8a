"""Bucketized range (interval) join — point-in-interval matching at scale.

Problem: `events e JOIN intervals i ON e.t BETWEEN i.lo AND i.hi` is a
nested-loop/cartesian plan in most engines — quadratic at 100 TB.

This operator turns it into an equi-join: time is chunked into fixed-width
buckets; each interval is exploded to every bucket it overlaps (sequence()
— cheap, bounded by interval_width/bucket_width); points join their single
bucket; the exact containment predicate filters residually. Cost:
|points| + |intervals| * avg_buckets_per_interval shuffled rows, hash join
— linear, AQE-skew-safe. Same technique Spark itself applies with
`spark.sql.join.preferSortMergeJoin` range-join hints in Databricks; here
it is explicit and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    lo <= point <= hi (numeric columns; cast timestamps to epoch first).

    `bucket_width` trades explode fan-out (wide intervals → more buckets)
    against join selectivity; pick ~ the median interval width.
    """
    p = points.withColumn("_b", F.floor(F.col(point_col) / bucket_width).cast("long"))
    i = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                F.floor(F.col(hi_col) / bucket_width).cast("long"),
            )
        ),
    )
    joined = p.join(i, "_b", how).filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    )
    return joined.drop("_b")
