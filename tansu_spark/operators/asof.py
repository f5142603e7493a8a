"""As-of (point-in-time) join — a custom operator Spark lacks natively.

For each left row, attach the right row with the greatest right.t
satisfying right.t <= left.t within the same key group (the semantics of
DuckDB's ASOF JOIN, kdb aj, pandas merge_asof).

Implementation is the union-tag trick, NOT a range self-join:
  1. union right (payload) and left (probe) rows, tagged;
  2. one window per key ordered by (t, tag) fills the last non-null
     payload seen so far — right rows at equal t sort before left rows,
     giving inclusive (<=) semantics;
  3. keep probe rows (optionally only matched ones).

Cost: one shuffle on the key + one sorted window — the topology of a
sort-merge join, with no quadratic range expansion and no broadcast
requirement. Skewed keys behave like any windowed aggregation (AQE skew
handling applies). If multiple right rows share (key, t), pre-dedupe the
right side to make "the" as-of row well-defined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    how: str = "inner",
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """left rows + columns of the nearest right row per `on` key:
    direction='backward' (default) takes the LATEST right with
    right[right_time] <= left[left_time] (lookup of prevailing state);
    direction='forward' takes the EARLIEST right with right[right_time]
    >= left[left_time] (time-to-next-event joins). Forward is the same
    one-shuffle window plan with the time order reversed — right rows
    still sort before probes at equal times, keeping inclusive bounds.

    ``tolerance`` (an SQL interval string, e.g. ``'30 days'``) bounds the
    match's staleness: a backward match older than left_time - tolerance
    (or a forward match beyond left_time + tolerance) counts as NO match
    — pandas merge_asof's tolerance semantics. Still one shuffle: the
    matched right time rides the same window fill and the bound is a
    post-filter, so no range-join blowup.

    Right-side payload columns must not collide with left columns (alias
    beforehand). `how`: 'inner' drops unmatched probes, 'left' keeps them
    with null payload.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = [c for c in right.columns if c not in (on, right_time)]
    collisions = set(payload) & set(left.columns)
    if collisions:
        raise ValueError(f"right payload columns collide with left: {sorted(collisions)}")

    r_side = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).cast("timestamp").alias("_t"),
        F.lit(0).alias("_tag"),
        F.lit(1).alias("_hit"),
        F.col(right_time).cast("timestamp").alias("_rt"),
        *[F.col(c) for c in payload],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in left.columns],
    )
    l_side = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).cast("timestamp").alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast("int").alias("_hit"),
        F.lit(None).cast("timestamp").alias("_rt"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload],
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )

    t_order = F.asc("_t") if direction == "backward" else F.desc("_t")
    w = (
        Window.partitionBy("_k")
        .orderBy(t_order, F.asc("_tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fill = [F.last(c, ignorenulls=True).over(w).alias(f"_f_{c}") for c in payload]
    fill.append(F.last("_hit", ignorenulls=True).over(w).alias("_matched"))
    fill.append(F.last("_rt", ignorenulls=True).over(w).alias("_f_rt"))

    filled = r_side.unionByName(l_side).select("*", *fill)
    out = filled.filter(F.col("_tag") == 1)

    within = F.col("_matched").isNotNull()
    if tolerance is not None:
        bound = F.expr(f"interval {tolerance}")
        if direction == "backward":
            within = within & (F.col("_f_rt") >= F.col("_t") - bound)
        else:
            within = within & (F.col("_f_rt") <= F.col("_t") + bound)

    if how == "inner":
        out = out.filter(within)
        return out.select(
            *[F.col(f"_l_{c}").alias(c) for c in left.columns],
            *[F.col(f"_f_{c}").alias(c) for c in payload],
        )
    # left: keep unmatched/out-of-tolerance probes with null payload
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.when(within, F.col(f"_f_{c}")).alias(c) for c in payload],
    )
