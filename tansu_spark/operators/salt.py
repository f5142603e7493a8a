"""Skew-safe two-stage aggregation (key salting).

Problem: `groupBy(hot_key).agg(...)` sends every row of a hot key to one
reducer — at 100 TB a single skewed key (one language, one event type,
one tenant) stalls the stage on one straggler task.

This operator splits the aggregation: stage 1 groups by (keys..., salt)
so a hot key's rows spread over `n_salt` reducers and are pre-collapsed
to at most n_salt partial rows per key; stage 2 merges the partials with
the algebraic combiner of each aggregate. Only decomposable aggregates
are accepted (count/sum/min/max — the same set map-side partial
aggregation handles), so results are exactly equal to the direct plan.

Salt derivation uses `spark_partition_id()` — deterministic, free (no
rand(), no extra column scan), and by construction different for the
same key across input splits, which is precisely the skew being treated.

Note: Spark's own partial aggregation + AQE skew handling covers many
cases; explicit salting remains the tool when a single post-shuffle key
group is still too large (AQE cannot split one key's hash partition for
aggregation, only for joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# aggregate -> (stage-1 partial fn, stage-2 merge fn)
_COMBINERS = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, object]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-stage skew-spread aggregation, result identical to
    ``df.groupBy(*keys).agg(...)``.

    ``aggs`` maps output column name -> (agg_name, input column), e.g.
    ``{"n": ("count", None), "v_sum": ("sum", col)}``.
    """
    partials, merges = [], []
    for out, (name, col) in aggs.items():
        try:
            partial, merge = _COMBINERS[name]
        except KeyError:
            raise ValueError(
                f"{name!r} is not decomposable; salting supports {sorted(_COMBINERS)}"
            ) from None
        partials.append(partial(col).alias(f"_p_{out}"))
        merges.append(merge(f"_p_{out}").alias(out))
    stage1 = (
        df.withColumn("_salt", F.pmod(F.spark_partition_id(), F.lit(n_salt)))
        .groupBy(*keys, "_salt")
        .agg(*partials)
    )
    return stage1.groupBy(*keys).agg(*merges)


def salted_join(
    facts: DataFrame,
    dims: DataFrame,
    on: list[str] | str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: result identical to ``facts.join(dims, on, how)``.

    Problem: a shuffle join hashes both sides on the key, so ALL rows of a
    hot key land in one reducer; AQE's skew-join split helps sort-merge
    joins but cannot help when the dim side must be replicated per key
    group (e.g. after an upstream operator pinned the partitioning).

    Shape: the fact side gets a deterministic salt from
    ``spark_partition_id()`` (free, no rand()); the dim side is exploded
    n_salt times so every (key, salt) bucket finds its dim row. The join
    key becomes (key..., salt) — a hot key now spreads over n_salt
    reducers. The dim-side blow-up is n_salt * |dims|, which is the
    standard price and why this targets fact⋈dim shapes; for dim tables
    small enough to broadcast, `broadcast()` is strictly better — use
    this when the dim side exceeds broadcast limits but a few fact keys
    are pathologically hot.

    Supported `how`: inner / left (the fact side is preserved; dim-side
    non-matches never multiply because every fact row has exactly one
    salt value).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    f = facts.withColumn("_salt", F.pmod(F.spark_partition_id(), F.lit(n_salt)))
    d = dims.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    return f.join(d, keys + ["_salt"], how).drop("_salt")
