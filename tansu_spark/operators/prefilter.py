"""Semi-join reduction: shrink the FACT side of a shuffle join before the
shuffle, by broadcasting just the dimension's join-key set.

Reference parity: the reference evaluates fetch-side predicates before
materializing record batches (tansu: broker fetch filters rows ahead of
response assembly); this generalizes "filter before you move data" to
distributed joins, which its single-node engine never needs.

The classic distributed-DB rewrite (Bernstein & Chiu 1981): when a join is
selective — most fact rows have no dim partner — a plain shuffle join still
moves EVERY fact row. If the dim itself is too wide/large to broadcast but
its DISTINCT KEY SET is small, broadcast the keys, left-semi-filter the
fact map-side (no shuffle, no network), then shuffle-join only survivors:

    fact ⋈ dim  ==  (fact ⋉ broadcast(keys(dim))) ⋈ dim

At 100 TB: a dim that matches 1% of fact keys turns a 100 TB shuffle into
a 1 TB shuffle for the price of one broadcast of a key list. Spark's
runtime bloom-filter join (spark.sql.optimizer.runtime.bloomFilter.*) is
the approximate automatic cousin; this operator is the exact, explicit
form with a cardinality guard.

Correct for inner and left joins on equi-keys (the semi filter drops only
fact rows that cannot find a partner — for LEFT joins the dropped rows
must be re-added as null-extended, so only "inner" is offered; use the
runtime bloom filter for outer shapes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def semi_reduced_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    max_broadcast_keys: int | None = None,
) -> DataFrame:
    """Inner-join `fact` with `dim` on equi-keys `on`, pre-filtering the
    fact with a broadcast left-semi join on the dim's distinct key set.

    `max_broadcast_keys`: optional guard — if the dim's distinct key count
    exceeds it, skip the reduction (the key list would blow the broadcast
    budget) and fall back to the plain shuffle join. The guard costs one
    cheap dim-only aggregate job; leave it None when the caller already
    knows the dim key cardinality is bounded.
    """
    keys = [on] if isinstance(on, str) else list(on)
    dim_keys = dim.select(*keys).distinct()
    if max_broadcast_keys is not None:
        if dim_keys.count() > max_broadcast_keys:
            return fact.join(dim, keys, "inner")
    reduced = fact.join(F.broadcast(dim_keys), keys, "left_semi")
    return reduced.join(dim, keys, "inner")
