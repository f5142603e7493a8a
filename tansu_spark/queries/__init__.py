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
PLAN_TRAITS: dict[str, frozenset[str]] = {}

# A query that deviates from the default plan contract (no CartesianProduct,
# no BroadcastNestedLoopJoin) must declare WHY at registration time via
# ``plan=``, so tests/test_plans.py::test_joins_never_cartesian can never be
# skipped by forgetting a test-file allowlist (bit us in rounds 4 AND 5).
_KNOWN_PLAN_TRAITS = frozenset(
    {
        # Broadcasts a tiny fixed query-vector set against the corpus: the
        # BNLJ side is O(queries x dims) plan state, corpus never shuffles.
        "broadcast_query_set",
        # Cross-joins one-or-more single-row aggregate frames (corpus stats,
        # ledger counters): every BNLJ side is exactly one row.
        "single_row_broadcast",
        # Exact all-pairs ground truth over a fixed-size audit slice — the
        # quadratic contrast is the point of the query.
        "allpairs_audit",
        # Non-equi range join whose build side is a bounded small list
        # (e.g. distinct days in a 7-day window).
        "bounded_range_join",
        # Broadcasts a bounded model table (centroid set, PQ LUT) whose size
        # is fixed by training config, not data volume.
        "small_model_broadcast",
        # DISCLOSED quadratic-in-n contrast entry: per-group all-pairs with
        # a FIXED group count, kept deliberately next to a scaled twin that
        # is the production shape (e.g. dedup_semantic_cluster's pinned
        # k=16 vs dedup_semdedup_scaled's k=n/32). SCALING.md carries the
        # measured sweep; a query may not be quadratic without this trait.
        "quadratic_contrast",
    }
)


def query(
    name: str,
    oracle: str | None = None,
    plan: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Register a (spark, sf_dir) -> DataFrame query, optionally with a
    DuckDB oracle SQL string. Queries without an oracle get the driver's
    weaker rows-only check (reserved for genuinely non-SQL-expressible ops).

    ``plan`` declares intentional physical-plan deviations (see
    ``_KNOWN_PLAN_TRAITS``); the plan regression suite reads this registry,
    so the declaration lives next to the query it describes."""

    traits = frozenset(plan)
    unknown = traits - _KNOWN_PLAN_TRAITS
    if unknown:
        raise ValueError(f"unknown plan trait(s) {sorted(unknown)} for {name!r}")

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        PLAN_TRAITS[name] = traits
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def fingerprint(name: str) -> str:
    """Source fingerprint of a registered query: sha256 over the query
    function's source text plus its oracle SQL. The driver-gate rotation
    (``__spark_entry__._ordered_names``) compares this against the
    fingerprint recorded at the query's last driver-green round
    (``gate_fingerprints.json``) so a REWRITTEN query rotates back into
    the verification window instead of coasting on a stale green row.

    Granularity note: helper changes in other modules don't move this
    hash — deep-helper rewrites are flagged via the explicit
    ``GATE_FORCE_REVERIFY`` list in ``__spark_entry__.py``."""
    import hashlib
    import inspect

    fn = QUERIES[name]
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):  # pragma: no cover - source always on disk
        src = getattr(fn, "__qualname__", name)
    blob = src + "\n--oracle--\n" + ORACLE.get(name, "")
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


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
