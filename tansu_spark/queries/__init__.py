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
        # is the production shape. ZERO current users — the one holder
        # (dedup_semantic_cluster, pinned k=16 vs dedup_semdedup_scaled's
        # k=n/32) was RETIRED from the registry in round 8 and lives on as
        # a pytest-pinned contrast (tests/test_similarity.py) plus its
        # SCALING.md sweep row. The trait stays so any future quadratic
        # must still declare itself; tests/test_plans.py enforces it.
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


def _reachable_helpers(fn) -> tuple[list, list[str], list[tuple[str, str]]]:
    """Transitive closure of the ``tansu_spark`` code a function actually
    references: walk ``co_names`` of the function's code object (including
    nested lambdas/defs in ``co_consts``), resolve each name in the
    function's globals, and recurse into any resolved tansu_spark
    function/class. Three capture channels:

    * callables — module-level tansu_spark functions/classes reachable
      through globals (function-source granularity);
    * modules — tansu_spark modules referenced by name, INCLUDING
      function-local ``from tansu_spark.x.y import z`` statements (the
      dotted module path sits in ``co_names`` even though ``z`` binds as
      a local), closed transitively over each module file's own
      ``import tansu_spark...`` statements (whole-file granularity);
    * consts — referenced module-level DATA globals (band params, config
      tuples) as (name, repr) pairs, so tuning-constant edits also move
      the fingerprint.

    Returns (callables, module_names, consts), each deterministically
    ordered."""
    import re
    import types

    def code_names(code) -> set[str]:
        names = set(code.co_names)
        for const in code.co_consts:
            if isinstance(const, types.CodeType):
                names |= code_names(const)
        return names

    def const_repr(v) -> str | None:
        if isinstance(v, (str, bytes, int, float, bool, tuple, list, dict)):
            return repr(v)
        if isinstance(v, (set, frozenset)):
            return repr(sorted(v, key=repr))
        return None

    helpers: dict[str, object] = {}
    modules: set[str] = set()
    consts: dict[str, str] = {}
    stack = [fn]
    while stack:
        f = stack.pop()
        code = getattr(f, "__code__", None)
        g = getattr(f, "__globals__", None)
        if code is None or g is None:
            continue
        for name in sorted(code_names(code)):
            if name.startswith("tansu_spark") and "." in name:
                modules.add(name)  # function-local dotted import target
                continue
            v = g.get(name)
            if v is None:
                continue
            if isinstance(v, types.ModuleType):
                if v.__name__.startswith("tansu_spark"):
                    modules.add(v.__name__)
                continue
            mod = getattr(v, "__module__", "") or ""
            if not mod.startswith("tansu_spark"):
                if not callable(v) and name in g:
                    r = const_repr(v)
                    if r is not None:
                        consts.setdefault(name, r)
                continue
            if isinstance(v, type):
                key = f"{mod}.{getattr(v, '__qualname__', name)}"
                if key not in helpers:
                    helpers[key] = v
                    for attr in vars(v).values():
                        if isinstance(attr, types.FunctionType):
                            stack.append(attr)
            elif callable(v):
                target = getattr(v, "__wrapped__", v)
                key = f"{mod}.{getattr(target, '__qualname__', name)}"
                if key not in helpers:
                    helpers[key] = target
                    stack.append(target)

    # Transitive module closure by scanning each module file's own
    # tansu_spark imports (regex over source — cheap and total).
    imp_re = re.compile(
        r"^\s*(?:from\s+(tansu_spark(?:\.\w+)*)\s+import|import\s+(tansu_spark(?:\.\w+)*))",
        re.M,
    )
    todo = sorted(modules)
    while todo:
        mod_name = todo.pop()
        try:
            text = _module_bytes(mod_name).decode("utf-8", "replace")
        except Exception:  # pragma: no cover
            continue
        for m in imp_re.finditer(text):
            dep = m.group(1) or m.group(2)
            if dep not in modules:
                modules.add(dep)
                todo.append(dep)

    ordered = [helpers[k] for k in sorted(helpers)]
    return ordered, sorted(modules), sorted(consts.items())


def fingerprint(name: str) -> str:
    """Source fingerprint of a registered query, two dot-separated sha16
    parts: ``<fn>.<helpers>``.

    * ``fn`` — sha256 over the query function's own source plus its
      oracle SQL (the round-6 format; sidecar entries recorded before
      round 8 hold only this part, and ``_changed_since_green`` compares
      legacy entries against it alone).
    * ``helpers`` — sha256 over the sources of every tansu_spark
      function/class the query's code TRANSITIVELY references plus the
      file bytes of every tansu_spark module it references by name, so a
      rewrite of a shared kernel (``pipeline._winnow_fps``, a
      ``functions/similarity.py`` scorer, a ``streaming`` source) moves
      the fingerprint of exactly the queries that call it. This replaces
      the hand-maintained ``GATE_FORCE_REVERIFY`` list (round-7 verdict,
      "What's wrong #3").

    The driver-gate rotation (``__spark_entry__._ordered_names``)
    compares this against the fingerprint recorded at the query's last
    driver-green round (``gate_fingerprints.json``) so a REWRITTEN query
    rotates back into the verification window instead of coasting on a
    stale green row."""
    import hashlib
    import inspect

    cached = _FP_CACHE.get(name)
    if cached is not None:
        return cached

    fn = QUERIES[name]

    def src_of(obj) -> str:
        try:
            return inspect.getsource(obj)
        except (OSError, TypeError):  # pragma: no cover - source on disk
            return getattr(obj, "__qualname__", repr(obj))

    fn_part = hashlib.sha256(
        (src_of(fn) + "\n--oracle--\n" + ORACLE.get(name, "")).encode()
    ).hexdigest()[:16]

    callables, module_names, consts = _reachable_helpers(fn)
    h = hashlib.sha256()
    for obj in callables:
        h.update(src_of(obj).encode())
        h.update(b"\0")
    for mod_name in module_names:
        h.update(mod_name.encode())
        h.update(_module_bytes(mod_name))
        h.update(b"\0")
    for cname, crepr in consts:
        h.update(f"{cname}={crepr}".encode())
        h.update(b"\0")
    fp = f"{fn_part}.{h.hexdigest()[:16]}"
    _FP_CACHE[name] = fp
    return fp


_FP_CACHE: dict[str, str] = {}


def _module_bytes(mod_name: str) -> bytes:
    import importlib
    import inspect

    try:
        mod = importlib.import_module(mod_name)
        path = inspect.getsourcefile(mod)
        if path:
            with open(path, "rb") as f:
                return f.read()
    except (ImportError, OSError, TypeError):  # pragma: no cover
        pass
    return mod_name.encode()


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
