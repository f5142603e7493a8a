"""Session-scoped checkpoint cache — ONE home for the probe-and-rebuild
persistent-RDD registry pattern (ADVICE r10: `_sh_cached`,
`_winnow_fps_cached` and `_dedup_chain` each hand-rolled the cache-key /
protected-id / self-heal logic; a fourth copy was about to appear for the
shared k-NN graph).

Contract (unchanged from the r8-r10 pattern the bench and tests pin):

- Values are cached per ``(applicationId, *key)`` — a new Spark session
  never sees another session's frames, and nothing survives the process
  (no cross-run result caching).
- ``build()`` returns a DataFrame or a dict of DataFrames, each of which
  must be ``localCheckpoint(eager=True)``'d ALREADY — builders own
  materialization order (a chain must checkpoint stage N before building
  stage N+1 from it); the cache owns the registry bookkeeping.
- The hit path is a DRIVER-side probe, zero Spark jobs: the value is
  healthy iff every backing RDD id is still in the persistent-RDD
  registry. An external unpersist (bench.py's between-query release, a
  manual clearCache) removes it from exactly that registry, so the next
  call rebuilds instead of raising.
- ``all_protected_ids()`` is what bulk-unpersist callers (bench.py's
  ``release_cached`` via ``pipeline.dedup_chain_protected_ids``) must
  skip: the union of every live cache entry's backing RDD ids, per-key so
  a rebuild/evict drops its stale ids.
"""

from __future__ import annotations


def _persistent_rdd_ids(spark) -> set:
    out = set()
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        out.add(int(it.next()._1()))
    return out


def _checkpoint_rdd_id(df) -> int | None:
    """The persisted RDD id behind a localCheckpoint'ed DataFrame: its
    analyzed plan is a LogicalRDD whose `rdd` field IS the checkpointed
    (persisted) RDD — the id the persistent-RDD registry tracks."""
    try:
        return int(df._jdf.queryExecution().analyzed().rdd().id())
    except Exception:
        return None


class SessionCheckpointCache:
    """One named cache; ``cache`` / ``protected`` are plain dicts so tests
    can clear or inspect them (``{full_key: value}`` / ``{full_key:
    set_of_rdd_ids}``)."""

    _instances: list["SessionCheckpointCache"] = []

    def __init__(self, name: str) -> None:
        self.name = name
        self.cache: dict = {}
        self.protected: dict = {}
        SessionCheckpointCache._instances.append(self)

    def get(self, spark, key: tuple, build):
        full = (spark.sparkContext.applicationId,) + tuple(key)
        hit = self.cache.get(full)
        if hit is not None:
            ids = self.protected.get(full, set())
            if ids and ids <= _persistent_rdd_ids(spark):
                return hit
            self.cache.pop(full, None)
            self.protected.pop(full, None)
        val = build()
        dfs = list(val.values()) if isinstance(val, dict) else [val]
        ids = {
            i
            for df in dfs
            for i in (_checkpoint_rdd_id(df),)
            if i is not None
        }
        self.cache[full] = val
        self.protected[full] = ids
        return val


def all_protected_ids() -> set:
    out: set = set()
    for inst in SessionCheckpointCache._instances:
        for ids in inst.protected.values():
            out |= ids
    return out
