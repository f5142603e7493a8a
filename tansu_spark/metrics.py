"""Operational metrics: counters + duration histograms for the engine's
control-plane operations, mirroring the reference's OTel instruments
(nisshi-schema/src/lib.rs:462-475, lake/delta.rs:99-178 — e.g.
registry_validation_duration, lakehouse_store_duration,
deltalake_write_duration, lakehouse_maintenance_duration).

Spark already meters the data plane (task metrics, SQL metrics,
`observe()`); this registry covers the engine's own driver-side
operations so a deployment can scrape produce/validate/store/maintain
latencies the way the reference's Prometheus endpoint exposes them.
Process-global and lock-free (single-threaded driver mutation; readers
take snapshots)."""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Any

_REGISTRY: dict[str, dict[str, float]] = {}


def observe(name: str, duration_ms: float) -> None:
    h = _REGISTRY.setdefault(
        name, {"count": 0, "total_ms": 0.0, "min_ms": float("inf"), "max_ms": 0.0}
    )
    h["count"] += 1
    h["total_ms"] += duration_ms
    h["min_ms"] = min(h["min_ms"], duration_ms)
    h["max_ms"] = max(h["max_ms"], duration_ms)


@contextmanager
def timed(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        observe(name, (time.perf_counter() - t0) * 1000.0)


def snapshot() -> dict[str, dict[str, Any]]:
    """Point-in-time copy with derived mean — the scrape surface."""
    out: dict[str, dict[str, Any]] = {}
    for name, h in _REGISTRY.items():
        out[name] = dict(h)
        out[name]["mean_ms"] = h["total_ms"] / h["count"] if h["count"] else 0.0
    return out


def reset() -> None:
    _REGISTRY.clear()
    _COUNTERS.clear()


_COUNTERS: dict[str, dict[str, int]] = {}


def add(name: str, n: int = 1, **labels: str) -> None:
    """Labelled counter (the reference's COORDINATOR_REQUESTS shape:
    `counter.add(1, [KeyValue("method", "join")])`,
    administrator.rs:823+). Label sets are flattened to a sorted
    `k=v` key per series."""
    series = ",".join(f"{k}={v}" for k, v in sorted(labels.items()))
    bucket = _COUNTERS.setdefault(name, {})
    bucket[series] = bucket.get(series, 0) + n


def counters() -> dict[str, dict[str, int]]:
    return {name: dict(series) for name, series in _COUNTERS.items()}
