"""File-level data-skipping statistics for parquet-native lake tables.

What Delta/Iceberg keep in their transaction log (per-file min/max column
stats) maintained here as an explicit `_stats.json` manifest, since neither
runtime ships in this container (lake/sink.py has the same import-gate
story). Reference parity: the reference prunes lake scans via Delta's
stats (nisshi-schema/src/lake/delta.rs checkpoint stats); this is the
parquet-native equivalent.

Scale design:
- `collect_stats` is ONE distributed pass: group rows by
  `input_file_name()` and min/max-aggregate the indexed columns — a
  shuffle on file name (perfectly uniform, one group per file). The
  manifest itself is tiny (2 values x cols x files) and lives next to
  the data.
- `pruned_read` intersects the predicate interval with each file's
  [min, max] DRIVER-SIDE (manifest scan, no Spark job), then hands Spark
  only the surviving files. Combined with zorder_table (which co-locates
  correlated ranges per file), a narrow predicate touches O(matching)
  files instead of O(all) — the difference between reading 100 TB and
  reading 100 GB.
- Pruning is advisory, never a correctness gate: the residual filter is
  still applied to the surviving files, so a stale manifest can only
  cost speed (extra files), except for files MISSING from the manifest,
  which are always kept.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATS_NAME = "_stats.json"


def _stats_path(table_dir: str) -> str:
    return os.path.join(table_dir, STATS_NAME)


def collect_stats(
    spark: SparkSession, table_dir: str, cols: list[str]
) -> dict[str, Any]:
    """Build and persist the per-file min/max manifest for `cols`.
    Re-run after compact/zorder/retention rewrites (Maintainer does)."""
    df = spark.read.parquet(table_dir)
    aggs = []
    for c in cols:
        aggs.append(F.min(c).cast("string").alias(f"min_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"max_{c}"))
    rows = (
        df.withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg(*aggs)
        .collect()
    )
    files = {}
    for r in rows:
        # input_file_name yields a URI; store paths relative to the table
        # root so the manifest survives a table move.
        rel = os.path.relpath(r["_file"].replace("file://", ""), table_dir)
        files[rel] = {
            c: [r[f"min_{c}"], r[f"max_{c}"]] for c in cols
        }
    manifest = {"version": 1, "created_at": time.time(), "columns": cols, "files": files}
    with open(_stats_path(table_dir), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def load_stats(table_dir: str) -> dict[str, Any] | None:
    p = _stats_path(table_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def prune_files(
    table_dir: str, predicates: dict[str, tuple[Any, Any]]
) -> tuple[list[str], int]:
    """(surviving absolute file paths, n_skipped). `predicates` maps
    column -> (lo, hi) closed interval (None = unbounded on that side);
    a file survives unless some predicate interval is disjoint from the
    file's [min, max]. Comparison happens on the stringified stats, which
    is order-correct for strings and for the zero-padded numeric keys the
    lake writes; numeric predicates are compared numerically."""
    manifest = load_stats(table_dir)
    if manifest is None:
        raise FileNotFoundError(f"no {STATS_NAME} in {table_dir}; run collect_stats")
    # Walk the table as it IS, not as the manifest remembers it: files
    # written after stats collection carry no stats and must be kept.
    on_disk = []
    for root, _dirs, names in os.walk(table_dir):
        for n in names:
            if n.endswith(".parquet"):
                on_disk.append(os.path.relpath(os.path.join(root, n), table_dir))
    keep, skipped = [], 0
    for rel in sorted(on_disk):
        stats = manifest["files"].get(rel)
        if stats is None:
            keep.append(os.path.join(table_dir, rel))
            continue
        alive = True
        for col, (lo, hi) in predicates.items():
            if col not in stats:
                continue
            fmin, fmax = stats[col]
            if fmin is None or fmax is None:  # all-null file: keep
                continue
            if isinstance(lo, (int, float)) or isinstance(hi, (int, float)):
                fmin, fmax = float(fmin), float(fmax)
            if (hi is not None and fmin > hi) or (lo is not None and fmax < lo):
                alive = False
                break
        if alive:
            keep.append(os.path.join(table_dir, rel))
        else:
            skipped += 1
    return keep, skipped


def pruned_read(
    spark: SparkSession, table_dir: str, predicates: dict[str, tuple[Any, Any]]
) -> DataFrame:
    """Read only the files whose stats intersect every predicate interval,
    then re-apply the predicates as real filters (pruning is a fast-path,
    not the correctness boundary)."""
    files, _ = prune_files(table_dir, predicates)
    if not files:
        # Preserve schema for the empty result.
        return spark.read.parquet(table_dir).limit(0)
    df = spark.read.parquet(*files)
    for col, (lo, hi) in predicates.items():
        if lo is not None:
            df = df.filter(F.col(col) >= lo)
        if hi is not None:
            df = df.filter(F.col(col) <= hi)
    return df
