"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 plus
the training-data-pipeline extensions, backed by ``tansu_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1 pricing summary on /root/testdata/sf0.001."""
    from tansu_spark.queries import QUERIES

    return QUERIES["tpch_q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def _latest_green_round() -> dict[str, int]:
    """name -> latest round whose driver gate fully passed it (rows +
    schema + hash). The driver's correctness gate checks only a bounded
    window of ``queries()`` (~50 entries), so we rotate on this: queries
    WITHOUT a passing row from any previous round go first. Reading the
    accumulated CORRECTNESS_r*.json files makes the rotation automatic.

    ``CORRECTNESS_r*_preview.json`` files (builder-run gate previews) are
    INTENTIONALLY excluded: only the driver's own run is green evidence —
    counting a preview would let a query skip the real gate."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if isinstance(row, dict) and row.get("rows_match") and row.get("err") is None:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _changed_since_green(latest_green: dict[str, int]) -> set[str]:
    """Names whose source fingerprint differs from the one recorded at
    their last green round (``gate_fingerprints.json``, written by
    ``tools/write_gate_fingerprints.py`` at every round close). A green
    row proves the code AS OF THAT ROUND — a later rewrite must re-enter
    the window (round-6 verdict, "What's wrong #2").

    Two compatibility rules:
    * Sidecar round keys are normalized through ``int()`` on read, so a
      zero-padded key written as '07' still matches green round 7.
    * A green round with no sidecar entry falls back to the EARLIEST
      recorded round >= the green round (a mismatch there proves the code
      changed after that later snapshot, hence after the green row too —
      a sound under-approximation). Fingerprints are two-part
      ``<fn16>.<helpers16>`` from round 8 on; legacy single-part entries
      compare against the fn part alone."""
    import json

    from tansu_spark.queries import QUERIES, fingerprint

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        raw = json.load(open(os.path.join(here, "gate_fingerprints.json")))
    except (OSError, ValueError):
        raw = {}
    recorded: dict[int, dict[str, str]] = {
        int(k): v for k, v in raw.items() if str(k).lstrip("-").isdigit()
    }
    rounds = sorted(recorded)
    changed: set[str] = set()
    for name, rnd in latest_green.items():
        if name not in QUERIES:
            continue  # retired entry: green history but no registry row
        fps = recorded.get(rnd)
        if fps is None or name not in fps:
            # Earliest snapshot at/after the green round still proves
            # change (under-approximation: equal != unchanged-since-green).
            fps = next(
                (
                    recorded[r]
                    for r in rounds
                    if r >= rnd and name in recorded[r]
                ),
                None,
            )
        if fps is None or name not in fps:
            continue  # no snapshot covers this green row
        current = fingerprint(name)
        rec = fps[name]
        if "." not in rec:  # legacy pre-r8 format: fn part only
            current = current.split(".", 1)[0]
        if rec != current:
            changed.add(name)
    return changed


def _ordered_names() -> list[str]:
    """Deterministic rotation, four bands:
    (1) never driver-green, (2) green but SOURCE CHANGED since that green
    row (helper-aware fingerprint mismatch), (3) green and unchanged —
    ordered OLDEST green round first so the whole registry recycles
    through the driver's ~50-slot window every few rounds instead of the
    registry-front entries hogging every re-check (round-7 verdict,
    "What's wrong #4"), (4) rows-only unverified. Bands 1/2/4 keep
    registry order. Set TANSU_GATE_ROTATION=0 for plain registry order
    (no CORRECTNESS_r*.json dependence)."""
    from tansu_spark.queries import ORACLE, QUERIES

    if os.environ.get("TANSU_GATE_ROTATION", "1") == "0":
        return list(QUERIES)

    latest_green = _latest_green_round()
    passed = set(latest_green)
    stale = _changed_since_green(latest_green) & passed
    unverified = [n for n in QUERIES if n not in passed]

    head = [n for n in unverified if n in ORACLE]
    tail_rows_only = [n for n in unverified if n not in ORACLE]
    changed = [n for n in QUERIES if n in stale]
    registry_idx = {n: i for i, n in enumerate(QUERIES)}
    fresh = sorted(
        (n for n in QUERIES if n in passed and n not in stale),
        key=lambda n: (latest_green[n], registry_idx[n]),
    )
    return head + changed + fresh + tail_rows_only


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tansu_spark.queries import QUERIES

    return {n: QUERIES[n] for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    from tansu_spark.queries import ORACLE

    return {n: ORACLE[n] for n in _ordered_names() if n in ORACLE}
