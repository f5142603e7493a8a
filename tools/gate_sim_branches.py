"""Targeted driver-gate replica at sf0.1 for BRANCH-CARRYING queries
(r7 verdict ask #4): queries with data-dependent conditional paths the
small gate SFs may never exercise — no-post-cutoff partitions (the r7
`kafka_group_lag_report` NULL bug was invisible at sf0.001/0.01),
outer/full interval-join horizons, LOCF/lerp boundary users, retention
and compaction edge rows, as-of tolerance misses, empty seasonal hours.

Runs each query's Spark plan AND DuckDB oracle at sf0.1 with the
driver's sorted-column exact compare (tests/oracle_util.compare), and
writes GATE_SF01.json. Exit non-zero on any mismatch.

Run: python tools/gate_sim_branches.py   (~8 min; streaming entries do
real availableNow runs at 10x the usual gate rows)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_BRANCH_SF_DIR", "/root/testdata/sf0.1")

NAMES = [
    # offset/watermark edges (empty partitions, max-timestamp ties)
    "kafka_list_offsets",
    "kafka_offset_for_timestamp",
    "kafka_offset_for_max_timestamp",
    # compaction/retention edge rows (all-tombstone keys, empty sweeps)
    "kafka_log_compaction",
    "kafka_retention_sweep",
    # the r7 NULL-committed class itself
    "kafka_group_lag_report",
    # LSO gating with open/committed/aborted mixes
    "kafka_txn_visibility_report",
    # as-of joins: tolerance misses and no-future-order users
    "asof_join_latest_order",
    "asof_join_next_order",
    "asof_join_tolerant_order",
    # gap-fill boundaries: users with single points, leading/trailing gaps
    "events_hourly_locf",
    "events_hourly_lerp",
    # session edges: singleton sessions, exact-gap boundaries
    "events_sessionize_batch",
    "events_session_window",
    "streaming_session_windows",
    # cohort horizon: cohorts younger than the window
    "events_cohort_retention",
    # empty-hour baseline branch
    "events_seasonal_anomaly",
    "events_ewma_anomaly",
    # interval-join null horizons (outer/full)
    "streaming_interval_join",
    "streaming_interval_join_outer",
    "streaming_interval_join_full",
]


def main() -> int:
    from tansu_spark.queries import ORACLE, QUERIES
    from tansu_spark.session import get_spark
    from tests.oracle_util import compare

    spark = get_spark(app_name="tansu-gate-branches")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    failed = []
    for name in NAMES:
        t0 = time.perf_counter()
        row: dict = {"err": None, "match": None, "sec": None}
        try:
            df = QUERIES[name](spark, SF_DIR)
            compare(df, ORACLE[name], SF_DIR)
            row["match"] = True
        except AssertionError as exc:
            row["match"] = False
            row["err"] = str(exc)[:500]
            failed.append(name)
        except Exception as exc:  # noqa: BLE001 - record, keep sweeping
            row["err"] = f"{type(exc).__name__}: {str(exc)[:400]}"
            failed.append(name)
        row["sec"] = round(time.perf_counter() - t0, 2)
        results[name] = row
        print(f"{name}: {'OK' if row['match'] else 'FAIL'} ({row['sec']}s)",
              flush=True)

    out = os.path.join(REPO, "GATE_SF01.json")
    with open(out, "w") as f:
        json.dump({"sf_dir": SF_DIR, "results": results}, f, indent=1,
                  sort_keys=True)
        f.write("\n")
    print(f"wrote {out}; {len(NAMES) - len(failed)}/{len(NAMES)} exact")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
