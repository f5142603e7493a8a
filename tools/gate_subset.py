"""Oracle check for a SUBSET of queries — identical comparison method to
tools/gate_sim.py (sorted-column value hash vs DuckDB at sf0.01), for
fast verify-as-you-optimize loops in the optimization rounds.

Usage: python tools/gate_subset.py q1 q2 ...     # default sf0.01
       SPARK_GRAFT_GATE_SF_DIR=/root/testdata/sf0.001 python tools/gate_subset.py q1
Exits non-zero on any MISMATCH/ERROR.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import duckdb

    from tansu_spark.queries import ORACLE, QUERIES
    from tansu_spark.session import get_spark

    names = sys.argv[1:]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    def h(d):
        return hashlib.md5(d.astype(str).to_csv().encode()).hexdigest()

    def norm(d):
        return (
            d.reindex(sorted(d.columns), axis=1)
            .sort_values(by=sorted(d.columns))
            .reset_index(drop=True)
        )

    bad = []
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, SF_DIR).toPandas()
            if name not in ORACLE:
                print(f"{name} rows-only {len(sdf)}", flush=True)
                continue
            odf = con.execute(ORACLE[name]).df()
            sdf, odf = norm(sdf), norm(odf)
            ok = list(sdf.columns) == list(odf.columns) and h(sdf) == h(odf)
            print(
                f"{name} {'MATCH' if ok else f'MISMATCH rows {len(sdf)}/{len(odf)}'}"
                f" {time.time() - t0:.1f}s",
                flush=True,
            )
            if not ok:
                bad.append(name)
        except Exception as ex:  # noqa: BLE001
            print(f"{name} ERROR {str(ex)[:300]}", flush=True)
            bad.append(name)
    print("BAD", bad, flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
