"""Local replica of the driver's correctness gate: run EVERY entry of
``__spark_entry__.queries()`` (in rotation order, like the driver) against
its ``oracle_sql()`` via DuckDB at sf0.01, comparing sorted-column
value-hashes — the same method the driver records in CORRECTNESS_r{N}.json.

Run before certifying a round:  python tools/gate_sim.py [out.json]
Writes the per-query result table (default CORRECTNESS_preview.json next
to this repo's root) and exits non-zero if any oracled query mismatches.
"""

from __future__ import annotations

import hashlib
import json
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

    import __spark_entry__ as e
    from tansu_spark.session import get_spark

    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "CORRECTNESS_preview.json"
    )
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    print("entry rows:", len(e.entry(spark).collect()), flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs, osql = e.queries(), e.oracle_sql()

    def h(d):
        return hashlib.md5(d.astype(str).to_csv().encode()).hexdigest()

    def norm(d):
        return (
            d.reindex(sorted(d.columns), axis=1)
            .sort_values(by=sorted(d.columns))
            .reset_index(drop=True)
        )

    results: dict[str, dict] = {}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
            if name not in osql:
                results[name] = {"rows": len(sdf), "status": "rows-only"}
                print(name, "rows-only", len(sdf), flush=True)
                continue
            odf = con.execute(osql[name]).df()
            sdf, odf = norm(sdf), norm(odf)
            ok = list(sdf.columns) == list(odf.columns) and h(sdf) == h(odf)
            results[name] = {
                "rows": len(sdf),
                "oracle_rows": len(odf),
                "status": "MATCH" if ok else "MISMATCH",
                "sec": round(time.time() - t0, 2),
            }
            print(
                name,
                "MATCH" if ok else f"MISMATCH rows {len(sdf)}/{len(odf)}",
                f"{time.time() - t0:.1f}s",
                flush=True,
            )
        except Exception as ex:  # noqa: BLE001 — record, keep sweeping
            results[name] = {"status": "ERROR", "err": str(ex)[:300]}
            print(name, "ERROR", str(ex)[:200], flush=True)

    # Run metadata (r9 verdict ask #5): make the preview's scope auditable
    # without git archaeology — which SF it ran at, how many registry
    # entries existed, and when.
    results["_meta"] = {
        "sf_dir": SF_DIR,
        "sf": float(os.path.basename(SF_DIR.rstrip("/")).removeprefix("sf"))
        if os.path.basename(SF_DIR.rstrip("/")).startswith("sf")
        else None,
        "registry_size": len(qs),
        "oracled": len(osql),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
    }
    json.dump(results, open(out_path, "w"), indent=1)
    bad = [
        n
        for n, r in results.items()
        if n != "_meta" and r["status"] not in ("MATCH", "rows-only")
    ]
    print("TOTAL", len(results) - 1, "BAD", len(bad), bad, flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
