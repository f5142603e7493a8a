"""Round-10 plan audit: capture explain("formatted") for EVERY registry
query and flag optimization-guide anti-patterns (guide §2/§3/§4/§6):

- BatchEvalPython (row-at-a-time Python UDF) anywhere
- CartesianProduct / BroadcastNestedLoopJoin on non-trivial inputs
- parquet scans with no PushedFilters while the query filters that table
- Exchange count per query (descending report)

Writes plans to plans/r10/audit/<name>.txt and a summary to stdout.
Construction-side queries (broker workflows returning collected rows)
show trivial plans — their evidence is job shapes, not this audit.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from tansu_spark.queries import QUERIES
    from tansu_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(REPO, "plans", "r10", "audit")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: PLAN ERROR {str(ex)[:120]}", flush=True)
            continue
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        n_ex = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        n_bep = len(re.findall(r"BatchEvalPython", plan))
        n_cart = len(re.findall(r"CartesianProduct", plan))
        n_bnlj = len(re.findall(r"BroadcastNestedLoopJoin", plan))
        n_scan = len(re.findall(r"Scan parquet", plan))
        no_pf = len(re.findall(r"PushedFilters: \[\]", plan))
        rows.append((name, n_ex, n_bep, n_cart, n_bnlj, n_scan, no_pf))
        print(
            f"{name}\tex={n_ex}\tbep={n_bep}\tcart={n_cart}\tbnlj={n_bnlj}"
            f"\tscan={n_scan}\tnopf={no_pf}",
            flush=True,
        )

    print("\n== top exchange counts ==", flush=True)
    for r in sorted(rows, key=lambda r: -r[1])[:20]:
        print(r, flush=True)
    bep = [r for r in rows if r[2]]
    print(f"\n== BatchEvalPython queries: {len(bep)} ==", flush=True)
    for r in bep:
        print(r, flush=True)
    cart = [r for r in rows if r[3]]
    print(f"\n== CartesianProduct queries: {len(cart)} ==", flush=True)
    for r in cart:
        print(r, flush=True)


if __name__ == "__main__":
    main()
