"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tansu_spark.queries import QUERIES  # noqa: E402
from tansu_spark.session import get_spark  # noqa: E402

# Headline set: the bench measures end-to-end wall time per query
# (plan + execute + collect) at sf0.1.
HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q18_large_volume_customer",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="tansu-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in QUERIES]
    # Include every other registered query too — coverage at bench scale.
    names += [n for n in sorted(QUERIES) if n not in names]

    # Warm up the JVM + parquet footer cache on the smallest query.
    QUERIES[names[0]](spark, sf_dir).collect()

    def release_cached() -> None:
        # Iterative operators (connected components, k-means IVF) pin
        # localCheckpoint blocks that outlive their query; drop them so
        # query N+1 is not taxed by query N's leftovers.
        spark.catalog.clearCache()
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()._2().unpersist(False)

    timings: dict[str, float] = {}
    for name in names:
        release_cached()
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
