"""Error-bound checks for the approximate (rows-only) queries: the sketch
estimates must land within their documented bounds of the exact values."""

from __future__ import annotations

from pyspark.sql import functions as F

from tansu_spark.queries import QUERIES
from tansu_spark.tables import load


def test_approx_aggregates_within_bounds(spark, sf_dir):
    got = {r["event_type"]: r for r in QUERIES["events_approx_aggregates"](spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.percentile("value", F.lit([0.5, 0.9])).alias("pcts"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for et, g in got.items():
        e = exact[et]
        # HLL++ with rsd=1%: allow 5 sigma.
        assert abs(g["approx_users"] - e["users"]) <= max(3, 0.05 * e["users"]), et
        # KLL with accuracy 10000: rank error <= 1e-4; value must sit
        # inside the column range and near the exact quantile.
        spread = e["hi"] - e["lo"]
        for a, x in zip(g["approx_p50_p90"], e["pcts"]):
            assert e["lo"] <= a <= e["hi"], et
            assert abs(a - x) <= 0.05 * spread + 1e-9, et
