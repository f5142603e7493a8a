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
        for a, x in zip((g["approx_p50"], g["approx_p90"]), e["pcts"]):
            assert e["lo"] <= a <= e["hi"], et
            assert abs(a - x) <= 0.05 * spread + 1e-9, et


def test_asof_forward_inclusive_and_unmatched(spark):
    """Forward as-of: earliest right at/after the probe time; equal
    timestamps match (inclusive); probes after the last right row are
    dropped on inner / null-extended on left."""
    from tansu_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2026-01-01 10:00:00"), (2, "2026-01-01 12:00:00"),
         (3, "2026-01-01 23:00:00")],
        "eid int, ts string",
    ).selectExpr("eid", "CAST(ts AS TIMESTAMP) AS ts", "1 AS k")
    right = spark.createDataFrame(
        [("2026-01-01 12:00:00", "noon"), ("2026-01-01 18:00:00", "evening")],
        "rt string, tag string",
    ).selectExpr("CAST(rt AS TIMESTAMP) AS rt", "tag", "1 AS k")

    inner = asof_join(left, right, on="k", left_time="ts", right_time="rt",
                      how="inner", direction="forward")
    got = {r["eid"]: r["tag"] for r in inner.collect()}
    assert got == {1: "noon", 2: "noon"}  # eid 3 has no later order

    outer = asof_join(left, right, on="k", left_time="ts", right_time="rt",
                      how="left", direction="forward")
    got = {r["eid"]: r["tag"] for r in outer.collect()}
    assert got == {1: "noon", 2: "noon", 3: None}


def test_bigrams_builder_edges(spark):
    """bigrams(): n tokens -> n-1 pairs; single-token and empty docs give
    an empty list (never a null-padded fake pair); stays codegen-safe
    with no conditional wrapper."""
    from tansu_spark.functions.text import bigrams, tokens

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "solo"), (3, ""), (4, "  x   y  ")],
        "id int, text string",
    ).select("id", tokens("text").alias("t"))
    got = {r["id"]: r["bg"] for r in df.select("id", bigrams("t").alias("bg")).collect()}
    assert got[1] == ["a b", "b c", "c d"]
    assert got[2] == []
    assert got[3] == []
    assert got[4] == ["x y"]


def test_bigram_lm_score_invariants(spark, sf_dir):
    """Self-trained model: known_frac in [0,1], cond_score in (0,1],
    sums consistent, every document represented exactly once."""
    from tansu_spark.queries import QUERIES
    from tansu_spark.tables import load

    out = QUERIES["text_bigram_lm_score"](spark, sf_dir).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    assert len(out) == n_docs
    for r in out:
        assert r["n_known"] <= r["n_bigrams"]
        assert r["sum_bigram_cnt"] <= r["sum_context_cnt"]
        if r["n_bigrams"] == 0:
            assert r["known_frac"] is None and r["cond_score"] is None
        else:
            assert 0.0 <= r["known_frac"] <= 1.0
            if r["n_known"]:
                assert 0.0 < r["cond_score"] <= 1.0
