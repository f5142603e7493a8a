"""Semi-join reduction (operators/prefilter.py): result parity with the
plain join, the broadcast-semi plan shape, and the cardinality guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from tansu_spark.operators.prefilter import semi_reduced_join


def _frames(spark):
    fact = spark.createDataFrame(
        [(k % 50, k, float(k)) for k in range(2000)], "key int, id int, v double"
    )
    # Dim matches only 3 of the 50 fact keys — the selective-join regime.
    dim = spark.createDataFrame(
        [(3, "a"), (17, "b"), (42, "c"), (17, "b2")], "key int, tag string"
    )
    return fact, dim


def test_semi_reduced_join_matches_plain_join(spark):
    fact, dim = _frames(spark)
    got = semi_reduced_join(fact, dim, on="key")
    want = fact.join(dim, "key", "inner")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() == 3 * 40 + 40  # key 17 matches two dim rows


def test_semi_reduced_join_plan_has_broadcast_semi_stage(spark):
    # Force the main join to shuffle (the scenario the operator exists
    # for: dim rows too wide to broadcast, keys small) and check the fact
    # is pre-filtered by a broadcast LeftSemi before the shuffle join.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fact, dim = _frames(spark)
        plan = semi_reduced_join(fact, dim, on="key")._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan and "Broadcast" in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_semi_reduced_join_guard_falls_back(spark):
    fact, dim = _frames(spark)
    got = semi_reduced_join(fact, dim, on="key", max_broadcast_keys=1)
    want = fact.join(dim, "key", "inner")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_semi_reduced_join_composite_keys(spark):
    fact = spark.createDataFrame(
        [(i % 5, i % 3, i) for i in range(300)], "a int, b int, id int"
    )
    dim = spark.createDataFrame([(1, 2, "x"), (4, 0, "y")], "a int, b int, t string")
    got = semi_reduced_join(fact, dim, on=["a", "b"])
    want = fact.join(dim, ["a", "b"], "inner")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
