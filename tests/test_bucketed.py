"""Bucketed co-located joins: the shuffle-elimination property must be
visible in the executed plan — a join of two tables bucketed on the same
key with the same bucket count plans with ZERO Exchange operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from tansu_spark.operators.bucketed import bucketed_join, write_bucketed
from tansu_spark.tables import load


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    try:
        write_bucketed(orders, "b_orders", ["o_custkey"], 8, sort_cols=["o_custkey"])
        write_bucketed(
            cust.withColumnRenamed("c_custkey", "o_custkey"),
            "b_customer",
            ["o_custkey"],
            8,
            sort_cols=["o_custkey"],
        )
        joined = bucketed_join(spark, "b_orders", "b_customer", "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # the whole point

        # and it computes the right thing
        n = joined.count()
        expected = orders.join(
            cust, orders.o_custkey == cust.c_custkey
        ).count()
        assert n == expected

        # an UNbucketed version of the same join DOES exchange both sides
        plain = (
            spark.table("b_orders")
            .hint("merge")
            .join(
                cust.withColumnRenamed("c_custkey", "o_custkey").hint("merge"),
                "o_custkey",
            )
        )
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
