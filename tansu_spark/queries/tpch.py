"""TPC-H-style analytical queries over the driver test tables.

These are the bench headliners: the reference's analytics hand-off is "the
lake table is queryable by anything that reads Parquet" (README.md:163 shows
DuckDB over the lake), so the parity claim for the analytics half of the
engine is: standard warehouse queries over the lake parquet produce
oracle-identical results, with plans that scale (broadcast dims, partial
aggregation, pushed-down filters).

Numeric parity: see tansu_spark.queries.__doc__. DECIMAL(12,2) casts keep
products within both engines' 38-digit cap; final cast to DOUBLE is
deterministic in both.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tansu_spark.queries import query
from tansu_spark.tables import load


def _dec(c: str):
    return F.col(c).cast("decimal(12,2)")


_ONE = "CAST(1 AS DECIMAL(3,2))"


@query(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * ({_ONE} - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * ({_ONE} - CAST(l_discount AS DECIMAL(12,2)))
                    * ({_ONE} + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape).

    Scale notes: single scan of lineitem with the shipdate predicate pushed
    to parquet; partial (map-side) aggregation on the low-cardinality
    (returnflag, linestatus) keys means the shuffle moves ~#groups rows per
    partition, not data. Survives 100x scale trivially.
    """
    li = load(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(3,2)")
    disc_price = _dec("l_extendedprice") * (one - _dec("l_discount"))
    charge = disc_price * (one + _dec("l_tax"))
    out = (
        li.filter(F.col("l_shipdate") <= F.lit(datetime.date(1998, 9, 2)))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
            F.sum(_dec("l_discount")).cast("double").alias("sum_disc"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            (F.col("sum_qty") / F.col("count_order")).alias("avg_qty"),
            (F.col("sum_base_price") / F.col("count_order")).alias("avg_price"),
            (F.col("sum_disc") / F.col("count_order")).alias("avg_disc"),
            "count_order",
        )
    )
    return out


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * ({_ONE} - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1997-06-01'
      AND l_shipdate > DATE '1997-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority (TPC-H Q3 shape): top-10 unshipped orders by value.

    Scale notes: filters reach both scans; the joins are left to AQE —
    at bench scale the filtered orders⋈customer side auto-broadcasts
    (< autoBroadcastJoinThreshold), at 100 TB it becomes a shuffle join
    with skew handling. Forcing broadcast() here would OOM a real cluster.
    Deterministic tiebreak (l_orderkey) keeps the LIMIT stable across
    engines and partitionings.
    """
    cutoff = datetime.date(1997, 6, 1)
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit(cutoff))
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit(cutoff))
    one = F.lit(1).cast("decimal(3,2)")
    revenue = _dec("l_extendedprice") * (one - _dec("l_discount"))
    return (
        li.join(
            orders.join(cust, F.col("c_custkey") == F.col("o_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * ({_ONE} - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume (TPC-H Q5 shape).

    Scale notes: region/nation are fixed-cardinality dims → explicit
    broadcast; customer/supplier/orders are large at 100 TB, so their
    joins are declared plainly and AQE broadcast-converts them when the
    runtime size allows. The c_nationkey = s_nationkey local-supplier
    predicate rides the supplier equi-join.
    """
    one = F.lit(1).cast("decimal(3,2)")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(datetime.date(1996, 1, 1)))
        & (F.col("o_orderdate") < F.lit(datetime.date(1997, 1, 1)))
    )
    li = load(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * (one - _dec("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting revenue change (TPC-H Q6 shape): pure scan-filter-agg.

    Scale notes: every predicate reaches the parquet scan (PushedFilters);
    single partial+final agg, no shuffle of data rows at all.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(datetime.date(1996, 1, 1)))
            & (F.col("l_shipdate") < F.lit(datetime.date(1997, 1, 1)))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * ({_ONE} - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-07-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned item reporting (TPC-H Q10 shape): top-20 customers by lost
    revenue.

    Scale notes: the o_orderdate window and l_returnflag predicates reach
    their scans; nation (25 rows) is explicitly broadcast; the big joins
    and the customer-grain aggregation shuffle under AQE; TakeOrdered
    top-k instead of full sort.
    """
    one = F.lit(1).cast("decimal(3,2)")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(datetime.date(1996, 1, 1)))
        & (F.col("o_orderdate") < F.lit(datetime.date(1996, 7, 1)))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = _dec("l_extendedprice") * (one - _dec("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q18_large_volume_customer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customer (TPC-H Q18 shape): orders above a quantity
    threshold.

    Scale notes: the heavy part is the per-order quantity rollup — done
    FIRST as a partial-agg-friendly groupBy on lineitem alone (shuffle on
    l_orderkey). The HAVING filter drops ~all groups, so the survivor set
    is tiny and AQE broadcast-converts it into the orders/customer joins
    (broadcasting the *aggregated* side, never the raw fact tables).
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 150)
    )
    return (
        orders.join(F.broadcast(big), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("decimal(12,2)").cast("double").alias("o_totalprice"),
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )
