"""Remaining TPC-H query shapes (Q2,7,8,9,11,12,13,15,17,19,20,21,22) —
with queries/tpch.py and queries/analytics.py this covers all 22 TPC-H
query shapes — adapted to the driver's synthetic schema.

The test tables have no partsupp and no phone/comment/shipmode columns, so
queries that depend on them keep their *relational shape* (the thing that
matters for engine coverage: correlated scalar aggregates, outer-join
double aggregation, disjunctive join predicates, multi-level semi/anti
logic) with proxy columns: supply cost := min lineitem price per
(part, supplier); the Q22 country-code filter := nationkey set; the Q21
commit/receipt lag := latest-shipment-per-order attribution.

Numeric parity with the DuckDB oracle follows the package rule
(tansu_spark.queries.__doc__): exact DECIMAL aggregation, DOUBLE only at
the end, identical rounding on both sides.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tansu_spark.queries import query
from tansu_spark.queries.tpch import _ONE, _dec
from tansu_spark.tables import load


_REV = f"""CAST(l_extendedprice AS DECIMAL(12,2))
             * ({_ONE} - CAST(l_discount AS DECIMAL(12,2)))"""


def _rev():
    one = F.lit(1).cast("decimal(3,2)")
    return _dec("l_extendedprice") * (one - _dec("l_discount"))


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supply_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, MIN(supply_cost) AS best_cost FROM cost GROUP BY l_partkey
    )
    SELECT s_name, n_name, p_partkey, p_name,
           CAST(c.supply_cost AS DOUBLE) AS supply_cost
    FROM part
    JOIN cost c ON c.l_partkey = p_partkey
    JOIN best b ON b.l_partkey = p_partkey AND c.supply_cost = b.best_cost
    JOIN supplier ON s_suppkey = c.l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_size = 15 AND p_type = 'STANDARD'
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (TPC-H Q2 shape): correlated scalar-min
    subquery — which supplier offers each part cheapest. Supply cost is
    proxied by min lineitem price per (part, supplier) since the schema
    has no partsupp.

    Scale notes: the correlated MIN is a greatest-per-group window over
    the (part, supplier) aggregate — one shuffle on l_partkey, no
    re-join of the fact table against itself. Part filter prunes before
    the supplier/nation broadcast joins.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("supply_cost")
    )
    w = Window.partitionBy("l_partkey")
    cheapest = cost.withColumn("best", F.min("supply_cost").over(w)).filter(
        F.col("supply_cost") == F.col("best")
    )
    return (
        cheapest.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("supply_cost").cast("double").alias("supply_cost"),
        )
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(YEAR FROM l_shipdate) AS l_year,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations (TPC-H Q7 shape): bidirectional
    nation-pair filter with per-year revenue.

    Scale notes: both nation dims broadcast; the pair disjunction is a
    residual on broadcast-joined columns, so the big three-way fact join
    stays an equi-join under AQE; shipdate range is pushed to the scan.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(datetime.date(1996, 1, 1)))
        & (F.col("l_shipdate") < F.lit(datetime.date(1998, 1, 1)))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
           ROUND(CAST(SUM(CASE WHEN n2.n_name = 'NATION_5' THEN {_REV}
                               ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                 / CAST(SUM({_REV}) AS DOUBLE), 6) AS mkt_share
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
      AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
    GROUP BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): one nation's fraction of
    regional revenue for a part type, by year — conditional aggregation
    over an 8-table join.

    Scale notes: part/nation/region/supplier broadcast (all small or
    pre-filtered); numerator and denominator come out of ONE aggregation
    pass (conditional sum), not two plans; exact decimal sums, single
    double division at the end.
    """
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(datetime.date(1996, 1, 1)))
        & (F.col("o_orderdate") < F.lit(datetime.date(1998, 1, 1)))
    )
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    zero = F.lit(0).cast("decimal(12,2)")
    vol = _rev()
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(zero))
            .cast("double")
            .alias("num"),
            F.sum(vol).cast("double").alias("den"),
        )
        .select("o_year", F.round(F.col("num") / F.col("den"), 6).alias("mkt_share"))
    )


@query(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
           CAST(SUM({_REV}
                    - CAST(p_retailprice AS DECIMAL(12,2))
                      * CAST(l_quantity AS DECIMAL(12,2))
                      * CAST(0.10 AS DECIMAL(3,2))) AS DOUBLE) AS sum_profit
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (TPC-H Q9 shape): profit per supplier nation
    per year over a name-pattern part subset. Supply cost is proxied as
    10% of retail price x quantity (no partsupp.ps_supplycost in schema).

    Scale notes: the LIKE filter prunes part before broadcast; profit is
    one exact decimal expression inside a single aggregation — the 5-way
    join never materializes an intermediate wider than the select list.
    """
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    profit = _rev() - _dec("p_retailprice") * _dec("l_quantity") * F.lit(0.10).cast(
        "decimal(3,2)"
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): left outer
    join with an ON-clause residual, then a histogram of group sizes —
    two aggregation levels.

    Scale notes: the outer join shuffles on custkey once; the second
    aggregation runs on #customers rows, and its key space (order counts)
    is tiny, so partial aggregation collapses it map-side.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no, SUM({_REV}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (TPC-H Q15 shape): supplier(s) achieving the maximum
    quarterly revenue — the view + scalar-subquery-max pattern.

    Scale notes: revenue aggregates lineitem down to one row per supplier
    BEFORE any comparison; the global max is a window over that tiny
    aggregate (single partition of #suppliers rows), never a second scan
    of the fact table. Decimal revenue keeps the equality comparison
    exact in both engines.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(datetime.date(1996, 1, 1)))
        & (F.col("l_shipdate") < F.lit(datetime.date(1996, 4, 1)))
    )
    supp = load(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_revenue")
    )
    top = rev.withColumn(
        "mx", F.max("total_revenue").over(Window.partitionBy(F.lit(1)))
    ).filter(F.col("total_revenue") == F.col("mx"))
    return top.join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey")).select(
        "s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue")
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    WITH agg AS (
      SELECT l_partkey AS pk, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN agg ON pk = l_partkey
    WHERE p_brand = 'Brand#3'
      AND CAST(l_quantity AS DECIMAL(12,2)) * 5 * cnt < sq
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): lineitems below
    20% of their part's average quantity — the correlated AVG subquery.

    Scale notes: the correlated average becomes ONE aggregate of lineitem
    by partkey joined back (shuffle on l_partkey both sides — co-
    partitioned); the `qty < 0.2*avg` test is algebraically rearranged to
    `qty*5*cnt < sum` so it stays in exact integer/decimal arithmetic —
    no float-average boundary cases between engines.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    agg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_dec("l_quantity")).alias("sq"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(agg, F.col("pk") == F.col("l_partkey"))
        .filter(_dec("l_quantity") * F.lit(5) * F.col("cnt") < F.col("sq"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue, COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 40
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue (TPC-H Q19 shape): OR-of-ANDs join predicate
    mixing columns from both sides.

    Scale notes: the disjunction references both tables, so it CANNOT be
    pushed below the join — but the join itself stays a broadcast-hash
    equi-join on partkey with the disjunction as residual filter, never a
    nested loop. Per-side prunable conjuncts (p_brand IN ..., p_size,
    l_quantity bounds) are derivable by Catalyst's constraint propagation.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 40)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "tpch_q21_waiting_supplier",
    oracle="""
    WITH per_supp AS (
      SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS supp_max
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey, l_suppkey
    ),
    per_order AS (
      SELECT l_orderkey, MAX(supp_max) AS ord_max, COUNT(*) AS n_supp,
             SUM(CASE WHEN supp_max = mx THEN 1 ELSE 0 END) AS n_at_max
      FROM (SELECT *, MAX(supp_max) OVER (PARTITION BY l_orderkey) AS mx
            FROM per_supp)
      GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM per_supp p
    JOIN per_order o ON p.l_orderkey = o.l_orderkey AND p.supp_max = o.ord_max
    JOIN supplier ON s_suppkey = p.l_suppkey
    WHERE o.n_supp > 1 AND o.n_at_max = 1
    GROUP BY s_name
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape): for finished
    multi-supplier orders, blame the unique supplier whose latest shipment
    is the order's latest shipment (the schema has no commit/receipt
    dates, so "waiting" := sole latest shipper). Exercises the EXISTS +
    NOT EXISTS double-correlation as window logic.

    Scale notes: the classic formulation self-joins lineitem twice; this
    plan aggregates to (order, supplier) grain once, then resolves both
    correlated quantifiers with ONE window over l_orderkey — a single
    shuffle of the aggregate, zero fact-table self-joins.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load(spark, sf_dir, "supplier")
    per_supp = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("supp_max"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = (
        per_supp.withColumn("ord_max", F.max("supp_max").over(w))
        .withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn(
            "n_at_max",
            F.sum(F.when(F.col("supp_max") == F.col("ord_max"), 1).otherwise(0)).over(w),
        )
        .filter(
            (F.col("supp_max") == F.col("ord_max"))
            & (F.col("n_supp") > 1)
            & (F.col("n_at_max") == 1)
        )
    )
    return (
        flagged.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "tpch_q22_global_sales_opportunity",
    plan=("single_row_broadcast",),
    oracle="""
    WITH pool AS (
      SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(12,2)) AS bal
      FROM customer WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
    ),
    avg_bal AS (
      SELECT SUM(bal) AS s, COUNT(*) AS n FROM pool WHERE bal > 0
    )
    SELECT c_nationkey, COUNT(*) AS numcust, CAST(SUM(bal) AS DOUBLE) AS totacctbal
    FROM pool, avg_bal
    WHERE bal * n > s
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= DATE '1999-01-01')
    GROUP BY c_nationkey
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity (TPC-H Q22 shape): above-average-balance
    customers in a nation set with no recent orders — scalar-average
    subquery + NOT EXISTS anti-join. (Country-code substring becomes a
    nationkey set; the schema has no phone column.)

    Scale notes: `bal > avg(bal)` is rearranged to `bal*n > sum` so the
    threshold stays exact decimal; the single-row (sum,count) aggregate
    is broadcast (a 1-row nested-loop is free); the NOT EXISTS is a
    left-anti shuffle join against date-pruned orders.
    """
    nations = [0, 1, 2, 3, 4, 5, 6]
    pool = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(nations))
        .select("c_custkey", "c_nationkey", _dec("c_acctbal").alias("bal"))
    )
    avg_bal = pool.filter(F.col("bal") > 0).agg(
        F.sum("bal").alias("s"), F.count(F.lit(1)).alias("n")
    )
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(datetime.date(1999, 1, 1))
    )
    return (
        pool.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("bal") * F.col("n") > F.col("s"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal").cast("double").alias("totacctbal"),
        )
    )


@query(
    "tpch_q11_important_stock",
    plan=("single_row_broadcast",),
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty_val
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey, l_suppkey
    ),
    tot AS (SELECT SUM(qty_val) AS total FROM ps)
    SELECT l_partkey AS p_key, CAST(SUM(qty_val) AS DOUBLE) AS stock_value
    FROM ps, tot
    GROUP BY l_partkey, total
    HAVING SUM(qty_val) > total * CAST(0.001 AS DECIMAL(4,3))
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock identification (TPC-H Q11 shape): parts whose
    supply value from one nation exceeds a fraction of the nation's total
    — the HAVING-against-scalar-subquery pattern. Stock value is proxied
    by supplied quantity (no partsupp.ps_availqty in schema).

    Scale notes: the (part, supplier) rollup shuffles lineitem once; the
    grand total is a second aggregation of that small rollup broadcast
    back as a single row (free nested-loop); the threshold comparison is
    exact decimal.
    """
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    li = load(spark, sf_dir, "lineitem")
    ps = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty_val"))
    )
    tot = ps.agg(F.sum("qty_val").alias("total"))
    return (
        ps.crossJoin(F.broadcast(tot))
        .groupBy(F.col("l_partkey").alias("p_key"), "total")
        .agg(F.sum("qty_val").alias("sv"))
        .filter(F.col("sv") > F.col("total") * F.lit(0.001).cast("decimal(4,3)"))
        .select("p_key", F.col("sv").cast("double").alias("stock_value"))
    )


@query(
    "tpch_q12_shipmode_priority",
    oracle="""
    SELECT CASE l_linenumber % 3 WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP'
                ELSE 'TRUCK' END AS shipmode,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_linenumber % 3 IN (0, 1)
      AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
    GROUP BY shipmode
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping modes and order priority (TPC-H Q12 shape): priority-class
    conditional counts per ship mode for slow shipments. Ship mode is
    derived from l_linenumber (no l_shipmode column); "late" is proxied
    as shipped 60+ days after order (no commit/receipt dates).

    Scale notes: the mode filter halves the scan output before the join;
    both CASE counts come from one aggregation pass; the non-equi
    late-shipment predicate rides the equi-join on orderkey as residual.
    """
    mode = (
        F.when(F.col("l_linenumber") % 3 == 0, "MAIL")
        .when(F.col("l_linenumber") % 3 == 1, "SHIP")
        .otherwise("TRUCK")
    )
    li = load(spark, sf_dir, "lineitem").filter((F.col("l_linenumber") % 3).isin(0, 1))
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(mode.alias("shipmode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q20_part_promotion",
    oracle="""
    WITH agg AS (
      SELECT l_suppkey, l_partkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%gear%'
        AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      GROUP BY l_suppkey, l_partkey
    ),
    ptot AS (SELECT l_partkey, SUM(sq) AS pt FROM agg GROUP BY l_partkey),
    major AS (SELECT DISTINCT l_suppkey FROM agg JOIN ptot USING (l_partkey)
              WHERE sq * 4 > pt)
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_4'
      AND EXISTS (SELECT 1 FROM major WHERE major.l_suppkey = s_suppkey)
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion (TPC-H Q20 shape): suppliers in one nation
    holding a major share (>25%) of any watched part's yearly supply —
    the nested EXISTS-over-aggregate pattern. Share-of-part replaces the
    availqty comparison (no partsupp in schema).

    Scale notes: lineitem aggregates once to (supplier, part) grain; the
    per-part total is a second rollup of that aggregate joined back on
    l_partkey (co-partitioned — same key, no extra shuffle under AQE);
    the supplier filter is a broadcast semi join of the tiny survivor set.
    """
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(datetime.date(1996, 1, 1)))
        & (F.col("l_shipdate") < F.lit(datetime.date(1997, 1, 1)))
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    agg = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("sq"))
    )
    ptot = agg.groupBy("l_partkey").agg(F.sum("sq").alias("pt"))
    major = (
        agg.join(ptot, "l_partkey")
        .filter(F.col("sq") * F.lit(4) > F.col("pt"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(major), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "tpch_nation_revenue_share",
    oracle=f"""
    WITH rev AS (
      SELECT r_name AS region, n_name AS nation,
             CAST(SUM({_REV}) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      GROUP BY r_name, n_name)
    SELECT region, nation, revenue,
           round(revenue / sum(revenue) OVER (PARTITION BY region), 6)
             AS region_share
    FROM rev
    """,
)
def tpch_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total contribution: each supplier nation's revenue and
    its share WITHIN its region — the window-over-aggregate pattern
    (share-of-parent) every BI rollup needs.

    The window runs over the already-aggregated (region, nation) frame —
    dozens of rows — so the share pass is free; revenue itself is
    decimal-exact before the single double division. Dims broadcast;
    one fact shuffle total."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    rev = (
        li.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(3,2)") - _dec("l_discount"))
            )
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.partitionBy("region")
    return rev.select(
        "region",
        "nation",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6).alias(
            "region_share"
        ),
    )
