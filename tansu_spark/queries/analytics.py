"""Broader analytics operator coverage: semi/anti joins, conditional and
distinct aggregation, set operations, rollup, rolling windows, and the
as-of join custom operator — each oracle-checked.

The reference delegates all of these shapes to its storage engine's SQL
(SURVEY §2.3-2.7: "in Spark all of §2.3 is groupBy().agg() built-ins");
this module is the demonstration that the Spark engine covers the full
relational surface a reference user could reach through the lake."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tansu_spark.operators.asof import asof_join
from tansu_spark.queries import query
from tansu_spark.queries.kafka_ops import TOPIC_CTE
from tansu_spark.queries.tpch import _ONE, _dec
from tansu_spark.tables import load
from tansu_spark.materialize import corpus_checkpoint


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order priority checking (TPC-H Q4 shape): EXISTS → left-semi join
    with a non-equi residual condition; aggregation after the semi join
    touches only order rows."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q14_promo_revenue_share",
    oracle=f"""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2))
                      * ({_ONE} - CAST(l_discount AS DECIMAL(12,2)))
                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * ({_ONE} - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
           AS DOUBLE) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1996-06-01' AND l_shipdate < DATE '1996-07-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect (TPC-H Q14 shape): conditional aggregation over a
    fact⋈dim join; part auto-broadcasts at bench scale."""
    one = F.lit(1).cast("decimal(3,2)")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-06-01"))
        & (F.col("l_shipdate") < F.lit("1996-07-01"))
    )
    part = load(spark, sf_dir, "part")
    revenue = _dec("l_extendedprice") * (one - _dec("l_discount"))
    zero = F.lit(0).cast("decimal(12,2)")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", revenue).otherwise(zero)).cast("double")
                / F.sum(revenue).cast("double")
            ).alias("promo_share")
        )
    )


@query(
    "tpch_q16_supplier_cnt",
    oracle="""
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13'
    GROUP BY p_brand, p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship (TPC-H Q16 shape): distinct aggregation
    (two-phase distinct-then-count under the hood)."""
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#13")
    li = load(spark, sf_dir, "lineitem")
    return (
        part.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "anti_join_unsold_parts",
    oracle="""
    SELECT p_partkey, p_name
    FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
    """,
)
def anti_join_unsold_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join with residual condition: parts never
    sold in bulk (quantity > 45)."""
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return part.join(
        li, F.col("l_partkey") == F.col("p_partkey"), "left_anti"
    ).select("p_partkey", "p_name")


@query(
    "set_ops_users_vs_customers",
    oracle="""
    SELECT 'union' AS op, COUNT(*) AS n FROM (
      SELECT user_id FROM events UNION SELECT c_custkey FROM customer)
    UNION ALL
    SELECT 'intersect', COUNT(*) FROM (
      SELECT user_id FROM events INTERSECT SELECT c_custkey FROM customer)
    UNION ALL
    SELECT 'except', COUNT(*) FROM (
      SELECT c_custkey FROM customer EXCEPT SELECT user_id FROM events)
    """,
)
def set_ops_users_vs_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (SURVEY §2.7): UNION / INTERSECT / EXCEPT between the
    event-user and customer id domains, reported as one result."""
    ev = load(spark, sf_dir, "events").select(F.col("user_id").alias("id"))
    cust = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("id"))

    def tagged(op: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(op).alias("op"), "n")

    return (
        tagged("union", ev.union(cust).distinct())
        .unionByName(tagged("intersect", ev.intersect(cust)))
        .unionByName(tagged("except", cust.exceptAll(ev).distinct()))
    )


@query(
    "events_rollup_counts",
    oracle="""
    WITH t AS (SELECT event_type, CAST(event_id % 8 AS INTEGER) AS "partition",
                      value AS metric
               FROM events)
    SELECT event_type, "partition",
           COUNT(*) AS n,
           CAST(SUM(CAST(metric AS DECIMAL(12,2))) AS DOUBLE) AS metric_sum
    FROM t
    GROUP BY ROLLUP(event_type, "partition")
    -- empty-input pin: see events_cube_counts' oracle note.
    HAVING count(*) > 0
    """,
)
def events_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (event_type → partition → grand total) —
    grouping-sets aggregation the reference has no analog for."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        (F.col("event_id") % 8).cast("int").alias("partition"),
        F.col("value").alias("metric"),
    )
    return ev.rollup("event_type", "partition").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("metric")).cast("double").alias("metric_sum"),
    )


@query(
    "events_rolling_window",
    oracle="""
    WITH t AS (SELECT CAST(event_id % 8 AS INTEGER) AS "partition",
                      CAST(event_id // 8 AS BIGINT) AS "offset",
                      value AS v
               FROM events)
    SELECT "partition", "offset",
           CAST(SUM(CAST(v AS DECIMAL(12,2))) OVER w AS DOUBLE) AS rolling_sum,
           CAST(SUM(CAST(v AS DECIMAL(12,2))) OVER w AS DOUBLE) / COUNT(*) OVER w AS rolling_avg
    FROM t
    WINDOW w AS (PARTITION BY "partition" ORDER BY "offset"
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def events_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling frame aggregation: 4-row trailing sum/avg of the event metric
    per partition — decimal-exact inner sums so both engines' incremental
    window evaluation agrees bit-for-bit."""
    ev = load(spark, sf_dir, "events").select(
        (F.col("event_id") % 8).cast("int").alias("partition"),
        F.expr("event_id div 8").cast("bigint").alias("offset"),
        F.col("value").alias("v"),
    )
    w = (
        Window.partitionBy("partition")
        .orderBy("offset")
        .rowsBetween(-3, Window.currentRow)
    )
    s = F.sum(_dec("v")).over(w).cast("double")
    n = F.count(F.lit(1)).over(w)
    return ev.select(
        "partition",
        "offset",
        s.alias("rolling_sum"),
        (s / n).alias("rolling_avg"),
    )


@query(
    "asof_join_latest_order",
    oracle="""
    WITH ev AS (SELECT event_id, user_id, ts FROM events),
         od AS (SELECT o_custkey AS user_id, CAST(o_orderdate AS TIMESTAMP) AS ot,
                       o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
                FROM orders
                QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                           ORDER BY o_orderkey DESC) = 1)
    SELECT ev.event_id, ev.user_id, od.o_orderkey, od.o_totalprice
    FROM ev ASOF JOIN od ON ev.user_id = od.user_id AND ev.ts >= od.ot
    """,
)
def asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (custom operator, operators/asof.py): each event picks up
    the customer's most recent order at event time. Right side is deduped
    per (customer, date) so the as-of row is well-defined; oracle is
    DuckDB's native ASOF JOIN."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.timestamp_micros(F.expr("ts div 1000")).alias("ts"),
    )
    dedup_w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.desc("o_orderkey")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .withColumn("_rn", F.row_number().over(dedup_w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").cast("timestamp").alias("ot"),
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
    )
    return asof_join(
        ev, orders, on="user_id", left_time="ts", right_time="ot", how="inner"
    ).select("event_id", "user_id", "o_orderkey", "o_totalprice")


@query(
    "range_join_shipments_in_window",
    oracle="""
    SELECT o_orderkey, COUNT(*) AS n_shipments
    FROM orders, lineitem
    WHERE o_orderkey < 50
      AND l_shipdate >= o_orderdate
      AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
    GROUP BY o_orderkey
    """,
)
def range_join_shipments_in_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketized range join (operators/range_join.py): lineitem shipments
    falling inside each order's 30-day window — the inequality join
    rewritten as bucket-equi-join + residual filter, linear at scale where
    the naive form is a nested loop."""
    from tansu_spark.operators.range_join import range_join

    points = load(spark, sf_dir, "lineitem").select(
        F.unix_date(F.col("l_shipdate").cast("date")).cast("long").alias("pd")
    )
    odate = F.unix_date(F.col("o_orderdate").cast("date"))
    intervals = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 50)
        .select(
            "o_orderkey",
            odate.cast("long").alias("lo"),
            (odate + 30).cast("long").alias("hi"),
        )
    )
    return (
        range_join(points, intervals, "pd", "lo", "hi", bucket_width=16)
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_shipments"))
    )


@query(
    "text_tfidf_relevance",
    plan=("single_row_broadcast",),
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
                 FROM documents),
         hits AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok
                  WHERE tok IN ('spark', 'query', 'data') GROUP BY doc_id, tok),
         dfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM hits GROUP BY tok),
         n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id,
           round(SUM(tf * ln((n_docs + 1.0) / (df + 1.0))), 6) AS tfidf
    FROM hits JOIN dfreq USING (tok) CROSS JOIN n
    GROUP BY doc_id
    """,
)
def text_tfidf_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF relevance of documents against a fixed query term set —
    the search-scoring stage of a text pipeline. Term frequencies and
    document frequencies are exact integers; only the final ln/multiply is
    floating (rounded identically on both sides)."""
    from tansu_spark.functions.text import tokens

    terms = ["spark", "query", "data"]
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("tok")).filter(
        F.col("tok").isin(terms)
    )
    hits = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = hits.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
    return (
        hits.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("tf") * idf), 6).alias("tfidf"))
    )


@query(
    "events_sessionize_batch",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 14400000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_id
      FROM g
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM s GROUP BY user_id, session_id
    """,
)
def events_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a new session starts after
    a >4h silence per user. The batch twin of streaming/sessionize's
    applyInPandasWithState operator — same session boundaries, expressed
    as two chained window passes so the oracle can check it exactly.

    Scale notes: both windows share one partitioning (user_id) — a single
    shuffle; gap arithmetic is integer microseconds (no float time math);
    the final rollup is a partial-agg groupBy on (user, session)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.timestamp_micros(F.expr("ts div 1000")).alias("ts"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 14_400_000_000), 1).otherwise(0)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.withColumn("new_sess", new_sess)
        .withColumn("session_id", F.sum("new_sess").over(cum).cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


@query(
    "events_session_window",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 14400000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 4 HOUR AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's BUILT-IN session_window (vs the
    gaps-and-islands twin in events_sessionize_batch and the stateful
    streaming operator): one groupBy with a merging session key — the
    planner handles boundary merging, and the same expression works
    under a watermark in streaming. Session end is last-event + gap
    (window semantics), and a gap exactly equal to 4h starts a new
    session (touching intervals do not overlap) — the oracle mirrors
    both conventions."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.timestamp_micros(F.expr("ts div 1000")).alias("ts")
    )
    return (
        ev.groupBy("user_id", F.session_window("ts", "4 hours").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "events_tumbling_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY window_start, event_type
    """,
)
def events_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation — the batch twin of
    streaming/windowed_counts (same F.window semantics Structured
    Streaming uses with a watermark; hour buckets align identically in
    both engines).

    Scale notes: one shuffle on (window, event_type); the distinct-user
    count is the only expensive part (partial distinct aggregation);
    value sums are decimal-exact."""
    ev = load(spark, sf_dir, "events").select(
        F.timestamp_micros(F.expr("ts div 1000")).alias("ts"),
        "event_type",
        "user_id",
        "value",
    )
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(_dec("value")).cast("double").alias("value_sum"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "n_users",
            "value_sum",
        )
    )


@query(
    "events_value_percentiles",
    oracle="""
    SELECT event_type,
           -- + 0.0 normalizes IEEE -0.0: interpolation between +/-0.0
           -- elements inherits whichever zero the engine's sort put at
           -- that rank (hostile-gate find; same number either way)
           quantile_cont(value, 0.25) + 0.0 AS p25,
           quantile_cont(value, 0.50) + 0.0 AS p50,
           quantile_cont(value, 0.75) + 0.0 AS p75,
           quantile_cont(value, 0.90) + 0.0 AS p90,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event type (Spark `percentile`
    == DuckDB `quantile_cont`, verified bit-for-bit). One percentile agg
    computes the whole vector in a single pass; the per-group sort is
    in-reducer, no extra shuffle beyond the groupBy."""
    ev = load(spark, sf_dir, "events")
    pcts = F.percentile("value", F.lit([0.25, 0.5, 0.75, 0.9]))
    zero = F.lit(0.0)  # + 0.0 normalizes -0.0 ranks (see oracle note)
    return ev.groupBy("event_type").agg(
        (pcts.getItem(0) + zero).alias("p25"),
        (pcts.getItem(1) + zero).alias("p50"),
        (pcts.getItem(2) + zero).alias("p75"),
        (pcts.getItem(3) + zero).alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "events_approx_aggregates",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           count(DISTINCT user_id) AS exact_users,
           quantile_cont(value, 0.50) + 0.0 AS exact_p50,
           quantile_cont(value, 0.90) + 0.0 AS exact_p90,
           true AS estimate_within_bound
    FROM events GROUP BY event_type
    """,
)
def events_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approximate path for 100 TB interactive analytics: HLL++
    distinct users (approx_count_distinct, rsd 1%) and KLL-sketch
    quantiles (percentile_approx) per event type — single pass,
    mergeable partials, constant memory per group; the exact twins
    cost a sort or a two-level shuffle.

    HASH-GATED shape (round-5 verdict ask #4, retiring the last
    rows-only entry): sketch estimates are engine-specific by
    construction, so the query emits the EXACT values (countDistinct,
    exact percentiles — cross-engine bit-identical, the
    events_value_percentiles precedent) plus a boolean
    `estimate_within_bound` computed Spark-side from Spark's own
    sketches against those exact values. The oracle asserts the same
    exact values and literal `true` — a sketch drifting out of its
    documented error bound now FAILS the driver's hash gate, not just
    the pytest twin (test_queries_extra.py keeps the finer-grained
    per-column bound checks)."""
    ev = load(spark, sf_dir, "events")
    # Sketches + exact references; emit SCALAR columns (the driver's
    # canonicalizer cannot hash arrays). The exact countDistinct runs as
    # its OWN aggregation: mixing a distinct agg with the sketch/
    # percentile buffers would make Spark evaluate every heavy buffer
    # per (event_type, user_id) group — 100k HLL++/KLL states instead
    # of one per event type (measured 8 s → 0.6 s at sf0.1). Two scans
    # of a narrow column beat one scan with per-user sketch state.
    pcts_exact = F.percentile("value", F.lit([0.5, 0.9]))
    pcts_approx = F.percentile_approx("value", F.lit([0.5, 0.9]), F.lit(10000))
    base = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("_approx_users"),
        (pcts_exact.getItem(0) + F.lit(0.0)).alias("exact_p50"),
        (pcts_exact.getItem(1) + F.lit(0.0)).alias("exact_p90"),
        pcts_approx.getItem(0).alias("_approx_p50"),
        pcts_approx.getItem(1).alias("_approx_p90"),
        F.min("value").alias("_lo"),
        F.max("value").alias("_hi"),
    )
    users = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    # KLL's contract is a RANK guarantee (returned value's rank within
    # eps*N of the target), so the bound check measures the returned
    # element's true rank via a broadcast join-back — a value tolerance
    # (the old 5%-of-spread form) false-alarms on any heavy-tailed
    # group, where adjacent ranks sit decades apart (hostile-gate find:
    # 5 events spanning ±9.9e9 made a rank-exact answer read as
    # "out of bound").
    probes = base.select("event_type", "_approx_p50", "_approx_p90")
    ranks = (
        ev.join(F.broadcast(probes), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("value").alias("_nn"),
            F.sum((F.col("value") < F.col("_approx_p50")).cast("long")).alias("_lt50"),
            F.sum((F.col("value") <= F.col("_approx_p50")).cast("long")).alias("_le50"),
            F.sum((F.col("value") < F.col("_approx_p90")).cast("long")).alias("_lt90"),
            F.sum((F.col("value") <= F.col("_approx_p90")).cast("long")).alias("_le90"),
        )
    )
    agg = base.join(users, "event_type").join(ranks, "event_type")
    slack = F.greatest(F.lit(1.0), F.col("_nn") / 10000.0)

    def rank_ok(q: float, lt: str, le: str):
        target = F.ceil(F.lit(q) * F.col("_nn"))
        return (target >= F.col(lt) + 1 - slack) & (
            target <= F.col(le) + slack
        )

    within = F.when(F.col("_nn") == 0, F.lit(True)).otherwise(
        rank_ok(0.5, "_lt50", "_le50") & rank_ok(0.9, "_lt90", "_le90")
    ) & (
        # HLL++ rsd=1%: 5-sigma margin (same bound the pytest twin pins)
        F.abs(F.col("_approx_users") - F.col("exact_users"))
        <= F.greatest(F.lit(3.0), 0.05 * F.col("exact_users"))
    )
    return agg.select(
        "event_type",
        "n",
        "exact_users",
        "exact_p50",
        "exact_p90",
        within.alias("estimate_within_bound"),
    )


@query(
    "events_json_props_stats",
    oracle="""
    -- json_valid guard: DuckDB's ->> RAISES on malformed JSON (the
    -- hostile empty-string props) where Spark's from_json yields NULL;
    -- invalid/empty props pin to NULL k on both engines.
    WITH j AS (SELECT event_type,
                      CASE WHEN json_valid(props)
                           THEN CAST(props->>'k' AS BIGINT) END AS k
               FROM events)
    SELECT event_type,
           count(*) AS n,
           CAST(sum(k) AS BIGINT) AS k_sum,
           min(k) AS k_min,
           max(k) AS k_max,
           count(DISTINCT k) AS k_distinct
    FROM j GROUP BY event_type
    """,
)
def events_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: the `props` JSON column parsed with a
    schema'd from_json (not a per-path string UDF), then aggregated.
    Schema-driven parse means ONE parse per row regardless of how many
    fields are read, Catalyst prunes unused fields (OptimizeJsonExprs),
    and the typed column participates in codegen like any other."""
    ev = load(spark, sf_dir, "events")
    k = F.from_json("props", "k BIGINT").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.countDistinct("k").alias("k_distinct"),
        )
    )


@query(
    "events_funnel_conversion",
    plan=("single_row_broadcast",),
    oracle="""
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    v AS (SELECT user_id, min(us) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.us) AS t2, min(v.t1) AS t1
          FROM e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.us > v.t1 GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.us) AS t3, min(c.t1) AS t1
          FROM e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.us > c.t2 GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_click,
           (SELECT count(*) FROM p) AS n_purchase,
           (SELECT round(avg(t3 - t1), 6) FROM p) AS avg_us_view_to_purchase
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked strictly after the
    first view, then purchased strictly after that click — plus mean
    view→purchase latency for completers. Three per-user min-aggregations
    chained by equi-joins on user_id (uniform key, partial aggs); no
    window over the raw event stream, no self-join of the full table."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts div 1000").alias("us")
    )
    # v and c each feed two consumers (the next funnel stage and the
    # stage-count aggregate) — materialized once (optimization r10;
    # lazily each consumer replicated the whole upstream chain, 12
    # static event scans in the audit).
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
        .transform(corpus_checkpoint)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"), F.min("t1").alias("t1"))
        .transform(corpus_checkpoint)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"), F.min("t1").alias("t1"))
    )
    r1 = v.agg(F.count(F.lit(1)).alias("n_view"))
    r2 = c.agg(F.count(F.lit(1)).alias("n_click"))
    r3 = p.agg(
        F.count(F.lit(1)).alias("n_purchase"),
        F.round(F.avg(F.col("t3") - F.col("t1")), 6).alias("avg_us_view_to_purchase"),
    )
    return r1.crossJoin(r2).crossJoin(r3)


@query(
    "events_cohort_retention",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
    first AS (
      SELECT user_id, min(wk) AS cohort_wk FROM act GROUP BY user_id)
    SELECT f.cohort_wk,
           CAST(date_diff('day', f.cohort_wk, a.wk) // 7 AS BIGINT) AS week_offset,
           count(*) AS n_active_users
    FROM act a JOIN first f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted in
    each later week they return — the standard product-analytics rollup.
    One distinct (user, week) pass feeds both the cohort assignment and
    the activity join; the join key is user_id (uniform), and the final
    agg is low-cardinality (weeks x offsets). `act` is tiny relative to
    raw events, so the self-use is cheap at any scale."""
    ev = load(spark, sf_dir, "events")
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    act = ev.select("user_id", F.date_trunc("week", ts).alias("wk")).distinct()
    first = act.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        act.join(first, "user_id")
        .select(
            "cohort_wk",
            F.floor(F.datediff(F.col("wk"), F.col("cohort_wk")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .groupBy("cohort_wk", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


@query(
    "skew_salted_join",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe fact⋈dim join (operators/salt.py::salted_join): lineitem
    joined to orders on a salted key so a pathologically hot orderkey
    would spread over n_salt reducers instead of stalling one. The oracle
    is the plain join — salting is a physical rewrite, the result is
    exactly equal. (orders would be broadcast here at test scale;
    autoBroadcast is the right call when the dim FITS — salting is for
    when it does not, so the query disables broadcast via hint-free
    shuffle join on the salted composite key.)"""
    from tansu_spark.operators.salt import salted_join

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"), _dec("l_quantity").alias("qty")
    )
    od = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey"), "o_orderpriority"
    )
    return (
        salted_join(li, od, on="orderkey", n_salt=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("qty").cast("double").alias("sum_qty"),
        )
    )


@query(
    "skew_salted_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum,
           MIN(value) AS value_min,
           MAX(value) AS value_max
    FROM events
    GROUP BY event_type
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation (operators/salt.py): events grouped by the
    5-value event_type key — the worst-case hot-key shape — via salted
    two-stage aggregation. The oracle is the plain GROUP BY: salting is
    a physical rewrite, results are exactly equal (decimal sums are
    order-insensitive; count/min/max associative).

    Scale notes: stage 1 shuffles (key, salt) so no reducer sees more
    than 1/n_salt of a hot key; stage 2 merges <= n_salt partial rows
    per key — the straggler task AQE cannot split away for aggregations."""
    from tansu_spark.operators.salt import salted_agg

    ev = load(spark, sf_dir, "events")
    return salted_agg(
        ev,
        keys=["event_type"],
        aggs={
            "n": ("count", None),
            "value_sum": ("sum", _dec("value")),
            "value_min": ("min", F.col("value")),
            "value_max": ("max", F.col("value")),
        },
        n_salt=16,
    ).select(
        "event_type",
        "n",
        F.col("value_sum").cast("double").alias("value_sum"),
        "value_min",
        "value_max",
    )


@query(
    "events_pivot_type_counts",
    oracle="""
    SELECT CAST(user_id % 16 AS INTEGER) AS user_bucket,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
           CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
             AS purchase
    FROM events
    GROUP BY user_bucket
    """,
)
def events_pivot_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): event-type counts as columns per user
    bucket — Spark's .pivot() with an explicit value list, which the
    oracle expresses as conditional counts (the rewrite .pivot() itself
    performs).

    Scale notes: the explicit value list avoids pivot's extra
    distinct-values collection job; one shuffle on the bucket key."""
    ev = load(spark, sf_dir, "events").select(
        (F.col("user_id") % 16).cast("int").alias("user_bucket"), "event_type"
    )
    return (
        ev.groupBy("user_bucket")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["click", "view", "purchase"])
    )


@query(
    "events_window_functions",
    oracle="""
    SELECT event_id, user_id,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           rank() OVER w AS rnk,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           round(percent_rank() OVER w, 10) AS pct_rank,
           round(cume_dist() OVER w, 10) AS cume
    FROM events
    WHERE user_id < 40
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def events_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking/navigation window-function surface (lag, lead,
    rank, ntile, percent_rank, cume_dist) over one per-user ordered
    window — SURVEY §2.5's two window shapes generalized.

    Scale notes: all six functions share ONE window spec, so the plan is
    a single shuffle+sort on user_id; ties are broken by event_id so
    every engine orders identically."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.rank().over(w).alias("rnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 10).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 10).alias("cume"),
    )


_SQL_INTERFACE = """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
"""


@query("sql_interface_orders_summary", oracle=_SQL_INTERFACE)
def sql_interface_orders_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door: the EXACT same ANSI query text runs on Spark
    (spark.sql over registered views) and on DuckDB as its own oracle —
    the reference's analytics hand-off promise ("your lake table is
    queryable by anything", README.md:163) demonstrated literally."""
    from tansu_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_INTERFACE)


@query(
    "sketch_kmv_distinct_users",
    oracle=None,  # set below — built from kmv_oracle_value_sql
)
def sketch_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch (functions/sketch.py): approximate
    distinct users per event type with an exactly-reproducible estimator
    — unlike HLL, the k-minimum-values estimate is a pure function of
    md5 hashes, so DuckDB computes the identical estimate (this is the
    'novel sketch with a real oracle' extension; accuracy rse~1/sqrt(k-2)).

    Scale notes: shuffle carries at most k hash values per group per map
    partition after partial aggregation — the mergeability production
    sketch libraries rely on, with no library dependency."""
    from tansu_spark.functions.sketch import kmv_distinct

    ev = load(spark, sf_dir, "events")
    return kmv_distinct(ev, "user_id", ["event_type"], k=64)


def _kmv_oracle() -> str:
    from tansu_spark.functions.sketch import H_SPACE, kmv_oracle_value_sql

    v = kmv_oracle_value_sql("user_id")
    return f"""
    WITH hv AS (SELECT DISTINCT event_type, {v} AS v FROM events),
         r AS (SELECT event_type, v,
                      row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn
               FROM hv),
         a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hashes,
                      MAX(CASE WHEN rn = 64 THEN v END) AS uk
               FROM r GROUP BY event_type)
    SELECT event_type, n_hashes,
           CASE WHEN n_hashes < 64 THEN CAST(n_hashes AS DOUBLE)
                ELSE round(63.0 * {float(H_SPACE)} / uk, 6) END AS est_distinct
    FROM a
    """


from tansu_spark.queries import ORACLE as _OR  # noqa: E402

_OR["sketch_kmv_distinct_users"] = _kmv_oracle()


@query(
    "sketch_hll_distinct_users",
    oracle=None,  # set below — built from hll_oracle_sql
)
def sketch_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch (functions/sketch.py::
    hll_distinct) — register-explicit and md5-hashed so, unlike
    engine-native HLLs, every intermediate replays in the oracle: the
    m=256 register table is a groupBy(group, reg).max(rank) (rank via a
    pure integer CASE ladder — no log2 rounding hazards), and the
    harmonic sum is EXACT in f64 (256 single-bit powers of two spanning
    < 53 mantissa bits), so the raw estimate is bit-identical on any
    engine or partitioning. Small-range linear counting applied as in
    the paper. Completes the sketch family next to KMV (order
    statistics), CMS (frequency), bottom-k (quantiles).

    Scale: the classic HLL win — the shuffle carries at most m register
    rows per group per map partition after partial aggregation, and
    sketches merge by max over registers."""
    from tansu_spark.functions.sketch import hll_distinct

    ev = load(spark, sf_dir, "events")
    return hll_distinct(ev, "user_id", ["event_type"])


def _hll_oracle() -> str:
    from tansu_spark.functions.sketch import hll_oracle_sql

    return hll_oracle_sql("user_id", "event_type", "events")


_OR["sketch_hll_distinct_users"] = _hll_oracle()


@query(
    "streaming_hll_state",
    oracle=None,  # set below — the BATCH sketch is the streaming oracle
)
def streaming_hll_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING HyperLogLog maintenance under the hash gate — a real
    applyInPandasWithState run (streaming/source.py::hll_by_key): the
    events stream folds each micro-batch's user hashes into per-
    event-type register arrays (256 ints of state per key) and re-emits
    the live estimate in update mode. Register-max is COMMUTATIVE and
    IDEMPOTENT, so unlike the EWMA fold the stream needs no ordering
    guarantee: the final state equals functions/sketch.py::hll_distinct
    on the same data under any batch split — which is why the oracle is
    literally the batch sketch replay (same md5 Horner hash, CASE-ladder
    rank, exact harmonic sum, linear-counting branch).

    Scale: state is m ints per key regardless of cardinality; per-batch
    work is the batch's rows. The max_by(n_seen) collapse is only the
    memory-sink dedup for multi-batch availableNow splits."""
    import os

    from tansu_spark.streaming.source import hll_by_key

    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select(
            F.col("event_type").alias("key"),
            F.col("user_id").cast("string").alias("v"),
        )
    )
    out = hll_by_key(stream)
    name = "stream_hll_oracle"
    with _scoped_shuffle_partitions(spark, 8):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("key")
        .agg(
            F.max_by(
                F.struct("regs_hit", "raw_estimate", "est_distinct"), "n_seen"
            ).alias("_f")
        )
        .select(
            F.col("key").alias("event_type"),
            F.col("_f.regs_hit").alias("regs_hit"),
            F.col("_f.raw_estimate").alias("raw_estimate"),
            F.col("_f.est_distinct").alias("est_distinct"),
        )
    )


_OR["streaming_hll_state"] = _hll_oracle()


@query(
    "sketch_hll_union_pairs",
    # the group-id pair frame is a crossJoin of two bounded group lists
    # (G rows each) — BNLJ by design, like the other broadcast models
    plan=("small_model_broadcast",),
    oracle=None,  # set below — built from the hll register CTE pieces
)
def sketch_hll_union_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL SET ALGEBRA from merged sketches (the KMV merge-pairs twin):
    per event-type pair, |A∪B| comes from the register-wise MAX of the
    two sketches — the lossless HLL merge rule — and |A∩B| by
    inclusion-exclusion, with Jaccard on top. The raw estimates stay
    bit-exact (exact harmonic sums); audience-overlap math on sketch
    state instead of raw ID sets is the production reason sketches are
    the stored representation.

    Scale: pairwise work touches only register tables (m rows per
    group), never the raw sets — G² x m rows for G groups."""
    from tansu_spark.functions.sketch import HLL_ALPHA, HLL_M, hll_registers

    ev = load(spark, sf_dir, "events")
    # Materialized once (optimization r10): the register table (m rows
    # per group) feeds the singles estimate, the type list and both
    # pair-merge sides — lazily each consumer replicated the raw-scan
    # register aggregation (16 static scans in the r10 plan audit).
    regs = hll_registers(ev, "user_id", ["event_type"]).localCheckpoint(
        eager=True
    )

    def estimate(grouped: DataFrame, keys: list[str], prefix: str) -> DataFrame:
        per = grouped.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("_hits"),
            F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("_sh"),
        )
        s = (F.lit(float(HLL_M)) - F.col("_hits")) + F.col("_sh")
        raw = F.lit(HLL_ALPHA) * F.lit(float(HLL_M * HLL_M)) / s
        zeros = F.lit(HLL_M) - F.col("_hits")
        est = F.when(
            (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
            F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros),
        ).otherwise(raw)
        return per.select(*keys, F.round(est, 6).alias(prefix))

    singles = estimate(regs, ["event_type"], "est")
    types = regs.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("g_a"))
        .crossJoin(F.broadcast(types.select(F.col("event_type").alias("g_b"))))
        .filter(F.col("g_a") < F.col("g_b"))
    )
    side_a = pairs.join(
        regs.select(F.col("event_type").alias("g_a"), "reg", "mx"), "g_a"
    )
    side_b = pairs.join(
        regs.select(F.col("event_type").alias("g_b"), "reg", "mx"), "g_b"
    )
    merged = (
        side_a.unionByName(side_b)
        .groupBy("g_a", "g_b", "reg")
        .agg(F.max("mx").alias("mx"))
    )
    u = estimate(merged, ["g_a", "g_b"], "est_union")
    ea = singles.select(F.col("event_type").alias("g_a"), F.col("est").alias("est_a"))
    eb = singles.select(F.col("event_type").alias("g_b"), F.col("est").alias("est_b"))
    inter = F.greatest(
        F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 6),
        F.lit(0.0),
    )
    return (
        u.join(ea, "g_a")
        .join(eb, "g_b")
        .select(
            "g_a",
            "g_b",
            "est_a",
            "est_b",
            "est_union",
            inter.alias("est_intersection"),
            F.round(inter / F.col("est_union"), 6).alias("jaccard"),
        )
    )


def _hll_union_oracle() -> str:
    from tansu_spark.functions.sketch import (
        _HLL_SUFFIX_SPACE,
        HLL_ALPHA,
        HLL_M,
        _rank_case_sql,
        kmv_oracle_value_sql,
    )

    m = HLL_M
    a = f"CAST({HLL_ALPHA!r} AS DOUBLE)"
    mm = f"CAST({float(m * m)!r} AS DOUBLE)"
    mf = f"CAST({float(m)!r} AS DOUBLE)"

    def est(src: str, keys: str, out: str) -> str:
        return f"""
    {out}_per AS (SELECT {keys}, CAST(count(*) AS BIGINT) AS hits,
                         ({m} - count(*)) + sum(power(2.0, -mx)) AS s
                  FROM {src} GROUP BY {keys}),
    {out} AS (SELECT {keys},
                     round(CASE WHEN {a} * {mm} / s <= {2.5 * m}
                                 AND {m} - hits > 0
                                THEN {mf} * ln({mf} / ({m} - hits))
                                ELSE {a} * {mm} / s END, 6) AS {out}_v
              FROM {out}_per)"""

    return f"""
    WITH hv AS (SELECT event_type AS g,
                       {kmv_oracle_value_sql("user_id")} AS v
                FROM events),
    parts AS (SELECT g, v // {_HLL_SUFFIX_SPACE} AS reg,
                     v % {_HLL_SUFFIX_SPACE} AS sfx
              FROM hv),
    regs AS (SELECT g, reg, max({_rank_case_sql("sfx")}) AS mx
             FROM parts GROUP BY g, reg),
    {est("regs", "g", "single")},
    tys AS (SELECT DISTINCT g FROM regs),
    prs AS (SELECT x.g AS g_a, y.g AS g_b FROM tys x JOIN tys y ON x.g < y.g),
    mrg AS (SELECT p.g_a, p.g_b, r.reg, max(r.mx) AS mx
            FROM prs p JOIN regs r ON r.g = p.g_a OR r.g = p.g_b
            GROUP BY p.g_a, p.g_b, r.reg),
    {est("mrg", "g_a, g_b", "uni")}
    SELECT u.g_a, u.g_b,
           sa.single_v AS est_a,
           sb.single_v AS est_b,
           u.uni_v AS est_union,
           greatest(round(sa.single_v + sb.single_v - u.uni_v, 6), 0.0)
             AS est_intersection,
           round(greatest(round(sa.single_v + sb.single_v - u.uni_v, 6), 0.0)
                 / u.uni_v, 6) AS jaccard
    FROM uni u
    JOIN single sa ON sa.g = u.g_a
    JOIN single sb ON sb.g = u.g_b
    """


_OR["sketch_hll_union_pairs"] = _hll_union_oracle()


@query(
    "streaming_cms_state",
    oracle=None,  # set below — the BATCH CMS oracle is the streaming oracle
)
def streaming_cms_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Count-Min sketch maintenance under the hash gate — the
    additive twin of streaming_hll_state (streaming/source.py::
    cms_by_depth): the events stream pre-hashes each record into its 4
    depth buckets JVM-side, the stateful op folds per-depth 256-long
    cell arrays by COUNT ADDITION (commutative — the final cells equal
    the batch functions/sketch.py::cms_cells under any micro-batch
    split), and the post-stream probe/min/truth report is the exact
    shape of sketch_cms_user_frequency, whose oracle this query reuses
    verbatim. Together the pair pins the two streaming-sketch merge
    laws: max (HLL) and + (CMS).

    Scale: state is depth x width longs total; per-batch work is the
    batch's rows. The max_by(n_seen) collapse is the memory-sink dedup."""
    import os

    from tansu_spark.functions.sketch import cms_estimate
    from tansu_spark.streaming.source import cms_by_depth

    depth, width = 4, 256
    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    buckets = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(str(r)),
                                    F.lit(":"),
                                    F.col("user_id").cast("string"),
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % width
                ).alias("col"),
            )
            for r in range(depth)
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select(F.explode(buckets).alias("b"))
        .select(F.col("b.r").alias("r"), F.col("b.col").alias("col"))
    )
    out = cms_by_depth(stream, width=width)
    name = "stream_cms_oracle"
    with _scoped_shuffle_partitions(spark, 8):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    cells = (
        spark.table(name)
        .groupBy("r")
        .agg(F.max_by("cells", "n_seen").alias("cells"))
        .select(
            F.col("r").alias("row"), F.posexplode("cells").alias("col", "cell")
        )
        .where(F.col("cell") > 0)
    )
    ev = load(spark, sf_dir, "events")
    probes = ev.where(F.col("user_id") < 16)
    est = cms_estimate(cells, probes, "user_id", depth=depth, width=width)
    truth = probes.groupBy(F.col("user_id").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("true_count")
    )
    return est.join(truth, "key").select(
        "key",
        "estimate",
        "true_count",
        (F.col("estimate") - F.col("true_count")).cast("long").alias("overcount"),
    )


@query(
    "events_seasonal_anomaly",
    oracle="""
    WITH pts AS (
      SELECT event_id, user_id, event_type, value,
             CAST(hour(ts) AS INTEGER) AS hod
      FROM events),
    base AS (
      SELECT hod,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(value AS DECIMAL(28,12))) AS DOUBLE) AS sv,
             CAST(sum(CAST(round(value * value, 4) AS DECIMAL(28,4)))
                  AS DOUBLE) AS svv
      FROM pts GROUP BY hod),
    stats AS (
      SELECT hod, n,
             sv / CAST(n AS DOUBLE) AS mu,
             sqrt(greatest(svv / CAST(n AS DOUBLE)
                           - (sv / CAST(n AS DOUBLE))
                             * (sv / CAST(n AS DOUBLE)), 0.0)) AS sigma
      FROM base)
    SELECT p.event_id, p.user_id, p.event_type, p.hod,
           round((p.value - s.mu) / s.sigma, 6) AS z
    FROM pts p JOIN stats s USING (hod)
    WHERE s.sigma > 0.0
      AND abs((p.value - s.mu) / s.sigma) >= 2.5
    """,
)
def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONAL-BASELINE anomaly detection — events judged against their
    HOUR-OF-DAY population (the diurnal-pattern twin of the global
    z-score pass: a midnight spike is normal at noon and vice versa;
    monitoring stacks bucket baselines by season before thresholding).
    The per-hour mean and sigma come from exact sufficient statistics
    (decimal sums, round-grid for the squared term — the OLS recipe),
    so mu/sigma are bit-identical on any partitioning and the z-scores
    replay exactly; |z| >= 2.5 flags.

    Scale: ONE partial-agg shuffle builds the 24-row baseline table,
    which broadcast-joins back to the scan — the second pass is
    map-only. Population variance (not sample) — the baseline IS the
    population here."""
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.expr("int(hour(timestamp_micros(ts div 1000)))").alias("hod"),
    )
    base = pts.groupBy("hod").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(28,12)")).cast("double").alias("sv"),
        F.sum(F.round(F.col("value") * F.col("value"), 4).cast("decimal(28,4)"))
        .cast("double")
        .alias("svv"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("sv") / nd
    sigma = F.sqrt(F.greatest(F.col("svv") / nd - mu * mu, F.lit(0.0)))
    stats = base.select("hod", mu.alias("mu"), sigma.alias("sigma"))
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        pts.join(F.broadcast(stats), "hod")
        .where((F.col("sigma") > 0.0) & (F.abs(z) >= 2.5))
        .select(
            "event_id",
            "user_id",
            "event_type",
            "hod",
            F.round(z, 6).alias("z"),
        )
    )


@query(
    "events_user_trend_ols",
    oracle="""
    WITH pts AS (
      SELECT user_id,
             epoch_us(ts) // 1000000 - 1704067200 AS x,
             value AS y
      FROM events),
    s AS (SELECT user_id,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
                 CAST(sum(CAST(round(x * y, 4) AS DECIMAL(28,4))) AS DOUBLE)
                   AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx
          FROM pts GROUP BY user_id),
    fit AS (SELECT user_id, n, sx, sy, sxy, sxx,
                   CASE WHEN n >= 2
                         AND CAST(n AS DOUBLE) * sxx
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) != 0.0
                        THEN (CAST(n AS DOUBLE) * sxy
                              - CAST(sx AS DOUBLE) * sy)
                             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   END AS slope
            FROM s)
    SELECT user_id, n,
           round(slope, 10) AS slope,
           round((sy - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 10)
             AS intercept
    FROM fit
    """,
)
def events_user_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ORDINARY LEAST SQUARES trend of event value over time —
    the grouped-regression primitive behind engagement-drift and spend-
    trajectory features — under the exact-value gate: the four sufficient
    statistics (n, Σx, Σy, Σxy, Σx²) accumulate EXACTLY (integer sums
    for the centered-epoch x; decimal sums on the round-grid for the f64
    terms — the power-iteration recipe), and the closed-form slope/
    intercept is then one fixed f64 expression over exact inputs, so the
    fit is bit-identical on any engine or partitioning. Degenerate keys
    (single event, zero time variance) yield NULL, not a crash.

    Scale: ONE partial-agg shuffle carrying five scalars per user —
    sufficient statistics are THE distributed-regression pattern (no
    per-key iteration, no matrix libs)."""
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        (F.expr("ts div 1000000000") - F.lit(1704067200)).alias("x"),
        F.col("value").alias("y"),
    )
    s = pts.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("y").cast("decimal(28,12)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 4).cast("decimal(28,4)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    denom = nd * F.col("sxx").cast("double") - sxd * sxd
    slope = F.when(
        (F.col("n") >= 2) & (denom != 0.0),
        (nd * F.col("sxy") - sxd * F.col("sy")) / denom,
    )
    fit = s.withColumn("slope", slope)
    return fit.select(
        "user_id",
        "n",
        F.round("slope", 10).alias("slope"),
        F.round(
            (F.col("sy") - F.col("slope") * sxd) / nd, 10
        ).alias("intercept"),
    )


@query(
    "streaming_tumbling_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_records
    FROM events
    GROUP BY window_start, event_type
    """,
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Structured Streaming query under the oracle: the events
    table is consumed through the streaming file source (availableNow
    trigger), aggregated with the same windowed_counts operator the live
    topic streams use, into a complete-mode memory sink — whose final
    state must equal the batch answer exactly (streaming/batch unification
    is the Spark property the engine's topic streams are built on).

    Scale notes: complete mode is for the oracle check; production topic
    streams run the same operator in update mode with a watermark so
    state is bounded (streaming/source.py::windowed_counts)."""
    import os

    from tansu_spark.streaming.source import windowed_counts

    path = os.path.join(sf_dir, "events.parquet")
    # events.ts has been TIMESTAMP(NANOS) (readable only as long, via the
    # legacy conf) or TIMESTAMP(MICROS) across testdata generations — match
    # tables.py::load and normalize either to an event-time timestamp.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    ts_is_long = schema["ts"].dataType.typeName() == "long"
    ts_col = (
        F.timestamp_micros(F.expr("ts div 1000"))
        if ts_is_long
        else F.col("ts").cast("timestamp")
    )
    # The streaming file source wants a directory: scan sf_dir with a
    # glob filter selecting only the events file.
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select(ts_col.alias("timestamp"), "event_type")
    )
    agg = windowed_counts(stream, window="1 hour", keys=["event_type"])
    name = "stream_tumbling_oracle"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.col("window.start").alias("window_start"), "event_type", "n_records"
    )



from contextlib import contextmanager


@contextmanager
def _scoped_shuffle_partitions(spark, n: int):
    """Temporarily size spark.sql.shuffle.partitions for a streaming
    run started inside the block. Stateful streaming creates one state
    store per shuffle partition; at these row counts 32 stores are pure
    overhead (measured 2.5x on the interval join), while at production
    scale the dial goes UP with key cardinality — either way it's a
    sizing knob, not a semantics change (results are partition-count
    independent, which the unchanged oracle hash proves)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@query(
    "streaming_dedup_replay",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_unique
    FROM events GROUP BY event_type
    """,
)
def streaming_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming exactly-once restore under the oracle: the events
    stream unioned with ITSELF (every record delivered twice — the
    at-least-once replay a crashed producer/consumer retry produces)
    passes through `dedup_stream`'s dropDuplicatesWithinWatermark on the
    event id, and the per-type counts of the surviving stream must equal
    the batch table exactly — duplicates fully cancelled. This is the
    streaming instantiation of idempotent produce (T3): the broker
    dedups by (producer, sequence) at the ingest edge; this operator is
    the consumer-side equivalent for pipelines that can't trust the
    edge.

    Scale: dropDuplicatesWithinWatermark keeps one state row per key
    only until the watermark passes it — bounded state on an unbounded
    topic (plain dropDuplicates would grow forever; that's the batch
    twin only). The delay is set beyond the dataset's span here so
    nothing is late and the check is exact; production picks the
    replay-horizon it actually needs."""
    import os

    from tansu_spark.streaming.source import dedup_stream

    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    ts_is_long = schema["ts"].dataType.typeName() == "long"
    ts_col = (
        F.timestamp_micros(F.expr("ts div 1000"))
        if ts_is_long
        else F.col("ts").cast("timestamp")
    )

    def src() -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .select(
                F.col("event_id"),
                ts_col.alias("timestamp"),
                F.col("event_type"),
            )
        )

    replayed = src().union(src())  # at-least-once: everything twice
    deduped = dedup_stream(
        replayed, key_cols=["event_id"], watermark="3650 days"
    )
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_unique"))
    name = "stream_dedup_oracle"
    with _scoped_shuffle_partitions(spark, 8):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).select("event_type", "n_unique")


@query(
    "streaming_interval_join",
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           c.event_id AS click_id,
           CAST(floor(epoch(p.ts)) AS BIGINT)
             - CAST(floor(epoch(c.ts)) AS BIGINT) AS lag_sec
    FROM events p JOIN events c ON p.user_id = c.user_id
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
      AND c.ts >= p.ts - INTERVAL 24 HOUR AND c.ts <= p.ts
    """,
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-stream interval join under the oracle: purchases
    joined to the same user's clicks in the 24 h BEFORE the purchase —
    attribution, the canonical two-stream correlation. Both sides are
    watermarked streams (the file source re-read twice, filtered to one
    event type each) through `stream_interval_join`; the append-mode
    result set must hash-equal the batch interval join DuckDB replays.

    Scale: the watermark + interval slack BOUND the join state — each
    side retains only rows younger than (watermark + 24 h), so state is
    O(in-flight window) on an unbounded topic, not O(history). The
    delay here exceeds the dataset's one-month span so nothing is late
    and the check is exact; production dials it to its real lateness
    budget. Key-partitioned state: the join shuffles both sides on
    user_id once — the same single-shuffle shape as the batch twin."""
    import os

    from tansu_spark.streaming.join import stream_interval_join

    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    ts_is_long = schema["ts"].dataType.typeName() == "long"
    ts_col = (
        F.timestamp_micros(F.expr("ts div 1000"))
        if ts_is_long
        else F.col("ts").cast("timestamp")
    )

    def src(event_type: str) -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .filter(F.col("event_type") == event_type)
            .select(
                "user_id", F.col("event_id"), ts_col.alias("timestamp")
            )
        )

    joined = stream_interval_join(
        src("purchase"),
        src("click"),
        key="user_id",
        l_ts="timestamp",
        r_ts="timestamp",
        lower="24 hours",
        upper="0 seconds",
        watermark="60 days",
    )
    out = joined.select(
        "user_id",
        F.col("l_event_id").alias("purchase_id"),
        F.col("r_event_id").alias("click_id"),
        (
            F.col("l_timestamp").cast("long") - F.col("r_timestamp").cast("long")
        ).alias("lag_sec"),
    )
    name = "stream_interval_join_oracle"
    with _scoped_shuffle_partitions(spark, 8):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


@query(
    "streaming_interval_join_outer",
    oracle="""
    WITH wm AS (
      SELECT date_trunc('milliseconds',
               least(max(ts) FILTER (WHERE event_type = 'purchase'),
                     max(ts) FILTER (WHERE event_type = 'click'))) AS w
      FROM events)
    SELECT p.user_id,
           p.event_id AS purchase_id,
           c.event_id AS click_id,
           CASE WHEN c.event_id IS NULL THEN NULL
                ELSE CAST(floor(epoch(p.ts)) AS BIGINT)
                     - CAST(floor(epoch(c.ts)) AS BIGINT) END AS lag_sec,
           (c.event_id IS NULL) AS unattributed
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 24 HOUR AND c.ts <= p.ts
    -- watermark semantics, replayed exactly: a NEGATIVE verdict emits
    -- only once the (ms-truncated, min-of-both-inputs) watermark passes
    -- the purchase's join-window upper bound (= p.ts, upper slack 0) —
    -- the final purchase(s) of a finite replay stay pending, just as
    -- they would on the real unbounded stream
    WHERE c.event_id IS NOT NULL OR p.ts < (SELECT w FROM wm)
    """,
)
def streaming_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT-OUTER interval join with watermark-expiry null
    padding (round-6 verdict ask #5): every purchase emits — with its
    attributed click(s), or ONCE null-padded when the watermark passes
    its 24 h lookback window and no click arrived. The negative verdict
    ("this purchase had NO click in the last 24 h") is exactly the
    output Spark can only produce for watermarked interval joins: it
    requires knowing no matching row can still arrive.

    State boundedness: each side's state retention is watermark +
    interval slack — purchases wait at most 24 h past the watermark for
    a late click, clicks are droppable once no future purchase's window
    can reach back to them. On an unbounded topic both stores hold
    O(in-flight window), not O(history). Under the availableNow replay
    the final no-data batch advances the watermark past max event time,
    so every pending negative emits and the appended result hash-equals
    the batch LEFT JOIN the oracle replays."""
    import os

    from tansu_spark.streaming.join import stream_interval_join

    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    ts_is_long = schema["ts"].dataType.typeName() == "long"
    ts_col = (
        F.timestamp_micros(F.expr("ts div 1000"))
        if ts_is_long
        else F.col("ts").cast("timestamp")
    )

    def src(event_type: str) -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .filter(F.col("event_type") == event_type)
            .select(
                "user_id", F.col("event_id"), ts_col.alias("timestamp")
            )
        )

    joined = stream_interval_join(
        src("purchase"),
        src("click"),
        key="user_id",
        l_ts="timestamp",
        r_ts="timestamp",
        lower="24 hours",
        upper="0 seconds",
        watermark="0 seconds",
        how="left_outer",
    )
    out = joined.select(
        "user_id",
        F.col("l_event_id").alias("purchase_id"),
        F.col("r_event_id").alias("click_id"),
        (
            F.col("l_timestamp").cast("long") - F.col("r_timestamp").cast("long")
        ).alias("lag_sec"),
        F.col("r_event_id").isNull().alias("unattributed"),
    )
    name = "stream_interval_join_outer_oracle"
    with _scoped_shuffle_partitions(spark, 8):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


@query(
    "streaming_interval_join_full",
    oracle="""
    WITH wm AS (
      SELECT date_trunc('milliseconds',
               least(max(ts) FILTER (WHERE event_type = 'purchase'),
                     max(ts) FILTER (WHERE event_type = 'click'))) AS w
      FROM events)
    SELECT COALESCE(p.user_id, c.user_id) AS user_id,
           p.event_id AS purchase_id,
           c.event_id AS click_id,
           CAST(floor(epoch(p.ts)) AS BIGINT)
             - CAST(floor(epoch(c.ts)) AS BIGINT) AS lag_sec,
           c.event_id IS NULL AS no_click,
           p.event_id IS NULL AS no_purchase
    FROM (SELECT user_id, event_id, ts FROM events
          WHERE event_type = 'purchase') p
    FULL JOIN (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 24 HOUR AND c.ts <= p.ts
    -- watermark semantics, replayed exactly, per side: an unmatched
    -- purchase emits once the (ms-truncated, min-of-both-inputs)
    -- watermark passes its window's upper bound (= p.ts, slack 0); an
    -- unmatched click emits once the watermark passes c.ts + 24 h (no
    -- future purchase's lookback can reach it). Negatives still inside
    -- either horizon stay pending — exactly as on the unbounded stream.
    WHERE (p.event_id IS NOT NULL AND c.event_id IS NOT NULL)
       OR (c.event_id IS NULL AND p.ts < (SELECT w FROM wm))
       OR (p.event_id IS NULL
           AND c.ts + INTERVAL 24 HOUR < (SELECT w FROM wm))
    """,
)
def streaming_interval_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-OUTER stream-stream interval join — the last cell of the
    join matrix (inner r5, left-outer r6): matched purchase-click pairs
    emit immediately; a purchase with no click in its 24 h lookback AND
    a click that attributed no purchase in its 24 h lookahead each emit
    ONCE, null-padded, when the watermark proves no partner can still
    arrive. Both negative verdicts in one pass is the shape audit
    pipelines want (unattributed spend AND dead clicks).

    State boundedness is symmetric: each side's retention is watermark +
    its interval slack, O(in-flight window) on unbounded topics. Under
    the availableNow replay the final no-data batch advances the global
    watermark to the MIN of the two sides' max event times (minus delay)
    — so negatives flush only up to that min-of-both-inputs bound;
    unmatched rows inside either side's remaining horizon stay pending,
    and the oracle's WHERE clause replays exactly that bound."""
    import os

    from tansu_spark.streaming.join import stream_interval_join

    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    ts_is_long = schema["ts"].dataType.typeName() == "long"
    ts_col = (
        F.timestamp_micros(F.expr("ts div 1000"))
        if ts_is_long
        else F.col("ts").cast("timestamp")
    )

    def src(event_type: str) -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .filter(F.col("event_type") == event_type)
            .select("user_id", F.col("event_id"), ts_col.alias("timestamp"))
        )

    joined = stream_interval_join(
        src("purchase"),
        src("click"),
        key="user_id",
        l_ts="timestamp",
        r_ts="timestamp",
        lower="24 hours",
        upper="0 seconds",
        watermark="0 seconds",
        how="full_outer",
    )
    out = joined.select(
        "user_id",
        F.col("l_event_id").alias("purchase_id"),
        F.col("r_event_id").alias("click_id"),
        (
            F.col("l_timestamp").cast("long") - F.col("r_timestamp").cast("long")
        ).alias("lag_sec"),
        F.col("r_event_id").isNull().alias("no_click"),
        F.col("l_event_id").isNull().alias("no_purchase"),
    )
    name = "stream_interval_join_full_oracle"
    with _scoped_shuffle_partitions(spark, 8):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


@query(
    "streaming_ewma_state",
    oracle="""
    WITH seq AS (
      SELECT CAST(user_id AS VARCHAR) AS key,
             list(value ORDER BY ts, event_id) AS v
      FROM events GROUP BY user_id
    )
    SELECT key,
           CAST(len(v) AS BIGINT) AS n_events,
           list_reduce(v, (a, b) -> a + 0.25*(b - a)) AS ewma,
           CASE WHEN len(v) = 1 THEN 0.0 ELSE
             list_max(list_transform(range(2, len(v) + 1),
               i -> abs(v[i] - list_reduce(v[1:i-1],
                                           (a, b) -> a + 0.25*(b - a)))))
           END AS max_deviation
    FROM seq
    """,
)
def streaming_ewma_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL applyInPandasWithState custom stateful operator under the
    hash gate: per-user EWMA + max one-step deviation over the events
    stream (streaming/source.py::ewma_by_key — three scalars of state
    per key, update-mode emission, the anomaly-detector shape the
    reference's engine cannot express). The availableNow run's final
    state row per key must be BIT-IDENTICAL to DuckDB replaying the
    same IEEE fold sequentially via list_reduce — no rounding, no
    tolerance: the stream's chunked folds composing to the batch fold
    is exactly the seeded-fold law the operator is built on.

    Oracle note: the max-deviation term needs the RUNNING ewma, and
    DuckDB 1.0's list_reduce mis-evaluates multi-field struct
    accumulators (second field sees the first field's updated value —
    probed, tools-verified), so the oracle recomputes each prefix's
    EWMA with a scalar fold: O(n^2) per key, fine for an oracle, never
    on the Spark side.

    Scale: state is (e, m, n) per key in the state store — millions of
    keys per executor; per-batch work proportional to the batch. The
    final `max_by` collapse is only the memory-sink dedup for multi-
    batch availableNow splits (update mode re-emits touched keys)."""
    import os

    from tansu_spark.streaming.source import ewma_by_key

    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    ts_is_long = schema["ts"].dataType.typeName() == "long"
    ts_col = (
        F.timestamp_micros(F.expr("ts div 1000"))
        if ts_is_long
        else F.col("ts").cast("timestamp")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select(
            F.col("user_id").cast("string").alias("key"),
            F.col("value"),
            ts_col.alias("timestamp"),
            F.col("event_id").alias("offset"),
        )
    )
    out = ewma_by_key(stream, alpha=0.25)
    name = "stream_ewma_oracle"
    with _scoped_shuffle_partitions(spark, 8):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    final = (
        spark.table(name)
        .groupBy("key")
        .agg(
            F.max_by(
                F.struct("n_events", "ewma", "max_deviation"), "n_events"
            ).alias("s")
        )
    )
    return final.select("key", "s.n_events", "s.ewma", "s.max_deviation")


@query(
    "streaming_static_enrich",
    oracle="""
    SELECT c.c_mktsegment AS segment, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS value_total
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment under the hash gate
    (streaming/source.py::enrich_stream — the streaming form of the
    reference's config-lookup join, SURVEY §2.4 J5): the events stream
    joins a BROADCAST customer dimension per micro-batch, then a
    complete-mode streaming aggregation rolls up per (segment, type).
    The static side never shuffles the stream: the join is a broadcast
    hash join inside the stream's own stage.

    Determinism: the money column sums through DECIMAL(18,6) — streaming
    partial aggregates merge in nondeterministic order, and decimal
    addition is associative-exact where double addition is not; the
    unchanged oracle hash is the proof."""
    import os

    from tansu_spark.streaming.source import enrich_stream

    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    dim = F.broadcast(
        load(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("user_id", "event_type", "value")
    )
    enriched = enrich_stream(stream, dim, on="user_id", how="inner")
    agg = enriched.groupBy("segment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("value_total"),
    )
    name = "stream_enrich_oracle"
    with _scoped_shuffle_partitions(spark, 8):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).select("segment", "event_type", "n_events", "value_total")


@query("kmv_supplier_overlap_by_brand", plan=("single_row_broadcast",), oracle=None)  # oracle built below
def kmv_supplier_overlap_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGE under the oracle: which part brands share supplier
    bases — pairwise |A|, |B|, |A∪B|, |A∩B| and Jaccard estimated from
    merged KMV sketches (k smallest of each pair's union, the KMV merge
    rule). Demonstrates the property that makes sketches matter at scale:
    after sketching, the pairwise comparison touches k longs per group,
    never the raw sets. DuckDB reproduces every estimate exactly."""
    from tansu_spark.functions.sketch import kmv_merge_pairs

    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3", "Brand#4")
    )
    df = li.filter(F.col("l_quantity") > 49).join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    return kmv_merge_pairs(df, "l_suppkey", "p_brand", k=64)


def _kmv_merge_oracle() -> str:
    from tansu_spark.functions.sketch import H_SPACE, kmv_oracle_value_sql

    v = kmv_oracle_value_sql("l_suppkey")
    est = lambda n, uk: (
        f"CASE WHEN {n} < 64 THEN CAST({n} AS DOUBLE) "
        f"ELSE round(63.0 * {float(H_SPACE)} / {uk}, 6) END"
    )
    return f"""
    WITH src AS (SELECT p_brand AS g, l_suppkey
                 FROM lineitem JOIN part ON p_partkey = l_partkey
                 WHERE p_brand IN ('Brand#1','Brand#2','Brand#3','Brand#4')
                   AND l_quantity > 49),
         hv AS (SELECT DISTINCT g, {v} AS v FROM src),
         sk AS (SELECT g, v FROM (
                  SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn
                  FROM hv) WHERE rn <= 64),
         per AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n, MAX(v) AS uk
                 FROM sk GROUP BY g),
         pairs AS (SELECT a.g AS g_a, b.g AS g_b FROM per a, per b WHERE a.g < b.g),
         merged AS (SELECT DISTINCT g_a, g_b, v FROM (
                      SELECT p.g_a, p.g_b, s.v FROM pairs p JOIN sk s ON s.g = p.g_a
                      UNION ALL
                      SELECT p.g_a, p.g_b, s.v FROM pairs p JOIN sk s ON s.g = p.g_b)),
         u AS (SELECT g_a, g_b, CAST(COUNT(*) AS BIGINT) AS n_u, MAX(v) AS uk_u
               FROM (SELECT g_a, g_b, v,
                            row_number() OVER (PARTITION BY g_a, g_b ORDER BY v) AS rn
                     FROM merged) WHERE rn <= 64
               GROUP BY g_a, g_b)
    SELECT g_a, g_b,
           {est("pa.n", "pa.uk")} AS est_a,
           {est("pb.n", "pb.uk")} AS est_b,
           {est("n_u", "uk_u")} AS est_union,
           greatest(round(({est("pa.n", "pa.uk")}) + ({est("pb.n", "pb.uk")})
                          - ({est("n_u", "uk_u")}), 6), 0.0) AS est_intersection,
           round(greatest(round(({est("pa.n", "pa.uk")}) + ({est("pb.n", "pb.uk")})
                          - ({est("n_u", "uk_u")}), 6), 0.0)
                 / ({est("n_u", "uk_u")}), 6) AS jaccard
    FROM u
    JOIN per pa ON pa.g = g_a
    JOIN per pb ON pb.g = g_b
    """


_OR["kmv_supplier_overlap_by_brand"] = _kmv_merge_oracle()


@query(
    "semi_reduced_join_urgent_orders",
    oracle="""
    SELECT o.o_orderstatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2))
                       - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 250000
    GROUP BY o.o_orderstatus
    """,
)
def semi_reduced_join_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective fact⋈dim join via semi-join reduction
    (operators/prefilter.py::semi_reduced_join): the filtered orders dim
    matches ~7% of lineitem rows, so the broadcast key-set semi filter
    drops ~93% of the fact MAP-SIDE before any shuffle — at 100 TB that
    is the difference between shuffling 100 TB and 7 TB. The oracle is
    the plain join: reduction is a physical rewrite, results are exactly
    equal."""
    from tansu_spark.operators.prefilter import semi_reduced_join

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        (_dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - _dec("l_discount"))).alias("rev"),
    )
    od = (
        load(spark, sf_dir, "orders")
        .filter((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 250000))
        .select("o_orderkey", "o_orderstatus")
    )
    return (
        semi_reduced_join(li, od, on="o_orderkey")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("rev").cast("double").alias("revenue"),
        )
    )


@query(
    "events_value_histogram",
    plan=("single_row_broadcast",),
    oracle="""
    WITH rng AS (SELECT min(value) AS vmin, max(value) AS vmax FROM events),
    b AS (SELECT CAST(least(floor((value - vmin) / ((vmax - vmin) / 20.0)), 19)
                      AS INTEGER) AS bin,
                 vmin, vmax
          FROM events, rng)
    SELECT bin,
           count(*) AS n_events,
           vmin + bin * ((vmax - vmin) / 20.0) AS bin_lo,
           vmin + (bin + 1) * ((vmax - vmin) / 20.0) AS bin_hi
    FROM b GROUP BY bin, vmin, vmax
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bin histogram of events.value — the data-profiling
    primitive behind NDV/quality dashboards and skew diagnosis. Two
    passes: a tiny min/max agg broadcast to a map-only binning pass +
    partial-agg count (the same shape at any scale; the broadcast is two
    doubles). Bin edges are pure IEEE double arithmetic — identical in
    both engines; the top edge folds into the last bin via least(),
    and the floor()ed bin is integral before the int cast, so DuckDB's
    round-on-cast never fires."""
    ev = load(spark, sf_dir, "events").select("value")
    rng = ev.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    w = (F.col("vmax") - F.col("vmin")) / F.lit(20.0)
    b = ev.crossJoin(F.broadcast(rng)).select(
        F.least(F.floor((F.col("value") - F.col("vmin")) / w), F.lit(19))
        .cast("int")
        .alias("bin"),
        "vmin",
        "vmax",
    )
    return b.groupBy("bin", "vmin", "vmax").agg(
        F.count(F.lit(1)).alias("n_events")
    ).select(
        "bin",
        "n_events",
        (F.col("vmin") + F.col("bin") * w).alias("bin_lo"),
        (F.col("vmin") + (F.col("bin") + 1) * w).alias("bin_hi"),
    )


@query(
    "events_sliding_window_counts",
    oracle="""
    WITH e AS (
      SELECT event_type, value,
             unnest([time_bucket(INTERVAL '1 hour', ts),
                     time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour'])
               AS window_start
      FROM events)
    SELECT window_start, event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
    FROM e GROUP BY window_start, event_type
    """,
)
def events_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING event-time windows (size 2h, slide 1h): each event lands in
    two overlapping hour-aligned windows — the moving-average shape
    Structured Streaming serves with the same F.window call plus a
    watermark. Spark expands windows JVM-side before one shuffle on
    (window, type); the oracle expands via unnest of the two bucket
    starts — epoch-aligned exactly like Spark's slide alignment."""
    ev = load(spark, sf_dir, "events").select(
        F.timestamp_micros(F.expr("ts div 1000")).alias("ts"),
        "event_type",
        "value",
    )
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("value_sum"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


@query(
    "events_quality_profile",
    oracle="""
    WITH m AS (SELECT count(*) AS n,
                      count(user_id) AS nn_user,
                      count(DISTINCT user_id) AS nd_user,
                      count(event_type) AS nn_type,
                      count(DISTINCT event_type) AS nd_type,
                      count(value) AS nn_value,
                      count(DISTINCT value) AS nd_value
               FROM events)
    SELECT 'user_id' AS col, n, nn_user AS n_nonnull, nd_user AS n_distinct FROM m
    UNION ALL
    SELECT 'event_type', n, nn_type, nd_type FROM m
    UNION ALL
    SELECT 'value', n, nn_value, nd_value FROM m
    """,
)
def events_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data-quality profile (null rates + exact NDV) — the
    audit a pipeline runs before training ingestion. ONE aggregate pass
    computes every metric (Spark plans multi-distinct via Expand — still
    a single scan of the fact), then the row-per-column shape is a
    literal 3-row stack, not three scans."""
    ev = load(spark, sf_dir, "events")
    m = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("user_id").alias("nn_user"),
        F.countDistinct("user_id").alias("nd_user"),
        F.count("event_type").alias("nn_type"),
        F.countDistinct("event_type").alias("nd_type"),
        F.count("value").alias("nn_value"),
        F.countDistinct("value").alias("nd_value"),
    )
    return m.select(
        F.expr(
            "stack(3, 'user_id', nn_user, nd_user,"
            " 'event_type', nn_type, nd_type,"
            " 'value', nn_value, nd_value) AS (col, n_nonnull, n_distinct)"
        ),
        "n",
    ).select("col", "n", "n_nonnull", "n_distinct")


@query(
    "events_top_spenders_per_week",
    oracle="""
    WITH wk AS (SELECT user_id,
                       date_trunc('week', ts) AS week_start,
                       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
                         AS spend
                FROM events GROUP BY user_id, date_trunc('week', ts))
    SELECT week_start, user_id, spend, rnk FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY week_start
                                        ORDER BY spend DESC, user_id)
                     AS INTEGER) AS rnk
      FROM wk)
    WHERE rnk <= 3
    """,
)
def events_top_spenders_per_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (top-3 spenders per ISO week) — the leaderboard
    shape. One partial-agg shuffle to (user, week) totals, then a rank
    window partitioned by week over the already-tiny aggregate — the
    window never sees raw events, so its state is O(users x weeks), not
    O(events). Decimal spend sums; ties broken by user_id; identical
    rank arithmetic both engines."""
    ev = load(spark, sf_dir, "events")
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    wk = (
        ev.select("user_id", F.date_trunc("week", ts).alias("week_start"), "value")
        .groupBy("user_id", "week_start")
        .agg(F.sum(_dec("value")).cast("double").alias("spend"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("week_start").orderBy(F.desc("spend"), F.asc("user_id"))
    return (
        wk.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("week_start", "user_id", "spend", "rnk")
    )


@query(
    "events_cube_counts",
    oracle="""
    SELECT event_type,
           CAST(EXTRACT(dow FROM ts) AS INTEGER) AS weekday,
           count(*) AS n,
           CAST(GROUPING(event_type) * 2 + GROUPING(weekday) AS INTEGER)
             AS gid
    FROM (SELECT event_type, ts FROM events)
    GROUP BY CUBE (event_type, weekday)
    -- empty-input pin: SQL's () grouping set emits a vacuous
    -- grand-total row (count 0) over zero input rows; Spark's cube()
    -- emits nothing. An empty corpus reports an empty cube — the
    -- HAVING drops only that vacuous row (real groups always count
    -- >= 1). Hostile-gate find.
    HAVING count(*) > 0
    """,
)
def events_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, weekday) with the grouping id — all four
    aggregation levels (detail, per-type, per-weekday, grand total) in
    ONE shuffle via Expand, exactly like the ROLLUP query but with the
    full lattice. Spark's grouping_id() bit order matches GROUPING(a)*2
    + GROUPING(b). DuckDB's dow (0=Sunday) equals Spark's dayofweek - 1."""
    ev = load(spark, sf_dir, "events")
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    return (
        ev.select(
            "event_type", (F.dayofweek(ts) - 1).cast("int").alias("weekday")
        )
        .cube("event_type", "weekday")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.grouping_id().cast("int").alias("gid"),
        )
        .select("event_type", "weekday", "n", "gid")
    )


@query(
    "asof_join_next_order",
    oracle="""
    WITH v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
         p AS (SELECT user_id, ts AS pt, event_id AS purchase_id,
                      CAST(value AS DOUBLE) AS purchase_value FROM (
                 SELECT user_id, ts, event_id, value,
                        row_number() OVER (PARTITION BY user_id, ts
                                           ORDER BY event_id DESC) AS rn
                 FROM events WHERE event_type = 'purchase') WHERE rn = 1)
    SELECT v.event_id, v.user_id, p.purchase_id, p.purchase_value
    FROM v ASOF JOIN p ON v.user_id = p.user_id AND v.ts <= p.pt
    """,
)
def asof_join_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (operators/asof.py direction='forward'): each
    view event picks up the same user's NEXT purchase at/after view time
    — the time-to-conversion shape. Same one-shuffle union+window plan
    as the backward variant with the time order reversed; the oracle is
    DuckDB's native forward ASOF JOIN (v.ts <= p.pt)."""
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", ts.alias("ts")
    )
    dedup_w = Window.partitionBy("user_id", "pt").orderBy(F.desc("purchase_id"))
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            ts.alias("pt"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").cast("double").alias("purchase_value"),
        )
        .withColumn("_rn", F.row_number().over(dedup_w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    from tansu_spark.operators.asof import asof_join

    return asof_join(
        views, purchases, on="user_id", left_time="ts", right_time="pt",
        how="inner", direction="forward",
    ).select("event_id", "user_id", "purchase_id", "purchase_value")


@query(
    "mv_incremental_event_stats",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum,
           MIN(value) AS value_min,
           MAX(value) AS value_max
    FROM events
    GROUP BY event_type
    """,
)
def mv_incremental_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized view under the exact-value gate
    (streaming/mv.py::IncrementalView): events arrive as three
    micro-batches (split by event_id hash), each merged into a
    bucket-partitioned view by rewriting only touched buckets; the final
    view must equal the from-scratch GROUP BY — the associativity
    contract (count/sum/min/max merge losslessly) checked across
    engines, not just within Spark. Decimal value sums keep the merge
    order-insensitive."""
    import shutil
    import tempfile

    from tansu_spark.streaming.mv import IncrementalView

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    scratch = tempfile.mkdtemp(prefix="mv_q_")
    try:
        view = IncrementalView(
            spark,
            f"{scratch}/v",
            ["event_type"],
            {
                "n": ("count", "*"),
                "value_sum": ("sum", "value_dec"),
                "value_min": ("min", "value"),
                "value_max": ("max", "value"),
            },
            n_buckets=8,
        )
        for i in range(3):
            batch = ev.where(F.pmod(F.hash("event_id"), F.lit(3)) == i).withColumn(
                "value_dec", _dec("value")
            )
            view.apply_batch(batch, i)
        # Zero-row source ⇒ no batch ever wrote a bucket; the view
        # correctly raises "no data yet", and the QUERY's answer is the
        # empty aggregate (matching the oracle's GROUP BY over zero
        # rows) — hostile-empty-gate pin.
        if not view._has_data():
            return spark.createDataFrame(
                [],
                "event_type string, n bigint, value_sum double,"
                " value_min double, value_max double",
            )
        return (
            view.read()
            .select(
                "event_type",
                "n",
                F.col("value_sum").cast("double").alias("value_sum"),
                "value_min",
                "value_max",
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "bucketed_join_order_totals",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n_items,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
             AS qty_sum
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey % 4 = 0
    GROUP BY o.o_orderpriority
    """,
)
def bucketed_join_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join under the exact-value gate
    (operators/bucketed.py): both sides are written bucketed on the join
    key (the shuffle paid ONCE at write time), then joined with zero
    Exchange in the plan — the warehouse pattern for a fact⋈fact join
    that repeats daily. test_bucketed.py pins the no-Exchange plan
    property; this query pins the RESULT against the plain-join oracle.
    The %4 filter keeps the scratch tables small at any SF."""
    from tansu_spark.operators.bucketed import bucketed_join, write_bucketed

    li = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 4 == 0)
        .select("l_orderkey", _dec("l_quantity").alias("qty"))
    )
    od = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 4 == 0)
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    )
    write_bucketed(li, "q_bkt_lineitem", ["l_orderkey"], 8)
    write_bucketed(od, "q_bkt_orders", ["l_orderkey"], 8)
    return (
        bucketed_join(spark, "q_bkt_lineitem", "q_bkt_orders", "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("qty").cast("double").alias("qty_sum"),
        )
    )


@query(
    "events_zscore_outliers",
    oracle="""
    WITH st AS (
      SELECT user_id, count(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s1,
             -- squares widen to DECIMAL(19,2): DuckDB's DECIMAL(12,2)
             -- product overflows INT64 at the domain edge (9.9e9^2;
             -- 19 digits is DuckDB's hugeint promotion threshold)
             -- where Spark's auto-widened DECIMAL(25,4) is exact;
             -- same scale-4 grid, wider range (hostile-gate find)
             CAST(SUM(CAST(value AS DECIMAL(19,2))
                      * CAST(value AS DECIMAL(19,2))) AS DOUBLE) AS s2
      FROM events GROUP BY user_id),
    z AS (
      SELECT e.event_id, e.user_id, e.value,
             (e.value - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)) AS z,
             n, s2 / n - (s1 / n) * (s1 / n) AS var
      FROM events e JOIN st USING (user_id))
    SELECT event_id, user_id, value, round(z, 6) AS z
    FROM z WHERE n >= 5 AND var > 0 AND abs(z) > 2.5
    """,
)
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score outlier detection — the anomaly/spam filter stage
    of a data-curation pipeline: events whose value sits more than 2.5
    population standard deviations from that user's mean.

    Numeric parity: per-user moments (Σv, Σv²) aggregate through DECIMAL
    (exact, order-independent), cast to DOUBLE once; mean/variance/sqrt
    then run the IDENTICAL expression string in both engines (sqrt is
    correctly rounded under IEEE-754, so it is safe cross-engine —
    unlike ln()). Users with n < 5 or zero variance are excluded before
    the division.

    Scale: one partial-agg shuffle to per-user moments (state O(users)),
    then a fact⋈stats equi-join that AQE broadcast-converts when the
    user dimension is small — the raw stream is never shuffled twice."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    st = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("value")).cast("double").alias("s1"),
        F.sum(_dec("value") * _dec("value")).cast("double").alias("s2"),
    )
    z = ev.join(st, "user_id").select(
        "event_id",
        "user_id",
        "value",
        F.expr("(value - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n))").alias("z"),
        F.col("n"),
        F.expr("s2 / n - (s1 / n) * (s1 / n)").alias("var"),
    )
    return z.filter(
        (F.col("n") >= 5) & (F.col("var") > 0) & (F.abs(F.col("z")) > 2.5)
    ).select("event_id", "user_id", "value", F.round("z", 6).alias("z"))


@query(
    "events_hourly_locf",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, value, date_trunc('hour', ts) AS h, ts
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'),
    hr AS (SELECT user_id, h, value FROM (
             SELECT *, row_number() OVER (PARTITION BY user_id, h
                                          ORDER BY ts DESC, event_id DESC) AS rn
             FROM e) WHERE rn = 1),
    b AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM e GROUP BY user_id),
    sp AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
           FROM b),
    j AS (SELECT sp.user_id, sp.h, hr.value
          FROM sp LEFT JOIN hr USING (user_id, h))
    SELECT user_id, h AS hour,
           last_value(value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
           CAST(CASE WHEN value IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_gap
    FROM j
    """,
)
def events_hourly_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill: each user's activity over one
    week re-sampled onto an hourly spine (that user's first..last active
    hour), carrying the last observation forward through empty hours —
    the feature-pipeline shape behind training-data snapshots and
    monitoring rollups.

    The spine is generated per user with sequence() (no calendar table to
    join), the last-per-hour pick is a deterministic (ts, event_id)
    window, and the fill is last(ignorenulls) over an ordered frame —
    values are carried verbatim (no arithmetic), so parity is exact.
    Scale: everything partitions by user_id; spine size is bounded by
    168 h/user/week, so state is O(users x hours), never O(events)."""
    from pyspark.sql import Window

    lo, hi = "2024-01-08", "2024-01-15"
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    e = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_id", "value", ts.alias("ts"))
        .filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
        .withColumn("h", F.date_trunc("hour", F.col("ts")))
        # Optimization r10 (guide §2.4): ONE hash(user_id) exchange
        # feeds the whole query — the per-hour pick, the spine
        # aggregate, the spine join and the ordered fill windows all
        # reuse this layout (HashPartitioning(user_id) satisfies every
        # downstream clustering requirement over (user_id, ...) keys),
        # collapsing the old pick-window/groupBy/join/window chain of
        # four exchanges.
        .repartition("user_id")
    )
    # Deterministic per-hour pick as an aggregate: (ts, event_id) is
    # unique, so max_by equals the old row_number()-desc window's row 1
    # without the per-(user, h) sort pass.
    hr = e.groupBy("user_id", "h").agg(
        F.max_by("value", F.struct("ts", "event_id")).alias("value")
    )
    spine = (
        e.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
        )
    )
    j = spine.join(hr, ["user_id", "h"], "left")
    fill = Window.partitionBy("user_id").orderBy("h").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return j.select(
        "user_id",
        F.col("h").alias("hour"),
        F.last("value", ignorenulls=True).over(fill).alias("value_filled"),
        F.when(F.col("value").isNull(), 1).otherwise(0).cast("int").alias("is_gap"),
    )


@query(
    "events_hourly_lerp",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, value, date_trunc('hour', ts) AS h, ts
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'),
    hr AS (SELECT user_id, h, value FROM (
             SELECT *, row_number() OVER (PARTITION BY user_id, h
                                          ORDER BY ts DESC, event_id DESC) AS rn
             FROM e) WHERE rn = 1),
    b AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM e GROUP BY user_id),
    sp AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
           FROM b),
    j AS (SELECT sp.user_id, sp.h,
                 CAST(floor(epoch(sp.h)) AS BIGINT) AS hs, hr.value
          FROM sp LEFT JOIN hr USING (user_id, h)),
    k AS (SELECT user_id, h, hs, value,
            last_value(CASE WHEN value IS NULL THEN NULL
                            ELSE {'s': hs, 'v': value} END IGNORE NULLS) OVER (
              PARTITION BY user_id ORDER BY h
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
            first_value(CASE WHEN value IS NULL THEN NULL
                             ELSE {'s': hs, 'v': value} END IGNORE NULLS) OVER (
              PARTITION BY user_id ORDER BY h
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n
          FROM j)
    SELECT user_id, h AS hour,
           CASE WHEN value IS NOT NULL THEN value
                ELSE p.v + (n.v - p.v)
                     * (CAST(hs - p.s AS DOUBLE) / CAST(n.s - p.s AS DOUBLE))
           END AS value_lerp,
           CAST(CASE WHEN value IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_gap
    FROM k
    """,
)
def events_hourly_lerp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with LINEAR interpolation — the numeric
    sibling of events_hourly_locf (LOCF carries a level; lerp
    reconstructs a trend, the right fill for rates and gauges): each
    user's week re-sampled onto an hourly spine, gap hours interpolated
    between the surrounding observed hours. Both endpoints always exist
    because the spine spans exactly first..last observed hour per user.

    Numeric parity: the interpolation is ONE shared expression —
    p + (n - p) * ((h - hp) / (hn - hp)) with integer-second inputs —
    evaluated in identical IEEE order in both engines; observed hours
    pass their value through verbatim. The prev/next anchors travel as
    (second, value) structs under last/first(IGNORE NULLS), so anchor
    time and anchor value can never come from different rows.

    Scale: identical to LOCF — everything partitions by user_id, spine
    state is O(users x 168 h), the two anchor windows are one
    partition-ordered pass each."""
    from pyspark.sql import Window

    lo, hi = "2024-01-08", "2024-01-15"
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    e = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_id", "value", ts.alias("ts"))
        .filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
        .withColumn("h", F.date_trunc("hour", F.col("ts")))
        # Optimization r10 (guide §2.4): ONE hash(user_id) exchange
        # feeds the whole query — the per-hour pick, the spine
        # aggregate, the spine join and the ordered fill windows all
        # reuse this layout (HashPartitioning(user_id) satisfies every
        # downstream clustering requirement over (user_id, ...) keys),
        # collapsing the old pick-window/groupBy/join/window chain of
        # four exchanges.
        .repartition("user_id")
    )
    # Deterministic per-hour pick as an aggregate: (ts, event_id) is
    # unique, so max_by equals the old row_number()-desc window's row 1
    # without the per-(user, h) sort pass.
    hr = e.groupBy("user_id", "h").agg(
        F.max_by("value", F.struct("ts", "event_id")).alias("value")
    )
    spine = (
        e.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
        )
    )
    j = spine.join(hr, ["user_id", "h"], "left").withColumn(
        "hs", F.col("h").cast("long")
    )
    anchor = F.when(
        F.col("value").isNotNull(),
        F.struct(F.col("hs").alias("s"), F.col("value").alias("v")),
    )
    back = Window.partitionBy("user_id").orderBy("h").rowsBetween(
        Window.unboundedPreceding, 0
    )
    fwd = Window.partitionBy("user_id").orderBy("h").rowsBetween(
        0, Window.unboundedFollowing
    )
    k = j.withColumn("p", F.last(anchor, ignorenulls=True).over(back)).withColumn(
        "n", F.first(anchor, ignorenulls=True).over(fwd)
    )
    lerp = F.col("p.v") + (F.col("n.v") - F.col("p.v")) * (
        (F.col("hs") - F.col("p.s")).cast("double")
        / (F.col("n.s") - F.col("p.s")).cast("double")
    )
    return k.select(
        "user_id",
        F.col("h").alias("hour"),
        F.when(F.col("value").isNotNull(), F.col("value"))
        .otherwise(lerp)
        .alias("value_lerp"),
        F.when(F.col("value").isNull(), 1).otherwise(0).cast("int").alias("is_gap"),
    )


@query(
    "asof_join_tolerant_order",
    oracle="""
    WITH v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
         p AS (SELECT user_id, ts AS pt, event_id AS purchase_id,
                      CAST(value AS DOUBLE) AS purchase_value FROM (
                 SELECT user_id, ts, event_id, value,
                        row_number() OVER (PARTITION BY user_id, ts
                                           ORDER BY event_id DESC) AS rn
                 FROM events WHERE event_type = 'purchase') WHERE rn = 1),
         m AS (SELECT v.event_id, v.user_id, v.ts, p.pt,
                      p.purchase_id, p.purchase_value
               FROM v ASOF JOIN p ON v.user_id = p.user_id AND v.ts >= p.pt)
    SELECT event_id, user_id, purchase_id, purchase_value
    FROM m WHERE CASE WHEN pt >= ts - INTERVAL 24 HOUR THEN 1 ELSE 0 END = 1
    """,
)
def asof_join_tolerant_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound (tolerance='24 hours'): each view
    event picks up the same user's most recent purchase ONLY if it
    happened within the last day — pandas merge_asof tolerance
    semantics, the guard that stops ancient state being carried forward
    as 'prevailing'. Same single-shuffle union+window plan as the other
    as-of variants; the matched right time rides the window fill and the
    bound is a post-filter (the oracle wraps DuckDB's native ASOF JOIN
    in a CASE filter — a bare inequality would get folded into the ASOF
    ON clause, which DuckDB rejects)."""
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", ts.alias("ts")
    )
    dedup_w = Window.partitionBy("user_id", "pt").orderBy(F.desc("purchase_id"))
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            ts.alias("pt"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").cast("double").alias("purchase_value"),
        )
        .withColumn("_rn", F.row_number().over(dedup_w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return asof_join(
        views,
        purchases,
        on="user_id",
        left_time="ts",
        right_time="pt",
        how="inner",
        tolerance="24 hours",
    ).select("event_id", "user_id", "purchase_id", "purchase_value")


@query(
    "events_value_winsorized",
    oracle="""
    WITH b AS (SELECT event_type,
                      quantile_cont(value, 0.05) AS lo,
                      quantile_cont(value, 0.95) AS hi
               FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value,
           greatest(b.lo, least(b.hi, e.value)) AS value_winsorized,
           CAST(CASE WHEN e.value < b.lo THEN -1
                     WHEN e.value > b.hi THEN 1 ELSE 0 END AS INTEGER)
             AS clipped
    FROM events e JOIN b USING (event_type)
    """,
)
def events_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (robust normalization): clip each event's value to
    its event type's exact [p5, p95] band — the outlier-squashing
    preprocessing step feature pipelines run before scaling, the clipped
    flag doubling as an outlier label.

    The percentile band is exact (Spark `percentile` == DuckDB
    quantile_cont bit-for-bit) and tiny — one row per event type — so
    the clip itself is a broadcast join plus pure greatest/least
    comparisons (no arithmetic: clipped values are carried verbatim from
    either the event or the band, so parity is exact). Two passes over
    events, one shuffle (the percentile agg)."""
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    pcts = F.percentile("value", F.lit([0.05, 0.95]))
    band = ev.groupBy("event_type").agg(
        pcts.getItem(0).alias("lo"), pcts.getItem(1).alias("hi")
    )
    return ev.join(F.broadcast(band), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.greatest("lo", F.least("hi", F.col("value"))).alias("value_winsorized"),
        F.when(F.col("value") < F.col("lo"), -1)
        .when(F.col("value") > F.col("hi"), 1)
        .otherwise(0)
        .cast("int")
        .alias("clipped"),
    )


@query(
    "sketch_bottomk_quantiles",
    oracle="""
    WITH s AS (SELECT event_type, value,
                      row_number() OVER (
                        PARTITION BY event_type
                        ORDER BY md5(event_id::VARCHAR)) AS rk
               FROM events)
    SELECT event_type,
           count(*) AS n_sample,
           quantile_cont(value, 0.50) AS p50_est,
           quantile_cont(value, 0.90) AS p90_est
    FROM s WHERE rk <= 64 GROUP BY event_type
    """,
)
def sketch_bottomk_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch via bottom-k hash sampling: per group,
    keep the 64 rows with the smallest md5(event_id) — a uniform sample
    whose membership is a pure function of the data, so (a) shards merge
    exactly (bottom-k of a union is the bottom-k of the merged bottom-ks
    — same algebra as the KMV distinct sketch) and (b) BOTH engines
    select the identical sample, making the estimate value-hash exact,
    which engine-native KLL/t-digest sketches can never be.

    Scale: the rank window partial-sorts only per group; at real scale
    the same sample falls out of a bottom-k aggregate (min_by(value,
    hash, 64)) with map-side partials — no global sort either way. The
    quantile over the fixed 64-row sample is exact interpolation."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string").cast("binary"))
    )
    samp = ev.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 64)
    pcts = F.percentile("value", F.lit([0.5, 0.9]))
    return samp.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sample"),
        pcts.getItem(0).alias("p50_est"),
        pcts.getItem(1).alias("p90_est"),
    )


@query(
    "market_basket_pairs",
    oracle="""
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           count(*) AS n_orders
    FROM lp a JOIN lp b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
    """,
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top-20 part pairs bought together
    across orders — the co-purchase-graph / association-rule building
    block (and the co-occurrence shape behind item-item recommenders).

    Scale: the self-join key is the order id, so fan-out per order is
    (lines choose 2) — bounded by basket size (~4 here), never |parts|²;
    the distinct pass first collapses repeated parts per order so the
    expansion is minimal. Pair counts partial-agg map-side and the
    ordered limit is a TakeOrdered, not a global sort."""
    lp = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = lp.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = lp.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


@query(
    "market_basket_lift",
    plan=("single_row_broadcast",),
    oracle="""
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lp),
    cnt AS (SELECT l_partkey, count(*) AS c FROM lp GROUP BY l_partkey),
    co AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                  count(*) AS n_co
           FROM lp a JOIN lp b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY a.l_partkey, b.l_partkey
           HAVING count(*) >= 2)
    SELECT part_a, part_b, n_co,
           round(CAST(n_co AS DOUBLE) / ca.c, 6) AS confidence_a_to_b,
           round(CAST(n_co AS DOUBLE) * n.n_orders
                 / (CAST(ca.c AS DOUBLE) * cb.c), 6) AS lift
    FROM co
    JOIN cnt ca ON ca.l_partkey = co.part_a
    JOIN cnt cb ON cb.l_partkey = co.part_b
    CROSS JOIN n
    ORDER BY lift DESC, part_a, part_b LIMIT 20
    """,
)
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over the co-purchase pairs: confidence
    P(b|a) and lift P(a,b)/(P(a)P(b)) for pairs co-bought at least
    twice — the scoring step that turns raw co-occurrence into
    recommendations (lift > 1 = genuinely associated, not just popular).

    All inputs are integer counts; each metric is a fixed-order double
    expression shared with the oracle, so parity is exact. The per-part
    count table is small (|parts|) and broadcasts to the pair table;
    the single-row order count rides a cross join (the histogram
    pattern)."""
    # Optimization r10: lp feeds FOUR consumers (the order count, the
    # per-part counts, both self-join sides) — materialized once, laid
    # out on the self-join key: the distinct rides the hash(l_orderkey)
    # exchange (subset of its grouping keys) and the a x b co-purchase
    # join then reads co-partitioned checkpointed rows with no further
    # exchange on the pair side.
    lp = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .repartition("l_orderkey")
        .dropDuplicates(["l_orderkey", "l_partkey"])
        .transform(corpus_checkpoint)
    )
    n = lp.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    cnt = lp.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a = lp.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = lp.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    co = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= 2)
    )
    ca = cnt.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("ca"))
    cb = cnt.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("cb"))
    return (
        co.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_co",
            F.round(F.col("n_co").cast("double") / F.col("ca"), 6).alias(
                "confidence_a_to_b"
            ),
            F.round(
                F.col("n_co").cast("double")
                * F.col("n_orders")
                / (F.col("ca").cast("double") * F.col("cb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(20)
    )


@query(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events),
    c AS (SELECT event_type, next_type, count(*) AS n
          FROM seq WHERE next_type IS NOT NULL
          GROUP BY event_type, next_type),
    tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS row_n
            FROM c GROUP BY event_type)
    SELECT c.event_type, c.next_type, c.n,
           round(CAST(c.n AS DOUBLE) / tot.row_n, 6) AS p
    FROM c JOIN tot USING (event_type)
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current) — the sequence-mining
    primitive behind behavioral models and session simulators.

    One window shuffle on user_id builds the (current, next) pairs with
    a deterministic (ts, event_id) order; transition counts partial-agg
    on a 5x5 key space and the row normalization joins a 5-row total —
    everything after the window is constant-size regardless of corpus.
    Counts are integers; each probability is one double division."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    w = Window.partitionBy("user_id").orderBy(ts.asc(), F.col("event_id").asc())
    seq = ev.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    c = seq.groupBy("event_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    tot = c.groupBy("event_type").agg(F.sum("n").cast("long").alias("row_n"))
    return c.join(tot, "event_type").select(
        "event_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("row_n"), 6).alias("p"),
    )


@query(
    "events_interarrival_stats",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id))
               AS BIGINT) AS gap_us
      FROM events)
    SELECT event_type,
           count(gap_us) AS n_gaps,
           quantile_cont(gap_us, 0.50) AS p50_gap_us,
           quantile_cont(gap_us, 0.90) AS p90_gap_us,
           CAST(min(gap_us) AS BIGINT) AS min_gap_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution per event type: per-user gaps
    between consecutive same-type events, summarized with exact
    interpolated percentiles — the burstiness/regularity profile behind
    rate-limit tuning and bot detection.

    Gaps are INTEGER microseconds (the loader's long-nanos contract div
    1000 — no float time math), the lag window orders deterministically
    by (ts, event_id), and percentile == quantile_cont bit-for-bit.
    One window shuffle on (user, type); the percentile agg runs over
    per-type gap sets."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    us = F.expr("ts div 1000")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        us.asc(), F.col("event_id").asc()
    )
    gaps = ev.select(
        "event_type", (us - F.lag(us).over(w)).cast("long").alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    pcts = F.percentile("gap_us", F.lit([0.5, 0.9]))
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        pcts.getItem(0).alias("p50_gap_us"),
        pcts.getItem(1).alias("p90_gap_us"),
        F.min("gap_us").alias("min_gap_us"),
    )


@query(
    "events_props_inferred_stats",
    oracle="""
    -- json_valid guard: see events_json_props_stats' oracle note.
    WITH j AS (SELECT event_type,
                      CASE WHEN json_valid(props)
                           THEN CAST(props->>'k' AS BIGINT) END AS k
               FROM events)
    SELECT event_type,
           count(*) AS n,
           CAST(sum(k) AS BIGINT) AS k_sum,
           CAST(avg(k) AS DOUBLE) AS k_avg,
           CAST(min(k) AS BIGINT) AS k_min,
           CAST(max(k) AS BIGINT) AS k_max
    FROM j GROUP BY event_type
    """,
)
def events_props_inferred_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-LESS semi-structured ingestion: the props JSON column's type
    is INFERRED from instance values (registry/infer.py — json/arrow.rs:
    87-148 parity: integral Number → Int64, strict NoCommonType, no
    widening) rather than declared, then the typed parse is a plain
    JVM-side from_json with the inferred StructType. The sample is one
    bounded driver-side read; the decode is map-only over the full data —
    the scale split the reference's AsArrow path makes per batch."""
    from tansu_spark.registry.infer import infer_json_strings

    ev = load(spark, sf_dir, "events")
    sample = [r[0] for r in ev.select("props").limit(500).collect()]
    inferred = infer_json_strings(sample)
    # A corpus whose sampled props never carry 'k' infers a struct
    # without that field — the stat is then NULL everywhere (the
    # from_json missing-field contract), not an analysis error.
    names = inferred.fieldNames() if hasattr(inferred, "fieldNames") else []
    if "k" in names:
        k = F.from_json("props", inferred).getField("k").cast("bigint")
    else:
        k = F.lit(None).cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("k_sum"),
            F.avg("k").cast("double").alias("k_avg"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


@query(
    "sketch_cms_user_frequency",
    oracle='\n    WITH cells AS (\n      SELECT r.r AS "row",\n             CAST(CAST(concat(\'0x\', substr(md5(concat(CAST(r.r AS VARCHAR), \':\', CAST(user_id AS VARCHAR))), 1, 8)) AS BIGINT) % 256 AS BIGINT) AS col,\n             count(*) AS cell\n      FROM events CROSS JOIN (SELECT unnest(range(4)) AS r) r\n      GROUP BY 1, 2\n    ),\n    probes AS (SELECT DISTINCT user_id FROM events WHERE user_id < 16),\n    pc AS (\n      SELECT p.user_id, r.r AS "row",\n             CAST(CAST(concat(\'0x\', substr(md5(concat(CAST(r.r AS VARCHAR), \':\', CAST(p.user_id AS VARCHAR))), 1, 8)) AS BIGINT) % 256 AS BIGINT) AS col\n      FROM probes p CROSS JOIN (SELECT unnest(range(4)) AS r) r\n    ),\n    est AS (\n      SELECT pc.user_id, min(coalesce(c.cell, 0)) AS estimate\n      FROM pc LEFT JOIN cells c USING ("row", col)\n      GROUP BY pc.user_id\n    ),\n    truth AS (SELECT user_id, count(*) AS true_count\n              FROM events WHERE user_id < 16 GROUP BY user_id)\n    SELECT t.user_id AS key,\n           CAST(e.estimate AS BIGINT) AS estimate,\n           CAST(t.true_count AS BIGINT) AS true_count,\n           CAST(e.estimate - t.true_count AS BIGINT) AS overcount\n    FROM est e JOIN truth t USING (user_id)\n    ',
)
def sketch_cms_user_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch (functions/sketch.py::cms_cells /
    cms_estimate): per-user event counts estimated from a 4x256-cell
    sketch, compared against the exact counts. md5-seeded bucket hashes
    make the sketch BIT-IDENTICAL on any engine (unlike library CMS
    implementations), so the oracle checks the estimates themselves --
    never under the truth, overcount = collisions. The third mergeable
    sketch family next to KMV distinct and bottom-k quantiles; at 100 TB
    the shuffle carries <= depth x width cells per map partition."""
    from tansu_spark.functions.sketch import cms_cells, cms_estimate

    ev = load(spark, sf_dir, "events")
    cells = cms_cells(ev, "user_id", depth=4, width=256)
    probes = ev.where(F.col("user_id") < 16)
    est = cms_estimate(cells, probes, "user_id", depth=4, width=256)
    truth = probes.groupBy(F.col("user_id").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("true_count")
    )
    return est.join(truth, "key").select(
        "key",
        "estimate",
        "true_count",
        (F.col("estimate") - F.col("true_count")).cast("long").alias("overcount"),
    )


@query(
    "text_keywords_per_doc",
    plan=("single_row_broadcast",),
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
                 FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
         n AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (
           SELECT t.doc_id, t.term, t.tf,
                  round(t.tf * (n.n_docs + 1.0) / (d.df + 1.0), 6) AS score
           FROM tf t JOIN dfreq d USING (term) CROSS JOIN n)
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, score,
           CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, term) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
)
def text_keywords_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document KEYWORD EXTRACTION: top-3 terms by tf x rational idf
    ((N+1)/(df+1) — the ln-free idf the BM25 query also uses, exact in
    both engines). The df table is the inverted-index aggregation (one
    partial-agg shuffle, map-side combine absorbs stop words); the
    per-doc rank is a window over the slim (doc, term, tf) frame. The
    standard tag-generation / topic-drift signal over a crawl."""
    from tansu_spark.functions.text import tokens

    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.round(
                F.col("tf") * (F.col("n_docs") + 1.0) / (F.col("df") + 1.0), 6
            ).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "score", F.col("rank").cast("int"))
    )


@query(
    "orders_rfm_segmentation",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(28,2)))
                  AS DOUBLE) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey,
             ntile(5) OVER (ORDER BY last_order DESC, o_custkey) AS r,
             ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f,
             ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS m,
             frequency, monetary
      FROM per_cust
    )
    SELECT r, f, m,
           count(*) AS n_customers,
           CAST(sum(frequency) AS BIGINT) AS orders,
           round(CAST(sum(CAST(monetary AS DECIMAL(28,2))) AS DOUBLE), 2) AS revenue
    FROM scored GROUP BY r, f, m
    """,
)
def orders_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (the classic CRM lattice): per customer
    recency (last order date), frequency, and decimal-exact monetary,
    quintiled with deterministic tie-breaks (customer key), aggregated to
    the 5x5x5 segment lattice. ntile follows the SQL-standard fill rule
    on both engines; monetary sums go through DECIMAL so the revenue per
    cell hashes identically. Scale note: the three ntiles are global
    sorts of the per-CUSTOMER table (|customers| rows, not |orders|) —
    at 100 TB the per-cust agg shrinks the data 10-100x before any
    sort, and each sort is a single skinny column pair."""
    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("monetary"),
    )
    from pyspark.sql import Window

    r = F.ntile(5).over(Window.orderBy(F.desc("last_order"), F.asc("o_custkey")))
    f = F.ntile(5).over(Window.orderBy(F.desc("frequency"), F.asc("o_custkey")))
    m = F.ntile(5).over(Window.orderBy(F.desc("monetary"), F.asc("o_custkey")))
    scored = per_cust.select(
        "o_custkey", "frequency", "monetary", r.alias("r"), f.alias("f"), m.alias("m")
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("frequency").cast("long").alias("orders"),
        F.round(F.sum(F.col("monetary").cast("decimal(28,2)")).cast("double"), 2).alias(
            "revenue"
        ),
    )


@query(
    "events_outliers_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           count(*) AS n,
           -- + 0.0 normalizes IEEE -0.0: a +/-0.0 TIE at the median
           -- slot sorts differently across engines (Spark's Double
           -- total order has -0.0 < 0.0; DuckDB's IEEE compare treats
           -- them equal) — same number, divergent sign bit
           round(any_value(d.med) + 0.0, 6) AS median_value,
           round(any_value(a.mad) + 0.0, 6) AS mad,
           CAST(sum(CASE WHEN d.adev > 3 * a.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           CAST(min(CASE WHEN d.adev > 3 * a.mad THEN d.value END) AS DOUBLE)
             AS min_outlier_value
    FROM dev d JOIN mad a USING (event_type)
    GROUP BY d.event_type
    """,
)
def events_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via MEDIAN ABSOLUTE DEVIATION — the
    heavy-tail-safe twin of the z-score query (one extreme value shifts a
    mean/stddev fence, never a median/MAD fence). Two exact medians per
    group (Spark `percentile` == DuckDB `quantile_cont`, bit-equal), the
    deviations joined back through a broadcast of the tiny per-type model
    rows; flag = |x - med| > 3 x MAD. Per-group in-reducer sorts, no
    global shuffle beyond the two groupBys."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.percentile("value", F.lit(0.5)).alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.percentile("adev", F.lit(0.5)).alias("mad"))
    d = dev.join(F.broadcast(mad), "event_type")
    is_out = F.col("adev") > 3 * F.col("mad")
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        # + 0.0 normalizes -0.0 median ties; outlier counts of groups
        # whose MAD is undefined (all-NULL values) pin to 0, not NULL —
        # both hostile-gate finds (see the oracle note)
        F.round(F.first("med") + F.lit(0.0), 6).alias("median_value"),
        F.round(F.first("mad") + F.lit(0.0), 6).alias("mad"),
        F.coalesce(F.sum(is_out.cast("int")), F.lit(0))
        .cast("long")
        .alias("n_outliers"),
        F.min(F.when(is_out, F.col("value"))).cast("double").alias("min_outlier_value"),
    )


@query(
    "streaming_session_windows",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS brk
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (SELECT user_id, ts,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sess
          FROM g)
    SELECT user_id, CAST(sess AS BIGINT) AS session_id,
           min(ts) AS session_start,
           max(ts) AS session_end,
           count(*) AS n_events
    FROM s GROUP BY user_id, sess
    """,
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A SECOND real Structured Streaming run under the oracle: per-user
    SESSION windows (30-minute gap) through the native
    `session_window` streaming aggregation — stateful session merging,
    the operator class the reference's engine cannot express — into a
    complete-mode memory sink, checked against the batch gaps-and-islands
    formulation in DuckDB. Session ids are normalized to per-user
    start-order so both engines name sessions identically.

    Scale: production runs the same operator in update mode with a
    watermark; state per user is one open session, merged as events
    arrive."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    ts_is_long = schema["ts"].dataType.typeName() == "long"
    ts_col = (
        F.timestamp_micros(F.expr("ts div 1000"))
        if ts_is_long
        else F.col("ts").cast("timestamp")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("user_id", ts_col.alias("timestamp"))
    )
    agg = stream.groupBy(
        F.session_window("timestamp", "30 minutes"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    name = "stream_session_oracle"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from pyspark.sql import Window

    out = spark.table(name).select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("raw_end"),
        "n_events",
    )
    # Spark's session end = last event + gap; the batch formulation ends
    # at the last EVENT. Recover it: end = raw_end - gap. Session ids =
    # per-user rank by start (1-based, matching the oracle's cumulative
    # break sum).
    w = Window.partitionBy("user_id").orderBy("session_start")
    return out.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("session_id"),
        "session_start",
        (F.col("raw_end") - F.expr("INTERVAL 30 MINUTES")).alias("session_end"),
        F.col("n_events").cast("long").alias("n_events"),
    )


@query(
    "events_dau_wau_stickiness",
    plan=("bounded_range_join",),
    oracle="""
    WITH days AS (
      SELECT CAST(ts AS DATE) AS day, user_id FROM events GROUP BY 1, 2
    ),
    dau AS (SELECT day, count(*) AS dau FROM days GROUP BY day),
    wau AS (
      SELECT d.day, count(DISTINCT a.user_id) AS wau
      FROM (SELECT DISTINCT day FROM days) d
      JOIN days a ON a.day > d.day - 7 AND a.day <= d.day
      GROUP BY d.day
    )
    SELECT d.day, CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau,
           round(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
    FROM dau d JOIN wau w USING (day)
    """,
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the product-health
    trio. The (day, user) distinct table shrinks the stream first; the
    trailing window is a bounded range join of the tiny day list against
    it (7 candidate days per row), never a self-join of raw events. Exact
    integer counts; one rounded division."""
    ev = load(spark, sf_dir, "events")
    days = (
        ev.select(
            F.to_date(F.timestamp_micros(F.expr("ts div 1000"))).alias("day"),
            "user_id",
        )
        .distinct()
    )
    dau = days.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    day_list = days.select("day").distinct()
    wau = (
        day_list.alias("d")
        .join(
            days.alias("a"),
            (F.col("a.day") > F.date_sub(F.col("d.day"), 7))
            & (F.col("a.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("a.user_id").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            F.col("dau").cast("long"),
            F.col("wau").cast("long"),
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
        )
    )


@query(
    "events_weekly_percentile_bands",
    oracle="""
    SELECT date_trunc('week', ts) AS week,
           event_type,
           count(*) AS n,
           -- + 0.0 normalizes IEEE -0.0 rank ties (hostile gate)
           round(quantile_cont(value, 0.5) + 0.0, 6) AS p50,
           round(quantile_cont(value, 0.9) + 0.0, 6) AS p90,
           round(quantile_cont(value, 0.99) + 0.0, 6) AS p99
    FROM events GROUP BY week, event_type
    """,
)
def events_weekly_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed latency-band profile: weekly p50/p90/p99 per event
    type — the SLO dashboard shape. Exact interpolated percentiles
    (Spark `percentile` == DuckDB `quantile_cont` bit-for-bit) inside a
    single groupBy on (week, type); per-group in-reducer sorts, no
    global shuffle."""
    ev = load(spark, sf_dir, "events")
    week = F.date_trunc("week", F.timestamp_micros(F.expr("ts div 1000")))
    pcts = F.percentile("value", F.lit([0.5, 0.9, 0.99]))
    return (
        ev.select(week.alias("week"), "event_type", "value")
        .groupBy("week", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(pcts.getItem(0) + F.lit(0.0), 6).alias("p50"),
            F.round(pcts.getItem(1) + F.lit(0.0), 6).alias("p90"),
            F.round(pcts.getItem(2) + F.lit(0.0), 6).alias("p99"),
        )
    )


@query(
    "orders_pareto_concentration",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(28,2))) AS rev
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT rev,
             row_number() OVER (ORDER BY rev DESC, o_custkey) AS rn,
             count(*) OVER () AS n_cust,
             sum(rev) OVER () AS total_rev
      FROM per_cust
    ),
    deciles AS (
      SELECT CAST(ceil(rn * 10.0 / n_cust) AS INTEGER) AS decile,
             rev, total_rev
      FROM ranked
    )
    SELECT decile,
           count(*) AS n_customers,
           CAST(sum(rev) AS DOUBLE) AS revenue,
           round(CAST(sum(rev) AS DOUBLE) / CAST(any_value(total_rev) AS DOUBLE), 6)
             AS revenue_share
    FROM deciles GROUP BY decile
    """,
)
def orders_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (the Pareto check): customers ranked by
    decimal-exact revenue, split into top-rank deciles, each decile's
    share of total revenue — does the top 10% carry the business?
    Per-customer agg shrinks first; the rank is one skinny global sort;
    sums stay DECIMAL until the final share division."""
    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    from pyspark.sql import Window

    ranked = per_cust.select(
        "rev",
        F.row_number()
        .over(Window.orderBy(F.desc("rev"), F.asc("o_custkey")))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_cust"),
        F.sum("rev").over(Window.partitionBy()).alias("total_rev"),
    )
    deciles = ranked.select(
        F.ceil(F.col("rn") * 10.0 / F.col("n_cust")).cast("int").alias("decile"),
        "rev",
        "total_rev",
    )
    return deciles.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev").cast("double").alias("revenue"),
        F.round(
            F.sum("rev").cast("double") / F.first("total_rev").cast("double"), 6
        ).alias("revenue_share"),
    )


@query(
    "orders_fulfillment_latency",
    oracle="""
    WITH delays AS (
      SELECT o.o_orderpriority,
             date_diff('day', o.o_orderdate, l.l_shipdate) AS delay_days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           count(*) AS n_lines,
           CAST(min(delay_days) AS BIGINT) AS min_days,
           round(quantile_cont(delay_days, 0.5), 6) AS p50_days,
           round(quantile_cont(delay_days, 0.9), 6) AS p90_days,
           CAST(max(delay_days) AS BIGINT) AS max_days,
           CAST(sum(CASE WHEN delay_days > 90 THEN 1 ELSE 0 END) AS BIGINT)
             AS late_lines
    FROM delays GROUP BY o_orderpriority
    """,
)
def orders_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment-latency profile per order priority: order-date →
    ship-date delay in whole days, exact percentiles, and a >90-day
    late-line count — the supply-chain SLA view. One fact⋈fact equi-join
    on the order key (AQE-planned) feeding a groupBy on the tiny
    priority domain; the day arithmetic is exact integer datediff in
    both engines."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    delays = orders.join(
        li, li["l_orderkey"] == orders["o_orderkey"]
    ).select(
        "o_orderpriority",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("delay_days"),
    )
    pcts = F.percentile("delay_days", F.lit([0.5, 0.9]))
    return delays.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min("delay_days").cast("long").alias("min_days"),
        F.round(pcts.getItem(0), 6).alias("p50_days"),
        F.round(pcts.getItem(1), 6).alias("p90_days"),
        F.max("delay_days").cast("long").alias("max_days"),
        F.sum((F.col("delay_days") > 90).cast("int")).cast("long").alias("late_lines"),
    )


@query(
    "events_type_audience_overlap",
    oracle="""
    WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS overlap
      FROM tu a JOIN tu b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    ),
    sizes AS (SELECT event_type, count(*) AS n_users FROM tu GROUP BY 1)
    SELECT p.type_a, p.type_b,
           CAST(p.overlap AS BIGINT) AS overlap,
           CAST(sa.n_users AS BIGINT) AS users_a,
           CAST(sb.n_users AS BIGINT) AS users_b,
           round(CAST(p.overlap AS DOUBLE)
                 / (sa.n_users + sb.n_users - p.overlap), 6) AS jaccard
    FROM pairs p
    JOIN sizes sa ON sa.event_type = p.type_a
    JOIN sizes sb ON sb.event_type = p.type_b
    """,
)
def events_type_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between event types: exact |A∩B| and Jaccard per
    unordered type pair over DISTINCT (type, user) — which behaviors
    share an audience. The distinct table shrinks the stream first; the
    self-join keys on user_id (uniform), and the pair fan-out is bounded
    by types-per-user, never |types|² x |users|. The KMV-sketch twin
    (kmv_supplier_overlap_by_brand) serves the same question when the
    distinct table itself is too big to join."""
    ev = load(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    pairs = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    sizes = tu.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))
    return (
        pairs.join(
            F.broadcast(sizes.select(F.col("event_type").alias("type_a"),
                                     F.col("n_users").alias("users_a"))), "type_a")
        .join(
            F.broadcast(sizes.select(F.col("event_type").alias("type_b"),
                                     F.col("n_users").alias("users_b"))), "type_b")
        .select(
            "type_a", "type_b",
            F.col("overlap").cast("long"),
            F.col("users_a").cast("long"),
            F.col("users_b").cast("long"),
            F.round(
                F.col("overlap").cast("double")
                / (F.col("users_a") + F.col("users_b") - F.col("overlap")),
                6,
            ).alias("jaccard"),
        )
    )


def _ewma_day_summaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage A of the two-stage EWMA: per (user, day) — the bounded
    grain — collect that day's value sequence and reduce it to three
    scalars: the zero-seeded linear carry (e_out = beta*e_in + c, exact
    because the EWMA recurrence is affine in its seed), and the
    first-day-style fold result e1 (seed = first value)."""
    ev = load(spark, sf_dir, "events")
    # load() exposes ts as epoch NANOS (bigint); floor-div to the UTC day
    # index — same partition as the oracle's date_trunc('day', ts).
    return (
        ev.groupBy("user_id", F.expr("ts div 86400000000000").alias("d"))
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(ts, event_id, value))),"
                " s -> s.value)"
            ).alias("v"),
            F.count(F.lit(1)).alias("n"),
        )
        .withColumn(
            "lin",
            F.expr(
                """
                aggregate(v,
                  struct(cast(0.0 as double) as c, cast(1.0 as double) as b),
                  (a, x) -> struct(a.c + 0.25 * (x - a.c) as c,
                                   a.b * 0.75 as b))
                """
            ),
        )
        .withColumn(
            "e1",
            F.expr(
                """
                aggregate(slice(v, 2, size(v) - 1),
                  cast(element_at(v, 1) as double),
                  (a, x) -> a + 0.25 * (x - a))
                """
            ),
        )
    )


@query(
    "events_ewma_anomaly",
    oracle="""
    WITH day_seq AS (
      SELECT user_id, date_trunc('day', ts) AS d,
             list(value ORDER BY ts, event_id) AS v, count(*) AS n
      FROM events GROUP BY 1, 2),
    day_sum AS (
      SELECT user_id, d, v, n,
             -- zero-seeded affine carry of the day: e_out = b*e_in + c
             list_reduce(
               list_prepend(struct_pack(c := CAST(0.0 AS DOUBLE),
                                        b := CAST(1.0 AS DOUBLE)),
                 list_transform(v, x -> struct_pack(c := CAST(x AS DOUBLE),
                                                    b := CAST(0.0 AS DOUBLE)))),
               (a, x) -> struct_pack(c := a.c + 0.25 * (x.c - a.c),
                                     b := a.b * 0.75)) AS lin,
             -- first-day-style fold (seed = first value)
             list_reduce(list_transform(v, x -> CAST(x AS DOUBLE)),
                         (a, x) -> a + 0.25 * (x - a)) AS e1
      FROM day_seq),
    user_days AS (
      SELECT user_id,
             list(struct_pack(dd := d, beta := lin.b, c := lin.c, e1 := e1)
                  ORDER BY d) AS ds
      FROM day_sum GROUP BY user_id),
    -- Day-boundary seeds. DuckDB 1.0's list_reduce drops list-valued
    -- fields from a struct accumulator (scalars carry, lists reset), so
    -- the oracle computes each day's seed with an independent fold over
    -- the day-summary PREFIX ds[1:k-1] — the same floating-point op
    -- sequence the Spark side's single accumulating fold executes, so
    -- the results are bit-identical. O(days^2) tiny-struct ops per user
    -- is oracle-only cost; days are calendar-bounded.
    seeds_x AS (
      SELECT user_id, ds[k].dd AS d,
        CASE WHEN k = 1 THEN CAST(NULL AS DOUBLE) ELSE
          list_reduce(
            list_prepend(
              struct_pack(s := CAST(0.0 AS DOUBLE), i := CAST(0 AS BIGINT),
                          beta := CAST(NULL AS DOUBLE),
                          c := CAST(NULL AS DOUBLE),
                          e1 := CAST(NULL AS DOUBLE)),
              list_transform(ds[1:k-1], x -> struct_pack(
                          s := CAST(NULL AS DOUBLE), i := CAST(NULL AS BIGINT),
                          beta := x.beta, c := x.c, e1 := x.e1))),
            (a, x) -> struct_pack(
              s := CASE WHEN a.i = 0 THEN x.e1 ELSE x.beta * a.s + x.c END,
              i := a.i + 1,
              beta := CAST(NULL AS DOUBLE), c := CAST(NULL AS DOUBLE),
              e1 := CAST(NULL AS DOUBLE))).s
        END AS seed
      FROM user_days, UNNEST(range(1, len(ds) + 1)) AS t(k)),
    day_final AS (
      SELECT s.user_id, s.d, ds.n,
        -- m BEFORE e: DuckDB's fold rebinds struct fields sequentially
        -- inside larger plans; with m first both fields read the
        -- pre-update accumulator under either evaluation semantics.
        list_reduce(
          list_prepend(
            struct_pack(m := CAST(0.0 AS DOUBLE),
                        e := CAST(CASE WHEN s.seed IS NULL THEN ds.v[1]
                                       ELSE s.seed END AS DOUBLE)),
            list_transform(CASE WHEN s.seed IS NULL THEN ds.v[2:] ELSE ds.v END,
                           x -> struct_pack(m := CAST(-1.0 AS DOUBLE),
                                            e := CAST(x AS DOUBLE)))),
          (a, b) -> struct_pack(m := greatest(a.m, abs(b.e - a.e)),
                                e := a.e + 0.25 * (b.e - a.e))) AS acc
      FROM seeds_x s JOIN day_sum ds ON s.user_id = ds.user_id AND s.d = ds.d)
    SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
           round(max_by(acc.e, d), 6) AS ewma_final,
           round(max(acc.m), 6) AS max_deviation,
           CAST(CASE WHEN max(acc.m) > 300.0 THEN 1 ELSE 0 END AS INTEGER)
             AS flagged
    FROM day_final GROUP BY user_id
    """,
)
def events_ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA smoothing + anomaly flag per user (alpha = 1/4), TWO-STAGE:
    the recursive sequential statistic bounded BY CONSTRUCTION instead
    of by assumption (the round-3 perf-weak flag).

    Stage A folds each (user, day) — a day bounds the array a row
    carries no matter how hot the user — to three scalars: the affine
    carry (beta = 0.75^n via repeated multiply, c = zero-seeded fold;
    exact because e' = e + 0.25*(x-e) is affine in e) and the
    first-day fold e1. Stage B folds the per-user DAY SUMMARIES (3
    doubles per day, calendar-bounded — a year is 365 entries even for
    a 10^7-event bot) to assign each day its boundary seed. Stage C
    re-folds each day seeded exactly, recovering the running max
    one-step deviation |x - e_prev| that does NOT compose through a
    scalar carry. Stage D aggregates per user: final EWMA = last day's
    fold output, max deviation across days, flag above 300.

    Cross-engine exactness: both engines execute the identical IEEE op
    sequence per stage (alpha = 0.25 and 0.75 are exact binary
    fractions; fold order pinned by (ts, event_id) then day). The
    oracle's prefix-fold seed computation is bit-identical to the
    accumulating fold here (same ops, same order — see oracle comment
    for why DuckDB 1.0 needs the prefix form). A pytest pin holds the
    two-stage output equal to the one-stage reference fold
    (_events_ewma_anomaly_one_stage) at the rounded grain.

    Scale: four shuffles instead of one, but every shuffled row is
    bounded — day-grain arrays, then 3-double day summaries. No row
    ever carries a user's full history, so the 10^7-event bot that
    would OOM the one-stage collect_list is just more day rows here."""
    day_sum = _ewma_day_summaries(spark, sf_dir)
    user_days = day_sum.groupBy("user_id").agg(
        F.expr(
            "array_sort(collect_list(struct(d as dd, lin.b as beta,"
            " lin.c as c, e1 as e1)))"
        ).alias("ds")
    )
    seeds_x = (
        user_days.select(
            "user_id",
            F.expr(
                """
                aggregate(ds,
                  struct(cast(array() as array<struct<d:bigint,seed:double>>) as arr,
                         cast(0.0 as double) as s, cast(0 as bigint) as i),
                  (a, x) -> struct(
                    concat(a.arr, array(struct(x.dd as d,
                        if(a.i = 0, cast(null as double), a.s) as seed))) as arr,
                    if(a.i = 0, x.e1, x.beta * a.s + x.c) as s,
                    a.i + 1 as i)).arr
                """
            ).alias("arr"),
        )
        .select("user_id", F.explode("arr").alias("u"))
        .select("user_id", F.col("u.d").alias("d"), F.col("u.seed").alias("seed"))
    )
    day_final = seeds_x.join(
        day_sum.select("user_id", "d", "v", "n"), ["user_id", "d"]
    ).withColumn(
        "acc",
        F.expr(
            """
            aggregate(
              if(seed is null, slice(v, 2, size(v) - 1), v),
              struct(cast(0.0 as double) as m,
                     cast(if(seed is null, element_at(v, 1), seed) as double) as e),
              (a, b) -> struct(greatest(a.m, abs(b - a.e)) as m,
                               a.e + 0.25 * (b - a.e) as e))
            """
        ),
    )
    return day_final.groupBy("user_id").agg(
        F.sum("n").alias("n_events"),
        F.round(F.expr("max_by(acc.e, d)"), 6).alias("ewma_final"),
        F.round(F.max("acc.m"), 6).alias("max_deviation"),
        (F.max("acc.m") > 300.0).cast("int").alias("flagged"),
    )


def events_ewma_anomaly_one_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-stage reference fold for the pytest equality pin: collects
    each user's FULL value sequence into one row (unbounded at scale —
    exactly why it is no longer the registered query) and folds it in
    one pass. Kept unregistered as the semantic ground truth the
    two-stage decomposition must reproduce."""
    ev = load(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ts, event_id, value))),"
            " s -> s.value)"
        ).alias("v"),
        F.count(F.lit(1)).alias("n_events"),
    )
    folded = seq.withColumn(
        "acc",
        F.aggregate(
            F.expr("slice(v, 2, size(v) - 1)"),
            F.expr("struct(element_at(v, 1) AS e, cast(0.0 AS double) AS m)"),
            lambda a, x: F.struct(
                (a.getField("e") + 0.25 * (x - a.getField("e"))).alias("e"),
                F.greatest(
                    a.getField("m"), F.abs(x - a.getField("e"))
                ).alias("m"),
            ),
        ),
    )
    return folded.select(
        "user_id",
        "n_events",
        F.round(F.col("acc.e"), 6).alias("ewma_final"),
        F.round(F.col("acc.m"), 6).alias("max_deviation"),
        (F.col("acc.m") > 300.0).cast("int").alias("flagged"),
    )


# streaming_cms_state reuses the batch CMS oracle verbatim (the additive
# merge makes the final streamed cells equal the batch sketch).
_OR["streaming_cms_state"] = _OR["sketch_cms_user_frequency"]


@query(
    "streaming_kmv_state",
    oracle=None,  # set below — the batch KMV replay with n capped at k
)
def streaming_kmv_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING K-MINIMUM-VALUES sketch maintenance under the hash gate
    — the third streaming merge law, completing the set with
    streaming_hll_state (register MAX) and streaming_cms_state (count
    ADD): per-event-type state is the 64 smallest distinct md5-Horner
    user-id hashes, merged by union -> dedup -> keep-64-smallest
    (streaming/source.py::kmv_by_key). Min-k over a set is commutative,
    associative AND idempotent, so the final kept set equals the batch
    kmv_sketch under any micro-batch split — the oracle is the batch
    replay with n_hashes capped at k (a bounded sketch cannot know the
    uncapped distinct count; the ESTIMATE is identical because the
    branch condition n < k is unchanged by the cap). The estimate is
    computed post-stream in Spark SQL so its rounding is JVM HALF_UP,
    not Python half-even.

    Scale: state is <= 64 longs per key; per-batch work is one md5 per
    row. The max_by(n_seen) collapse is the memory-sink dedup."""
    import os

    from tansu_spark.functions.sketch import _estimate
    from tansu_spark.streaming.source import kmv_by_key

    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select(
            F.col("event_type").alias("key"),
            F.col("user_id").cast("string").alias("v"),
        )
    )
    out = kmv_by_key(stream, k=64)
    name = "stream_kmv_oracle"
    with _scoped_shuffle_partitions(spark, 8):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    final = (
        spark.table(name)
        .groupBy("key")
        .agg(F.max_by(F.struct("n_hashes", "uk"), "n_seen").alias("_f"))
        .select(
            F.col("key").alias("event_type"),
            F.col("_f.n_hashes").alias("n_kept"),
            F.col("_f.uk").alias("_uk"),
        )
    )
    return final.select(
        "event_type",
        "n_kept",
        _estimate(F.col("n_kept"), F.col("_uk"), 64, 6).alias("est_distinct"),
    )


def _kmv_capped_oracle() -> str:
    from tansu_spark.functions.sketch import H_SPACE, kmv_oracle_value_sql

    v = kmv_oracle_value_sql("user_id")
    return f"""
    WITH hv AS (SELECT DISTINCT event_type, {v} AS v FROM events),
         r AS (SELECT event_type, v,
                      row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn
               FROM hv),
         a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hashes,
                      MAX(CASE WHEN rn = 64 THEN v END) AS uk
               FROM r GROUP BY event_type)
    SELECT event_type,
           CAST(least(n_hashes, 64) AS BIGINT) AS n_kept,
           CASE WHEN n_hashes < 64 THEN CAST(n_hashes AS DOUBLE)
                ELSE round(63.0 * {float(H_SPACE)} / uk, 6) END AS est_distinct
    FROM a
    """


_OR["streaming_kmv_state"] = _kmv_capped_oracle()


@query(
    "events_cusum_changepoint",
    plan=("single_row_broadcast",),
    oracle="""
    WITH g AS (SELECT CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s1,
                      -- DECIMAL(19,2): see events_zscore_outliers' oracle note
                      CAST(SUM(CAST(value AS DECIMAL(19,2))
                               * CAST(value AS DECIMAL(19,2))) AS DOUBLE) AS s2,
                      count(*) AS n FROM events),
    p AS (SELECT s1 / n AS mu, sqrt(s2 / n - (s1 / n) * (s1 / n)) AS sd FROM g),
    c AS (SELECT e.user_id, e.event_id, e.ts, p.sd,
                 SUM(CAST(round(e.value - (p.mu + 0.5 * p.sd), 12)
                          AS DECIMAL(28,12)))
                   OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
          FROM events e CROSS JOIN p),
    cu AS (SELECT user_id, event_id, ts, sd,
                  CAST(cum - least(min(cum)
                         OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW), 0) AS DOUBLE) AS s
           FROM c),
    fl AS (SELECT user_id, event_id, ts, s,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn
           FROM cu WHERE s > 5 * sd)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_alarms,
           CAST(max(CASE WHEN rn = 1 THEN event_id END) AS BIGINT)
             AS first_alarm_event,
           round(max(s), 6) AS max_cusum
    FROM fl GROUP BY user_id
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM CHANGEPOINT detection per user (Page 1954) — the sustained-
    shift detector that complements the pointwise z-score filter: a user
    whose event values run persistently above the global reference
    (mu + 0.5*sd slack) accumulates positive drift until the statistic
    crosses h = 5*sd, flagging level shifts no single outlier triggers.

    The recurrence S_t = max(0, S_{t-1} + d_t) is NOT folded iteratively
    — it is the closed form cum_t − min(0, min_{j<=t} cum_j), i.e. a
    running sum minus its running minimum: two window functions over
    the same (ts, event_id)-pinned order. The running sum aggregates in
    exact DECIMAL — deliberately, because DuckDB evaluates windowed
    SUM with a segment tree whose double-addition ORDER differs from
    Spark's sequential pass; decimal addition is order-independent, so
    the parity hazard vanishes by construction.

    Scale: one global-moments row (broadcast), then two windows inside
    user partitions and one per-user aggregate — the stream shuffles
    once on user_id; no iteration, no state beyond the window frames."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    g = ev.groupBy().agg(
        F.sum(_dec("value")).cast("double").alias("s1"),
        F.sum(_dec("value") * _dec("value")).cast("double").alias("s2"),
        F.count(F.lit(1)).alias("n"),
    )
    p = g.select(
        (F.col("s1") / F.col("n")).alias("mu"),
        F.sqrt(
            F.col("s2") / F.col("n")
            - (F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n"))
        ).alias("sd"),
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = ev.crossJoin(F.broadcast(p)).select(
        "user_id",
        "event_id",
        "ts",
        "sd",
        F.sum(
            F.round(
                F.col("value") - (F.col("mu") + F.lit(0.5) * F.col("sd")), 12
            ).cast("decimal(28,12)")
        )
        .over(w_cum)
        .alias("cum"),
    )
    cu = c.select(
        "user_id",
        "event_id",
        "ts",
        "sd",
        (
            F.col("cum")
            - F.least(F.min("cum").over(w_cum), F.lit(0).cast("decimal(28,12)"))
        )
        .cast("double")
        .alias("s"),
    )
    w_rn = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fl = cu.where(F.col("s") > F.lit(5) * F.col("sd")).withColumn(
        "rn", F.row_number().over(w_rn)
    )
    return fl.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_alarms"),
        F.max(F.when(F.col("rn") == 1, F.col("event_id")))
        .cast("long")
        .alias("first_alarm_event"),
        F.round(F.max("s"), 6).alias("max_cusum"),
    )


@query(
    "events_value_domain_audit",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN value IS NOT NULL AND abs(value) > 1e10
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_out,
           CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           CAST(MIN(CASE WHEN value IS NOT NULL
                         THEN GREATEST(LEAST(value, 1e10), -1e10) END)
                AS DOUBLE) AS clamped_min,
           CAST(MAX(CASE WHEN value IS NOT NULL
                         THEN GREATEST(LEAST(value, 1e10), -1e10) END)
                AS DOUBLE) AS clamped_max
    FROM events
    GROUP BY event_type
    """,
)
def events_value_domain_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time numeric-domain audit (r9 advice): classify every event
    value against the DOCUMENTED |value| <= 1e10 parity domain and report,
    per event type, how many rows a 'reject' pass would drop, how many are
    NULL, and the min/max the 'clamp' pass would produce. This is the
    product's answer to out-of-domain magnitudes — validate and choose a
    policy at ingest, never feed them to operators whose cross-engine
    behavior is undefined (DuckDB raises on the DECIMAL cast, Spark NULLs).
    One scan + one groupBy; the domain predicates are pure column
    expressions from tansu_spark.functions.domain."""
    from tansu_spark.functions.domain import (
        EVENT_VALUE_ABS_MAX,
        enforce_domain,
        in_domain,
    )

    lo, hi = -EVENT_VALUE_ABS_MAX, EVENT_VALUE_ABS_MAX
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    clamped = enforce_domain(
        ev.withColumn("v_clamped", F.col("value")), "v_clamped", lo, hi, mode="clamp"
    )
    return clamped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((~in_domain("value", lo, hi)).cast("int")).cast("long").alias("n_out"),
        F.sum(F.col("value").isNull().cast("int")).cast("long").alias("n_null"),
        F.min("v_clamped").cast("double").alias("clamped_min"),
        F.max("v_clamped").cast("double").alias("clamped_max"),
    )
