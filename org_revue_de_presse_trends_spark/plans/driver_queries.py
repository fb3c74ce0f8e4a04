"""Relational driver-query suite — SURVEY.md §2 operator inventory
re-expressed over the driver's TPC-H-ish fixtures.

Each query exercises one (or a few) inventory rows, named in its
docstring.  Numeric aggregates go through exact decimal arithmetic with
a final cast to double so the DuckDB oracle hash-matches regardless of
floating-point summation order (decimal addition is associative; the
decimal→double conversion is correctly-rounded in both engines).

Determinism rule (SURVEY §5.2): every ORDER BY/LIMIT and every argmax
carries a unique-id tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.expressions import civil_day
from ..operators.antijoin import anti_join, semi_join
from ..operators.argmax import argmax
from ..operators.topk import top_k, top_k_per_group
from .registry import query

# Exact-decimal revenue term shared by the TPC-H-ish queries; written
# as a SQL fragment so the Spark plan and the DuckDB oracle share one
# definition (both engines do exact decimal multiply here).
REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(18,6))"
    " * (1 - CAST(l_discount AS DECIMAL(18,6)))"
)
CHARGE = (
    f"CAST({REVENUE} AS DECIMAL(18,6))"
    " * (1 + CAST(l_tax AS DECIMAL(18,6)))"
)


# --------------------------------------------------------------------------
# Aggregation core (SURVEY §2.5 A1-A3, §2.2 P3/P5)
# --------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM({REVENUE}), 3) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM({CHARGE}), 3) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with map-side partial agg.
    Covers A1/A2/A3 + P3/P5.  Filter pushes to the parquet scan."""
    l = load_table(spark, sf_dir, "lineitem")
    dec_qty = F.expr("CAST(l_quantity AS DECIMAL(18,6))")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec_qty).cast("double").alias("sum_qty"),
            F.sum(F.expr("CAST(l_extendedprice AS DECIMAL(18,6))"))
            .cast("double")
            .alias("sum_base_price"),
            F.round(F.sum(F.expr(REVENUE)), 3).cast("double").alias("sum_disc_price"),
            F.round(F.sum(F.expr(CHARGE)), 3).cast("double").alias("sum_charge"),
            (F.sum(dec_qty).cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "avg_qty"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Join + top-k (SURVEY §2.4 J1/J3, §2.6 O1/O2)
# --------------------------------------------------------------------------

@query(
    "q3_top_revenue_orders",
    f"""
    SELECT o_orderkey,
           CAST(ROUND(SUM({REVENUE}), 3) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: J1 inner equi-joins + A3 + O1/O2 top-k with
    unique-key tiebreaker (TakeOrderedAndProject, not a global sort)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    joined = c.join(o, c.c_custkey == o.o_custkey).join(
        l, F.col("l_orderkey") == F.col("o_orderkey")
    )
    agg = joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.round(F.sum(F.expr(REVENUE)), 3).cast("double").alias("revenue")
    )
    return top_k(agg, [F.desc("revenue"), F.asc("o_orderkey")], 10).select(
        "o_orderkey", "revenue", "o_orderdate", "o_orderpriority"
    )


@query(
    "q5_supplier_nation_revenue",
    f"""
    SELECT n_name, CAST(ROUND(SUM({REVENUE}), 3) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name IN ('EUROPE', 'ASIA')
    GROUP BY n_name
    """,
)
def q5_supplier_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join with broadcast dims (J3 — the
    reference's tiny publishers_list join, trends.go:300-305).  The
    supplier/nation/region dims are broadcast; only lineitem shuffles
    for the final aggregate."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("EUROPE", "ASIA")
    )
    dims = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey).join(
            r, F.col("n_regionkey") == F.col("r_regionkey")
        )
    )
    return (
        l.join(dims, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.expr(REVENUE)), 3).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# Flagship: the trends pipeline shape on the events table
# (civil day F1/P6 → per-source argmax A4 → global top-k O1/O2)
# --------------------------------------------------------------------------

@query(
    "daily_top_events",
    """
    WITH evd AS (
        SELECT event_id, user_id, event_type, value,
               CAST(ts - INTERVAL 1 HOUR AS DATE) AS day
        FROM events
    ),
    per_user AS (
        SELECT day, user_id, event_id, event_type, value,
               row_number() OVER (
                   PARTITION BY day, user_id
                   ORDER BY value DESC, event_id DESC
               ) AS rn
        FROM evd
    ),
    top_per_user AS (
        SELECT day, user_id, event_id, event_type, value
        FROM per_user WHERE rn = 1
    )
    SELECT day, event_id, user_id, event_type, value, rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY day ORDER BY value DESC, event_id
        ) AS rank
        FROM top_per_user
    )
    WHERE rank <= 5
    """,
)
def daily_top_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's daily-highlights pipeline re-expressed
    on the events fixture — civil-day bucketing (reference
    trends.go:311), per-source argmax (trends.go:336-349), global
    top-k (trends.go:395-406).  argmax uses max_by (O(1) state/group,
    map-side partial); top-k per day is a ranked window."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        civil_day(F.col("ts")).alias("day"),
    )
    top_per_user = argmax(
        ev,
        group=["day", "user_id"],
        order_key=F.struct(F.col("value"), F.col("event_id")),
        payload=["event_id", "event_type", "value"],
    )
    ranked = top_k_per_group(
        top_per_user,
        group=[F.col("day")],
        order=[F.desc("value"), F.asc("event_id")],
        k=5,
    )
    w = Window.partitionBy("day").orderBy(F.desc("value"), F.asc("event_id"))
    return ranked.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "day", "event_id", "user_id", "event_type", "value", "rank"
    )


@query(
    "events_daily_counts",
    """
    SELECT CAST(ts - INTERVAL 1 HOUR AS DATE) AS day,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY day, event_type
    """,
)
def events_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Civil-day tumbling aggregation (F1/P6 + A1/A5 count-distinct)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            civil_day(F.col("ts")).alias("day"), "event_type", "user_id", "value"
        )
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.expr("CAST(value AS DECIMAL(18,6))"))
            .cast("double")
            .alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# JSON extraction (SURVEY §2.2 P4/P5/P7, reference trends.go:338,379)
# --------------------------------------------------------------------------

@query(
    "events_json_extract",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           event_type,
           json_extract_string(props, '$.missing') IS NOT NULL AS has_missing
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction + cast + presence predicate (P4/P5/P7 —
    the reference's ust_api_document handling).  `spread_for_cpu`: two
    JSON parses per row run map-only in the scan stage, and the events
    parquet arrives as ONE split (measured tasks=1)."""
    from ..operators.skew import spread_for_cpu

    ev = spread_for_cpu(load_table(spark, sf_dir, "events"))
    k_val = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select(
            "event_id",
            k_val.alias("k_val"),
            "event_type",
            F.get_json_object("props", "$.missing").isNotNull().alias("has_missing"),
        )
        .filter(F.col("k_val") >= 50)
    )


# --------------------------------------------------------------------------
# Anti/semi joins (SURVEY §2.3 F3, §2.4 J6/J7, reference trends.go:313-320)
# --------------------------------------------------------------------------

@query(
    "orders_excluding_building_anti",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey NOT IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    """,
)
def orders_excluding_building_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deleted-member exclusion (F3/J7): left_anti against a keyed
    exclusion set — broadcast when the set is small, null-safe because
    c_custkey is non-null (engine's null-aware variant covered in
    tests)."""
    o = load_table(spark, sf_dir, "orders")
    excluded = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return anti_join(o, excluded, on=("o_custkey", "c_custkey")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@query(
    "orders_of_building_semi",
    """
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    """,
)
def orders_of_building_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join companion of the anti-join."""
    o = load_table(spark, sf_dir, "orders")
    keys = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return semi_join(o, keys, on=("o_custkey", "c_custkey")).select(
        "o_orderkey", "o_custkey"
    )


# --------------------------------------------------------------------------
# Outer join with ON-clause predicates + coalesce fallback
# (SURVEY §2.4 J2 — ON-vs-WHERE placement is semantics; §2.2 P3)
# --------------------------------------------------------------------------

@query(
    "orders_left_join_big_lines",
    """
    SELECT o_orderkey, o_totalprice,
           l_partkey,
           COALESCE(l_quantity, -1.0) AS qty_or_default,
           l_quantity IS NULL AS unmatched
    FROM orders
    LEFT JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_linenumber = 1
     AND l_quantity > 45
    """,
)
def orders_left_join_big_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with extra predicates kept in the join condition
    (J2 — moving them to WHERE would change results, exactly the
    reference's trends.go:351-356 placement) + the P3 coalesce
    cascade on the null-extended side."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    cond = (
        (l.l_orderkey == o.o_orderkey)
        & (l.l_linenumber == 1)
        & (l.l_quantity > 45)
    )
    return o.join(l, cond, "left").select(
        "o_orderkey",
        "o_totalprice",
        "l_partkey",
        F.coalesce(F.col("l_quantity"), F.lit(-1.0)).alias("qty_or_default"),
        F.col("l_quantity").isNull().alias("unmatched"),
    )


# --------------------------------------------------------------------------
# Argmax per group (SURVEY §2.5 A4, reference trends.go:336-349)
# --------------------------------------------------------------------------

@query(
    "argmax_event_per_user",
    """
    WITH top AS (
        SELECT user_id, event_id, event_type, value
        FROM (
            SELECT user_id, event_id, event_type, value,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY value DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        WHERE rn = 1
    ),
    life AS (
        SELECT user_id,
               MIN(ts) AS first_ts,
               MAX(ts) AS last_ts,
               arg_min(event_type, ts) AS first_type,
               arg_max(event_type, ts) AS last_type,
               COUNT(*) AS n_events
        FROM events
        GROUP BY user_id
    )
    SELECT t.user_id, t.event_id, t.event_type, t.value,
           l.first_ts, l.last_ts, l.first_type, l.last_type, l.n_events
    FROM top t JOIN life l ON t.user_id = l.user_id
    """,
)
def argmax_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: one max_by(struct) hash aggregate replaces the reference's
    ten parallel ARRAY_AGG(... ORDER BY ...)[1] columns.  The min_by /
    max_by lifecycle columns (formerly q:first_last_event_per_user) ride
    in the SAME aggregate — one shuffle where the oracle needs a
    window + group-by + join; ts is unique per user in the fixture so
    argmin/argmax over it are deterministic."""
    ev = load_table(spark, sf_dir, "events")
    return argmax(
        ev,
        group=["user_id"],
        order_key=F.struct(F.col("value"), F.col("event_id")),
        payload=["event_id", "event_type", "value"],
        extra=[
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.min_by("event_type", "ts").alias("first_type"),
            F.max_by("event_type", "ts").alias("last_type"),
            F.count(F.lit(1)).alias("n_events"),
        ],
    )


# --------------------------------------------------------------------------
# As-of join (SURVEY §2.4 J5 generalized, reference trends.go:396-399)
# --------------------------------------------------------------------------

@query(
    "asof_click_before_purchase",
    """
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click'),
         j AS (
             SELECT p.event_id AS purchase_id,
                    p.user_id,
                    p.ts AS purchase_ts,
                    c.event_id AS click_id,
                    c.ts AS click_ts,
                    row_number() OVER (
                        PARTITION BY p.event_id
                        ORDER BY c.ts DESC NULLS LAST, c.event_id DESC
                    ) AS rn
             FROM p
             LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
         )
    SELECT purchase_id, user_id, purchase_ts, click_id, click_ts
    FROM j WHERE rn = 1
    """,
)
def asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click by the same user
    at or before the purchase time (the generalization of the
    reference's same-day popularity join J5).  Equi-join on user keeps
    it hash-partitioned; max_by collapses the range matches."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    cond = (F.col("c_user_id") == F.col("user_id")) & (
        F.col("click_ts") <= F.col("purchase_ts")
    )
    return (
        p.join(c, cond, "left")
        .groupBy("purchase_id", "user_id", "purchase_ts")
        .agg(
            F.max_by(
                F.struct(F.col("click_id"), F.col("click_ts")),
                F.struct(F.col("click_ts"), F.col("click_id")),
            ).alias("top")
        )
        .select(
            "purchase_id",
            "user_id",
            "purchase_ts",
            F.col("top.click_id").alias("click_id"),
            F.col("top.click_ts").alias("click_ts"),
        )
    )


# --------------------------------------------------------------------------
# Pagination (SURVEY §2.6 O2, reference OFFSET/LIMIT trends.go:404-406)
# --------------------------------------------------------------------------

@query(
    "topk_orders_paginated",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 10
    """,
)
def topk_orders_paginated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page 2 of the global top-k (native offset, Spark ≥3.4)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return top_k(o, [F.desc("o_totalprice"), F.asc("o_orderkey")], 10, offset=10)


# --------------------------------------------------------------------------
# Disjunctive (OR-condition) join (SURVEY §2.4 J4, trends.go:357-367)
# --------------------------------------------------------------------------

@query(
    "disjunctive_join_nation_customer",
    """
    SELECT n_name, COUNT(*) AS n_matches
    FROM nation
    JOIN customer
      ON c_nationkey = n_nationkey OR c_custkey % 25 = CAST(n_nationkey AS BIGINT)
    GROUP BY n_name
    """,
)
def disjunctive_join_nation_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: OR-condition join against a tiny dim → Catalyst picks
    BroadcastNestedLoopJoin, acceptable exactly because the dim side is
    broadcast-size (same argument as the reference's publishers_list;
    the union-of-equi-joins rewrite is documented in SURVEY §4.2)."""
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    cond = (c.c_nationkey == n.n_nationkey) | (
        c.c_custkey % 25 == n.n_nationkey.cast("long")
    )
    return (
        c.join(F.broadcast(n), cond)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )


# --------------------------------------------------------------------------
# Rollup / grouping sets (SURVEY §2.5 A6 — beyond-reference)
# --------------------------------------------------------------------------

@query(
    "rollup_order_stats",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup — absent in the reference (§2.5 A6), free in
    Spark; single shuffle with grouping-set expansion."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.expr("CAST(o_totalprice AS DECIMAL(18,2))"))
        .cast("double")
        .alias("total_price"),
    )


# --------------------------------------------------------------------------
# Union of variants (SURVEY §2.7 — the three trends variants pattern)
# --------------------------------------------------------------------------

@query(
    "union_order_variants",
    """
    SELECT 'high_value' AS variant, o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > 450000
    UNION ALL
    SELECT 'urgent' AS variant, o_orderkey, o_totalprice FROM orders
    WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 400000
    UNION
    SELECT 'urgent' AS variant, o_orderkey, o_totalprice FROM orders
    WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 400000
    """,
)
def union_order_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's three variant queries become one unionByName
    with a discriminator column (SURVEY §2.7).  The trailing UNION
    (distinct) leg re-submits the urgent variant — the idempotent
    re-run-a-variant shape — and collapses it in one hash aggregate
    over the concatenated inputs (map-side partial on each leg), so
    this single query exercises BOTH set-op flavors: UNION ALL and
    UNION DISTINCT (formerly q:union_distinct_active_parties).  The
    row set is unchanged: variants are tagged, so distinct only
    removes the deliberate duplicate leg."""
    o = load_table(spark, sf_dir, "orders")
    high = o.filter(F.col("o_totalprice") > 450000).select(
        F.lit("high_value").alias("variant"), "o_orderkey", "o_totalprice"
    )
    urgent = o.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 400000)
    ).select(F.lit("urgent").alias("variant"), "o_orderkey", "o_totalprice")
    return high.unionByName(urgent).unionByName(urgent).distinct()


# --------------------------------------------------------------------------
# Window running total (beyond-reference windowed analytics)
# --------------------------------------------------------------------------

@query(
    "running_total_per_customer",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def running_total_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative windowed sum (decimal-exact, explicit ROWS frame and
    total order so both engines agree bit-for-bit)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.expr("CAST(o_totalprice AS DECIMAL(18,2))"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )
