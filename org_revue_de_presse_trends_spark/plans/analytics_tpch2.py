"""Fourth extension wave (round 5, cont.): TPC-H q4/q6/q8/q17/q21
shapes adapted to the fixture schema (no commit/receipt dates — "late"
means shipped > 60 days after the order date; no partsupp/container
columns — filters use brand/size).

The correlated queries are deliberately written in their TEXTBOOK
correlated form in the DuckDB oracle (EXISTS / NOT EXISTS / correlated
scalar subquery) and in the DECORRELATED aggregate/semi-join rewrite
on the Spark side — the hash-match proves the rewrite that survives
100 TB is semantically identical to the form users write.

Registered after events_analytics — past the driver's 50-slot window;
the in-repo contract test is the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .driver_queries import REVENUE
from .registry import query

#: "late" lineitem: shipped more than 60 days after its order date
_LATE = "l_shipdate > o_orderdate + INTERVAL 60 DAY"


@query(
    "q4_priority_with_late_lines",
    f"""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE year(o_orderdate) = 1997
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND {_LATE}
      )
    GROUP BY o_orderpriority
    """,
)
def q4_priority_with_late_lines(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): EXISTS in the oracle,
    left-semi join in the plan — the decorrelation Catalyst applies at
    scale, proven hash-identical.  The late predicate references both
    sides, so the semi-join keeps it in the ON clause."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 1997
    )
    l = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & F.expr(_LATE),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@query(
    "q6_forecast_revenue_change",
    f"""
    SELECT CAST(ROUND(SUM(
               CAST(l_extendedprice AS DECIMAL(18,6))
               * CAST(l_discount AS DECIMAL(18,6))), 3) AS DOUBLE)
               AS revenue_increase,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE year(l_shipdate) = 1997
      AND l_discount BETWEEN 0.03 AND 0.05
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue_change(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): the canonical
    filter-pushdown scan — three conjunctive predicates, no join, one
    decimal-exact aggregate.  Every predicate reaches the parquet scan
    (PushedFilters)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.year("l_shipdate") == 1997)
            & F.col("l_discount").between(0.03, 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.expr(
                        "CAST(l_extendedprice AS DECIMAL(18,6))"
                        " * CAST(l_discount AS DECIMAL(18,6))"
                    )
                ),
                3,
            ).cast("double").alias("revenue_increase"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q8_market_share",
    f"""
    WITH volumes AS (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               {REVENUE} AS volume,
               sn.n_name = 'NATION_0' AS is_target
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        JOIN region ON r_regionkey = cn.n_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT o_year,
           CAST(ROUND(SUM(CASE WHEN is_target THEN volume
                          ELSE CAST(0 AS DECIMAL(18,6)) END), 3)
                AS DOUBLE) AS target_volume,
           CAST(ROUND(SUM(volume), 3) AS DOUBLE) AS total_volume,
           CAST(ROUND(
               CAST(SUM(CASE WHEN is_target THEN volume
                        ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
               / CAST(SUM(volume) AS DOUBLE), 6) AS DOUBLE)
               AS mkt_share
    FROM volumes
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): six-way join — lineitem
    against five broadcast dims (orders is the only other large table
    and joins on its key) — then a conditional decimal ratio per order
    year.  The region filter prunes the customer-nation side before
    broadcast."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("sn_name")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_region"),
    )
    cust_dim = F.broadcast(
        c.join(cn, F.col("c_nationkey") == F.col("cn_key")).join(
            r, F.col("cn_region") == F.col("r_regionkey")
        ).select("c_custkey")
    )
    supp_dim = F.broadcast(
        s.join(sn, F.col("s_nationkey") == F.col("sn_key")).select(
            "s_suppkey", "sn_name"
        )
    )
    volumes = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_dim, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_dim, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.expr(REVENUE).alias("volume"),
            (F.col("sn_name") == "NATION_0").alias("is_target"),
        )
    )
    target = F.expr(
        "CASE WHEN is_target THEN volume ELSE CAST(0 AS DECIMAL(18,6)) END"
    )
    agg = volumes.groupBy("o_year").agg(
        F.sum(target).alias("t"), F.sum("volume").alias("v")
    )
    return agg.select(
        "o_year",
        F.round("t", 3).cast("double").alias("target_volume"),
        F.round("v", 3).cast("double").alias("total_volume"),
        F.round(
            F.col("t").cast("double") / F.col("v").cast("double"), 6
        ).cast("double").alias("mkt_share"),
    )


@query(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
                / 7.0, 3) AS DOUBLE) AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < 0.5 * (
          SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*)
          FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def q17_small_quantity_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): a correlated
    scalar AVG subquery in the oracle; the plan decorrelates it into a
    per-part average aggregated once and broadcast back — the rewrite
    that avoids re-scanning lineitem per row.  The per-part average is
    a decimal-exact SUM divided by COUNT (float AVG over partitions is
    accumulation-order-dependent and could flip boundary rows between
    engines); the decimal sum is exact, the double division and 0.5
    factor are then single deterministic IEEE ops on both sides."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3"
    )
    per_part = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(F.expr("CAST(l_quantity AS DECIMAL(18,6))"))
            .cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(per_part), F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.expr("CAST(l_extendedprice AS DECIMAL(18,6))"))
                / 7.0,
                3,
            ).cast("double").alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q21_waiting_suppliers",
    f"""
    WITH ol AS (
        SELECT l_orderkey, l_suppkey, o_orderdate,
               MAX(CASE WHEN {_LATE} THEN 1 ELSE 0 END) AS was_late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY l_orderkey, l_suppkey, o_orderdate
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, ol l1
    WHERE s_suppkey = l1.l_suppkey AND l1.was_late = 1
      AND EXISTS (
          SELECT 1 FROM ol l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM ol l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.was_late = 1
      )
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    textbook EXISTS + NOT EXISTS pair in the oracle; the plan uses the
    decorrelated per-order aggregate — n_suppliers and n_late_suppliers
    per finished order, then the verdict is a pure filter
    (was_late ∧ n_suppliers > 1 ∧ n_late_suppliers = 1).  One extra
    aggregation replaces two correlated self-probes of lineitem — the
    100 TB form."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    s = load_table(spark, sf_dir, "supplier")
    ol = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.expr(f"CASE WHEN {_LATE} THEN 1 ELSE 0 END")
            ).alias("was_late")
        )
    )
    per_order = ol.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supps"),
        F.sum("was_late").alias("n_late"),
    )
    qualified = (
        ol.join(per_order, "l_orderkey")
        .filter(
            (F.col("was_late") == 1)
            & (F.col("n_supps") > 1)
            & (F.col("n_late") == 1)
        )
    )
    return (
        qualified.join(
            F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q12_priority_by_lateness",
    f"""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE {_LATE} AND year(l_shipdate) = 1997
    GROUP BY l_returnflag
    """,
)
def q12_priority_by_lateness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority audit, shipmode →
    returnflag on this schema): late lineitems classified by whether
    their order was high-priority — two conditional counts per group.
    One fact-fact equi-join, predicates pushed to both scans."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate") == 1997
    )
    o = load_table(spark, sf_dir, "orders")
    hi = F.expr(
        "CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
        " THEN 1 ELSE 0 END"
    )
    lo = F.expr(
        "CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')"
        " THEN 1 ELSE 0 END"
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.expr(_LATE))
        .groupBy("l_returnflag")
        .agg(
            F.sum(hi).cast("long").alias("high_line_count"),
            F.sum(lo).cast("long").alias("low_line_count"),
        )
    )


@query(
    "q20_excess_shippers",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#5' AND year(l_shipdate) = 1997
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 100
    )
    """,
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess-inventory suppliers; partsupp's
    availqty proxied by shipped quantity): IN over a grouped HAVING
    subquery — the plan aggregates once and semi-joins the supplier
    dim against the qualifying keys.  The HAVING sum is decimal-exact
    on both sides: a float sum is accumulation-order-dependent and a
    supplier landing near the 100 boundary could flip between
    engines."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate") == 1997
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#5"
    )
    s = load_table(spark, sf_dir, "supplier")
    qualifying = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.expr("CAST(l_quantity AS DECIMAL(18,6))")).alias("q")
        )
        .filter(F.col("q") > 100)
        .select("l_suppkey")
    )
    return s.join(
        qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


@query(
    "q10_returned_item_customers",
    f"""
    WITH ranked AS (
        SELECT c_custkey, c_name, n_name,
               CAST(ROUND(SUM({REVENUE}), 3) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON n_nationkey = c_nationkey
        WHERE l_returnflag = 'R' AND year(o_orderdate) = 1997
        GROUP BY c_custkey, c_name, n_name
    )
    SELECT c_custkey, c_name, n_name, revenue
    FROM ranked
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q10_returned_item_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): customers ranked by
    revenue they returned in a year — fact join + broadcast dims +
    grouped decimal aggregate + total-ordered top-20
    (TakeOrderedAndProject, the unique-key tiebreak discipline)."""
    from ..operators.topk import top_k

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 1997
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    agg = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.expr(REVENUE)), 3).cast("double").alias(
                "revenue"
            )
        )
    )
    return top_k(
        agg, [F.desc("revenue"), F.asc("c_custkey")], 20
    ).select("c_custkey", "c_name", "n_name", "revenue")
