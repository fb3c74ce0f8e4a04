"""Late-registering CDC queries (past the driver's 50-slot window on
purpose; in-repo contract gate oracle-checks them): MERGE change-apply
and SCD2 history over the events changelog (operators/scd.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.scd import merge_changes, scd2_from_observations
from .registry import query


@query(
    "user_event_type_scd2",
    """
    WITH flags AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN row_number() OVER w = 1
                       OR event_type IS DISTINCT FROM
                          lag(event_type) OVER w
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
      SELECT user_id, event_type, ts,
             SUM(chg) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS island
      FROM flags
    ),
    collapsed AS (
      SELECT user_id, island,
             min(event_type) AS event_type,
             min(ts) AS valid_from,
             count(*) AS n_obs
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER w2 AS valid_to,
           lead(valid_from) OVER w2 IS NULL AS is_current,
           n_obs
    FROM collapsed
    WINDOW w2 AS (PARTITION BY user_id ORDER BY island)
    """,
)
def user_event_type_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (Kimball type-2) history of each user's event_type:
    consecutive same-type observations collapse into one validity
    interval; the open interval is flagged current."""
    ev = load_table(spark, sf_dir, "events")
    return scd2_from_observations(
        ev, ["user_id"], ["event_type"], "ts", "event_id"
    )


@query(
    "customer_state_merge",
    """
    WITH snap AS (
      SELECT c_custkey AS custkey, c_acctbal AS state,
             'U' AS op, 0 AS rnk,
             CAST(NULL AS TIMESTAMP) AS ts, CAST(NULL AS BIGINT) AS eid
      FROM customer
    ),
    chg AS (
      SELECT user_id AS custkey, value AS state,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             1 AS rnk, ts, event_id AS eid
      FROM events
    ),
    u AS (SELECT * FROM snap UNION ALL SELECT * FROM chg),
    latest AS (
      SELECT custkey, state, op,
             row_number() OVER (
               PARTITION BY custkey
               ORDER BY rnk DESC, ts DESC NULLS LAST, eid DESC NULLS LAST
             ) AS rn
      FROM u
    )
    SELECT custkey, state FROM latest WHERE rn = 1 AND op <> 'D'
    """,
)
def customer_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE the events changelog onto the customer snapshot: error
    events delete the key, every other event upserts its value; the
    latest change per key wins (ts, event_id total order), untouched
    customers keep their account balance."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_acctbal").alias("state"),
    )
    ev = load_table(spark, sf_dir, "events")
    chg = ev.select(
        F.col("user_id").alias("custkey"),
        F.col("value").alias("state"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "ts",
        "event_id",
    )
    return merge_changes(cust, chg, ["custkey"], ["ts", "event_id"])
