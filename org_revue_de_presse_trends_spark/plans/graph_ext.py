"""Graph-centrality queries (operators/graph.py) — registers past the
driver's 50-slot window on purpose; the in-repo contract gate
oracle-checks them."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from .registry import query

_PR_D = 0.85
_PR_SCALE = 10**9
_PR_BASE = round((1.0 - _PR_D) * _PR_SCALE)
_PR_ITERS = 4


def _pagerank_oracle() -> str:
    """Unrolled-CTE DuckDB mirror of ``weighted_pagerank`` over the
    event-transition graph: per iteration the SAME pinned expression
    tree ``round(d · rank · w / out_w)`` cast to BIGINT, then an exact
    integer SUM — value-identical to the Spark loop by construction."""
    its = []
    prev = "r0"
    for k in range(1, _PR_ITERS + 1):
        its.append(
            f"""
    it{k} AS (
        SELECT n.node,
               CAST({_PR_BASE} + COALESCE(SUM(
                   CAST(ROUND({_PR_D!r} * CAST(r.rank_scaled AS DOUBLE)
                              * CAST(e.w AS DOUBLE)
                              / CAST(ow.out_w AS DOUBLE)) AS BIGINT)
               ), 0) AS BIGINT) AS rank_scaled
        FROM nodes n
        LEFT JOIN e ON e.dst = n.node
        LEFT JOIN {prev} r ON r.node = e.src
        LEFT JOIN ow ON ow.src = e.src
        GROUP BY n.node
    )"""
        )
        prev = f"it{k}"
    chained = ",".join(its)
    return f"""
    WITH ordered AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    e AS (
        SELECT prev_type AS src, event_type AS dst,
               CAST(count(*) AS BIGINT) AS w
        FROM ordered WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    ),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM e GROUP BY src),
    r0 AS (
        SELECT node, CAST({_PR_SCALE} AS BIGINT) AS rank_scaled
        FROM nodes
    ),{chained}
    SELECT node AS event_type, rank_scaled,
           CAST(rank_scaled AS DOUBLE) / {float(_PR_SCALE)!r} AS pagerank
    FROM {prev}
    """


@query("event_type_pagerank", _pagerank_oracle())
def event_type_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the first-order event-transition graph
    (operators/graph.py): edges are (prev_type → next_type, count)
    from each user's (ts, event_id)-ordered path — the Markov-chain
    stationary-visit view of which event types user journeys
    concentrate on.  Exactly {iters} iterations at damping 0.85 with
    ranks as scaled longs; the DuckDB oracle unrolls the same rounds
    as CTEs and every rank_scaled hash-matches bit-exactly (the
    per-edge double expression has a pinned IEEE shape; the per-node
    reduce is an integer sum — aggregation order cannot move it).

    Scale: the same operator ranks a million-node similarity or link
    graph — per round one edges⋈ranks join and one integer-sum
    aggregate, edges localCheckpointed once, no collects; see
    operators/graph.py for the 2**53 exactness budget."""
    from ..operators.graph import weighted_pagerank

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("src"),
            F.col("event_type").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    ranks = weighted_pagerank(
        edges,
        iterations=_PR_ITERS,
        damping=_PR_D,
        scale=_PR_SCALE,
    )
    return ranks.select(
        F.col("node").alias("event_type"), "rank_scaled", "pagerank"
    )


event_type_pagerank.__doc__ = event_type_pagerank.__doc__.replace(
    "{iters}", str(_PR_ITERS)
)
