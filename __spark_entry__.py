"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (the trends-pipeline shape) at
sf0.001.  ``queries()`` / ``oracle_sql()`` — the full registered suite
from org_revue_de_presse_trends_spark.plans (one entry per implemented
SURVEY §2 / LLM-pipeline operator; oracle present whenever the op is
SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from org_revue_de_presse_trends_spark import plans  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return plans.QUERIES["daily_top_events"](spark, "/root/testdata/sf0.001")


#: r7 driver-window rotation (r6 verdict item 6): the driver
#: re-generates fixtures between rounds, so oracled queries that sit
#: permanently past its 50-slot window would only catch cross-engine
#: drift via the in-repo sf0.01 gate.  These eight overflow-oracled
#: queries move INTO the window this round (emitted first), displacing
#: eight golden-stable veterans (green in every driver artifact since
#: r4) into the overflow set.  tests/test_driver_contract.py pins both
#: resulting sets.
WINDOW_ROTATION = [
    "split_leakage_counts",
    "source_overlap_kmv",
    "events_zorder_keys",
    "doc_boilerplate_removal",
    "dedup_edit_distance",
    "dedup_edit_distance_bounded",
    "user_event_type_scd2",
    "customer_state_merge",
    # r7b: the six operator families added late in round 7 rotate
    # straight into the window so the driver's own artifact exercises
    # them against regenerated fixtures; six r1-era golden-stable
    # veterans (doc token/quality/lang/chunks/vocab stats + rolling
    # revenue) move to the in-repo-gated overflow in exchange.
    "orders_hll_distinct_custkeys",
    "value_bootstrap_ci",
    "value_histogram_quantiles",
    "embedding_pca_covariance",
    "event_type_pagerank",
    "doc_centrality_pagerank",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registered suite: rotation set first, then remaining oracled
    queries, then rows-only.

    The driver evaluates only the first 50 entries.  Oracled queries
    carry the hard hash-vs-DuckDB signal, so they are emitted ahead of
    rows-only ones; within each class registration order is preserved
    (stable sort), so additions never displace the evaluated window —
    tests/test_driver_contract.py pins the exact window contents and
    the deliberate overflow set (gated by the in-repo contract test).
    """
    rot = {n: i for i, n in enumerate(WINDOW_ROTATION)}
    ordered = sorted(
        plans.QUERIES.items(),
        key=lambda kv: (
            0 if kv[0] in rot else (1 if kv[0] in plans.ORACLES else 2),
            rot.get(kv[0], 0),
        ),
    )
    return dict(ordered)


def oracle_sql() -> dict[str, str]:
    return dict(plans.ORACLES)
