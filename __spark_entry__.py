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


#: Driver-window rotation (r6 verdict item 6, continued per round):
#: the driver re-generates fixtures between rounds, so oracled queries
#: that sit permanently past its 50-slot window would only catch
#: cross-engine drift via the in-repo sf0.01 gate.  Each round the
#: next batch of overflow-oracled queries moves INTO the window
#: (emitted first); the previous rotation returns to registration
#: order.  tests/test_driver_contract.py pins both resulting sets.
#:
#: r8 batch (r7 verdict item 5): the remaining r7-era families —
#: sketches (CMS/KS/PSI/moments), record linkage, ExactSubstr dedup,
#: both LM scorers, the funnel/retention quartet, triangle clustering,
#: and the Deequ-style quality report.  The r7 batch (edit-distance,
#: scd2/merge, hll/bootstrap/histogram/pca/pagerank...) proved
#: rotation-stable against regenerated fixtures and returns to
#: overflow; the r7b six (hll..centrality) registered past the window
#: natively, so they stay overflow-gated too.
WINDOW_ROTATION = [
    "user_heavy_hitters_cms",
    "value_ks_click_vs_purchase",
    "value_drift_psi",
    "value_moments_by_type",
    "customer_directory_fuzzy_link",
    "doc_exact_substring_dedup",
    "doc_lm_kneser_ney",
    "doc_lm_stupid_backoff",
    "funnel_view_click_purchase",
    "user_retention_cohorts",
    "event_type_transitions",
    "funnel_sliding_window",
    "doc_neardup_clustering",
    "orders_quality_report",
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
