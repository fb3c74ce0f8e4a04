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
#: r9 batch (r8 verdict item 1): the families that have never carried
#: driver evidence — the r8d classifier-evaluation octet (AUC,
#: calibration, threshold sweep, kappa, Spearman, MI, chi², grouped
#: AUC), the r8 URL-curation family (canonicalization, per-domain
#: caps, robots verdicts, blocklist audit, staleness), and the two
#: TPC-H closers q2/q11.  The r8 batch (CMS/KS/PSI/moments, fuzzy
#: link, ExactSubstr, LMs, funnels, clustering, quality report) went
#: 14/14 driver-green in CORRECTNESS_r08 and returns to overflow.
WINDOW_ROTATION = [
    "event_value_auc",
    "event_value_calibration",
    "event_value_threshold_metrics",
    "doc_rule_agreement_kappa",
    "qty_price_spearman",
    "event_type_value_mi",
    "event_type_value_chi2",
    "doc_length_lang_auc_by_source",
    "url_canonical_dedup",
    "domain_doc_caps",
    "url_robots_audit",
    "domain_blocklist_audit",
    "url_content_staleness",
    "q2_min_cost_supplier",
    "q11_important_part_values",
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
