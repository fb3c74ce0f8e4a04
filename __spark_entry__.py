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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registered suite, oracled queries first.

    The driver evaluates only the first 50 entries.  Oracled queries
    carry the hard hash-vs-DuckDB signal, so they are emitted ahead of
    rows-only ones; within each class registration order is preserved
    (stable sort), so additions never displace the evaluated window —
    tests/test_driver_contract.py pins the exact window contents and
    the deliberate overflow set (gated by the in-repo contract test).
    """
    ordered = sorted(
        plans.QUERIES.items(), key=lambda kv: kv[0] not in plans.ORACLES
    )
    return dict(ordered)


def oracle_sql() -> dict[str, str]:
    return dict(plans.ORACLES)
