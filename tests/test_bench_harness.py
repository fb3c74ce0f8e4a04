"""Bench-harness robustness: the watchdog must convert a hanging query
into one recorded error while later queries keep running (r03 lesson,
extended from exceptions to stalls)."""

from __future__ import annotations

import sys
import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from bench import build_payload, timed_collect  # noqa: E402


def _fast(spark, sf_dir):
    return spark.range(10).select(F.col("id"))


def _slow(spark, sf_dir):
    # ~minutes of real executor work at local[32]; must be cancelled
    big = spark.range(3_000_000_000)
    return big.alias("a").join(
        big.alias("b"), F.col("a.id") % 1000 == F.col("b.id") % 1000
    ).agg(F.count(F.lit(1)).alias("n"))


def _raises(spark, sf_dir):
    raise ValueError("boom")


def test_timed_collect_returns_rows(spark):
    rows = timed_collect(spark, _fast, "", "fast", timeout_s=60)
    assert len(rows) == 10


def test_timed_collect_reraises_query_error(spark):
    with pytest.raises(ValueError, match="boom"):
        timed_collect(spark, _raises, "", "raises", timeout_s=60)


def test_timed_collect_with_collector_returns_metrics(spark):
    """The warm pass composes the watchdog with MetricsCollector: same
    rows back, plus per-query counters attributed via the watchdog's
    own job group (so cancellation still owns the group)."""
    from org_revue_de_presse_trends_spark.observability import (
        MetricsCollector,
    )

    def q(spark, sf_dir):
        return (
            spark.range(10_000)
            .groupBy((F.col("id") % 7).alias("k"))
            .agg(F.count(F.lit(1)).alias("n"))
        )

    rows, qm = timed_collect(
        spark, q, "", "with-metrics", timeout_s=120,
        collector=MetricsCollector(spark),
    )
    assert len(rows) == 7
    assert qm.result_rows == 7
    assert qm.n_jobs >= 1 and qm.n_tasks >= 1
    assert qm.shuffle_bytes_written > 0  # groupBy shuffles


def test_payload_tail_carries_critical_fields():
    """The driver archives only the LAST ~2000 chars of the printed
    line: errors, the warm map, value, value_normalized must sit
    inside that window even with 60 queries of cold/io head weight."""
    import json

    n = 60
    qnames = [f"query_name_number_{i:02d}" for i in range(n)]
    sec_names = [f"secondary_query_num_{i:02d}" for i in range(30)]
    warm = {q: 1.234 for q in qnames}
    warm_sec = {q: 0.123 for q in sec_names}
    cold = {q: 2.345 for q in qnames + sec_names}
    io = {
        q: {"read_mb": 12.34, "shuffle_mb": 5.67, "spill_mb": 0.0,
            "tasks": 64, "rows": 1000}
        for q in qnames + sec_names
    }
    line = json.dumps(
        build_payload(0.1, io, cold, warm, {"bad_query": "Boom: x"},
                      0.5, 0.52, warm_sec)
    )
    tail = line[-2000:]
    assert '"errors"' in tail and '"n_failed"' in tail
    assert '"queries"' in tail and '"value"' in tail
    assert '"value_normalized"' in tail
    # every HEADLINE warm timing must be individually recoverable from
    # the tail — the secondary map is sacrificial head weight and must
    # NOT displace them
    for q in qnames:
        assert tail.count(f'"{q}": 1.234') == 1
    # order pin: the five critical keys are the LAST five keys, and the
    # secondary section sits in the head, before errors
    keys = list(json.loads(line).keys())
    assert keys[-5:] == [
        "errors", "n_failed", "queries", "value", "value_normalized"
    ]
    assert keys.index("queries_secondary") < keys.index("errors")
    assert json.loads(line)["secondary_total"] == round(0.123 * 30, 3)
    # the spike-retry report is sacrificial head weight too
    assert keys.index("warm_retries") < keys.index("queries_secondary")


def test_timed_collect_cancels_hanging_query_and_recovers(spark):
    t0 = time.perf_counter()
    with pytest.raises(TimeoutError, match="hang"):
        timed_collect(spark, _slow, "", "hang", timeout_s=5)
    elapsed = time.perf_counter() - t0
    assert elapsed < 45, f"watchdog took {elapsed:.0f}s to fire+cancel"
    # the session must be healthy for the NEXT query (the whole point)
    rows = timed_collect(spark, _fast, "", "after-hang", timeout_s=60)
    assert len(rows) == 10
