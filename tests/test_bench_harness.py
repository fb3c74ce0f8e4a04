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
from bench import timed_collect  # noqa: E402


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


def test_timed_collect_cancels_hanging_query_and_recovers(spark):
    t0 = time.perf_counter()
    with pytest.raises(TimeoutError, match="hang"):
        timed_collect(spark, _slow, "", "hang", timeout_s=5)
    elapsed = time.perf_counter() - t0
    assert elapsed < 45, f"watchdog took {elapsed:.0f}s to fire+cancel"
    # the session must be healthy for the NEXT query (the whole point)
    rows = timed_collect(spark, _fast, "", "after-hang", timeout_s=60)
    assert len(rows) == 10
