"""Banded interval join: equivalence against a brute-force theta-join
on planted data, boundary inclusivity, left-join semantics, input
validation — and the plan shape (equi-join on the band key, not a
nested-loop)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from org_revue_de_presse_trends_spark.operators.rangejoin import (
    band_interval_join,
)


def _sides(spark):
    left = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0, 3, 7, 10, 10, 23, 50])],
        ["lid", "lval"],
    )
    right = spark.createDataFrame(
        [(100 + i, float(v)) for i, v in enumerate([1, 5, 9, 11, 26, 49])],
        ["rid", "rval"],
    )
    return left, right


def test_matches_brute_force_inner(spark):
    left, right = _sides(spark)
    for radius in (1, 2, 5):
        got = sorted(
            (r["lid"], r["rid"])
            for r in band_interval_join(
                left, right, "lval", "rval", radius
            ).collect()
        )
        brute = sorted(
            (r["lid"], r["rid"])
            for r in left.crossJoin(right)
            .filter(F.abs(F.col("lval") - F.col("rval")) <= radius)
            .collect()
        )
        assert got == brute and len(got) > 0


def test_boundary_exactly_at_radius_is_included(spark):
    left, right = _sides(spark)
    got = {
        (r["lid"], r["rid"])
        for r in band_interval_join(
            left, right, "lval", "rval", 1
        ).collect()
    }
    # |0 - 1| == 1 → included; band boundary crossing (9 vs 10) too
    assert (0, 100) in got
    assert (3, 102) in got and (4, 102) in got


def test_left_join_keeps_unmatched(spark):
    left, right = _sides(spark)
    out = band_interval_join(left, right, "lval", "rval", 1, how="left")
    rows = out.collect()
    by_lid: dict = {}
    for r in rows:
        by_lid.setdefault(r["lid"], []).append(r["rid"])
    # every left row survives; unmatched ones (3, 7, 23) carry NULLs
    assert set(by_lid) == set(range(7))
    for lid in (1, 2, 5):
        assert by_lid[lid] == [None]
    inner = band_interval_join(left, right, "lval", "rval", 1).collect()
    assert len(rows) == len(inner) + 3


def test_negative_values_band_correctly(spark):
    left = spark.createDataFrame([(1, -7.0), (2, -0.5)], ["lid", "lval"])
    right = spark.createDataFrame([(10, -6.0), (11, 0.4)], ["rid", "rval"])
    got = sorted(
        (r["lid"], r["rid"])
        for r in band_interval_join(
            left, right, "lval", "rval", 1
        ).collect()
    )
    assert got == [(1, 10), (2, 11)]


def test_validation(spark):
    left, right = _sides(spark)
    with pytest.raises(ValueError, match="radius"):
        band_interval_join(left, right, "lval", "rval", 0)
    with pytest.raises(ValueError, match="alias"):
        band_interval_join(left, left, "lval", "lval", 1)
    with pytest.raises(ValueError, match="how"):
        band_interval_join(left, right, "lval", "rval", 1, how="outer")


def test_plan_is_equi_join_not_nested_loop(spark):
    left, right = _sides(spark)
    plan = band_interval_join(
        left, right, "lval", "rval", 2
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
