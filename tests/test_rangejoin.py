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


def test_left_join_null_column_not_duplicated(spark):
    """A matched left row carrying a NULL column must appear only as
    matched — the null-safe anti-join must not resurrect it as
    'unmatched' (a plain column-list anti join would)."""
    left = spark.createDataFrame(
        [(1, 5.0, None), (2, 50.0, "note")],
        "lid int, lval double, note string",
    )
    right = spark.createDataFrame([(10, 5.5)], ["rid", "rval"])
    out = band_interval_join(
        left, right, "lval", "rval", 1, how="left"
    ).collect()
    by_lid: dict = {}
    for r in out:
        by_lid.setdefault(r["lid"], []).append(r["rid"])
    assert by_lid[1] == [10]  # matched once, NOT also re-attached
    assert by_lid[2] == [None]


def test_left_join_with_left_id_matches_full_column_path(spark):
    left, right = _sides(spark)
    a = sorted(
        (r["lid"], r["rid"])
        for r in band_interval_join(
            left, right, "lval", "rval", 1, how="left"
        ).collect()
    )
    b = sorted(
        (r["lid"], r["rid"])
        for r in band_interval_join(
            left, right, "lval", "rval", 1, how="left", left_id="lid"
        ).collect()
    )
    assert a == b
    with pytest.raises(ValueError, match="left_id"):
        band_interval_join(
            left, right, "lval", "rval", 1, how="left", left_id="nope"
        )


def test_integral_banding_exact_above_double_precision(spark):
    """Nanosecond-epoch-scale longs (> 2^53): integral banding must
    keep exact bands where double division would round values onto
    the wrong band and silently drop in-radius pairs."""
    base = 1 << 60
    left = spark.createDataFrame(
        [(1, base), (2, base - 10_000), (3, -base)],
        "lid int, lval long",
    )
    right = spark.createDataFrame(
        [(10, base - 200), (11, base - 10_100), (12, -base + 150)],
        "rid int, rval long",
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in band_interval_join(
            left, right, "lval", "rval", 200
        ).collect()
    )
    assert got == [(1, 10), (2, 11), (3, 12)]
    # brute force agreement (Python ints are exact)
    lv = {1: base, 2: base - 10_000, 3: -base}
    rv = {10: base - 200, 11: base - 10_100, 12: -base + 150}
    brute = sorted(
        (i, j) for i in lv for j in rv if abs(lv[i] - rv[j]) <= 200
    )
    assert got == brute
