"""Data-quality constraints (operators/checks.py) — failing
constraints report the exact violating metric, all metrics come from
one aggregate pass, and conventions (NULL keys, domains, bounds) are
pinned."""

from __future__ import annotations

import pytest

from org_revue_de_presse_trends_spark.operators.checks import (
    accepted_values,
    completeness,
    max_bound,
    min_bound,
    non_empty,
    quality_report,
    uniqueness,
)


def _report(df, checks):
    return {
        (r["constraint"], r["column"]): (r["metric"], r["passed"])
        for r in quality_report(df, checks).collect()
    }


class TestChecks:
    def test_violations_report_exact_metrics(self, spark):
        rows = [
            (1, "a", 5.0),
            (2, "b", -1.0),   # min violation
            (2, "c", 120.0),  # dup key + max violation
            (4, None, 3.0),   # null name
        ]
        df = spark.createDataFrame(rows, "k long, name string, v double")
        got = _report(
            df,
            [
                completeness("name"),
                uniqueness(["k"]),
                min_bound("v", 0.0),
                max_bound("v", 100.0),
                accepted_values("name", ["a", "b", "c"]),
                non_empty(),
            ],
        )
        assert got[("completeness>=1.0", "name")] == (0.75, False)
        assert got[("uniqueness>=1.0", "k")] == (0.75, False)
        assert got[("min>=0.0", "v")] == (-1.0, False)
        assert got[("max<=100.0", "v")] == (120.0, False)
        # NULL is not in the domain -> 3/4
        assert got[("accepted_values>=1.0", "name")] == (0.75, False)
        assert got[("non_empty", "*")] == (4.0, True)

    def test_clean_data_all_pass(self, spark):
        df = spark.createDataFrame(
            [(i, f"n{i}", float(i)) for i in range(10)],
            "k long, name string, v double",
        )
        got = _report(
            df,
            [
                completeness("name"),
                uniqueness(["k"]),
                min_bound("v", 0.0),
                max_bound("v", 9.0),
                non_empty(),
            ],
        )
        assert all(passed for _, passed in got.values())

    def test_ratio_thresholds(self, spark):
        # 1 null in 10 -> completeness 0.9: passes at 0.9, fails at 0.95
        rows = [(i, "x" if i else None) for i in range(10)]
        df = spark.createDataFrame(rows, "k long, name string")
        got = _report(
            df,
            [completeness("name", 0.9), completeness("name", 0.95)],
        )
        assert got[("completeness>=0.9", "name")] == (0.9, True)
        assert got[("completeness>=0.95", "name")] == (0.9, False)

    def test_single_pass_plan(self, spark):
        # all metrics must come from ONE aggregate over one scan
        df = spark.createDataFrame(
            [(1, "a", 1.0)], "k long, name string, v double"
        )
        rep = quality_report(
            df,
            [completeness("name"), min_bound("v", 0.0), non_empty()],
        )
        plan = rep._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("LogicalRDD") == 1  # one scan feeds everything

    def test_empty_checks_rejected(self, spark):
        df = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(ValueError):
            quality_report(df, [])


class TestProfile:
    def test_profile_metrics_and_single_pass(self, spark):
        from org_revue_de_presse_trends_spark.operators.checks import (
            profile_table,
        )

        rows = [
            (1, "a", 5.0),
            (2, None, -1.5),
            (2, "c", None),
        ]
        df = spark.createDataFrame(rows, "k long, name string, v double")
        prof = profile_table(df)
        got = {
            r["column"]: (
                r["dtype"], r["n"], r["n_null"], r["n_distinct"],
                r["min_value"], r["max_value"],
            )
            for r in prof.collect()
        }
        assert got["k"] == ("bigint", 3, 0, 2, 1.0, 2.0)
        assert got["name"] == ("string", 3, 1, 2, None, None)
        assert got["v"] == ("double", 3, 1, 2, -1.5, 5.0)
        plan = prof._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("LogicalRDD") == 1  # one scan for all columns
