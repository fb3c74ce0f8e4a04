"""Classifier-evaluation metrics (operators/evalmetrics.py): exact
Python-mirror equality, edge/degenerate conventions, and the
derandomized fuzz gate.  The DuckDB value-exactness of the four
registered queries is enforced by tests/test_driver_contract.py."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from org_revue_de_presse_trends_spark.operators.evalmetrics import (
    auc,
    calibration_bins,
    cohens_kappa,
    confusion_at_thresholds,
)


def _quantize(v: float, scale: int) -> int:
    """Spark's round(double, 0): decimal HALF_UP over repr — the
    r7b-pinned mirror (never Python round(): half-even)."""
    return int(
        Decimal(repr(v * float(scale))).quantize(Decimal("1"), ROUND_HALF_UP)
    )


def _auc_mirror(pairs: list[tuple[float, int]], scale: int = 100):
    """(n_pos, n_neg, auc or None) via the tie-corrected U statistic."""
    q = [(_quantize(s, scale), y) for s, y in pairs]
    pos = sorted(s for s, y in q if y == 1)
    neg = sorted(s for s, y in q if y == 0)
    if not pos or not neg:
        return len(pos), len(neg), None
    u2 = 0
    for p in pos:
        below = sum(1 for x in neg if x < p)
        tied = sum(1 for x in neg if x == p)
        u2 += 2 * below + tied
    a = u2 / (2.0 * len(pos) * len(neg))
    return len(pos), len(neg), round(a, 9)


def _mk(spark, pairs):
    return spark.createDataFrame(
        [(float(s), bool(y)) for s, y in pairs], "score double, y boolean"
    )


class TestAuc:
    def test_matches_python_mirror_with_ties(self, spark):
        pairs = [
            (1.0, 1), (1.0, 0), (1.0, 0), (2.5, 1), (2.5, 1), (0.5, 0),
            (3.0, 0), (3.0, 1), (0.5, 1), (2.5, 0), (7.25, 1), (7.25, 0),
        ]
        row = auc(_mk(spark, pairs), "score", F.col("y")).collect()[0]
        np_, nn, a = _auc_mirror(pairs)
        assert (row["n_pos"], row["n_neg"]) == (np_, nn)
        assert row["auc"] == a

    def test_perfect_flipped_and_all_ties(self, spark):
        perfect = [(10.0, 1)] * 3 + [(1.0, 0)] * 4
        assert auc(_mk(spark, perfect), "score", F.col("y")).collect()[0][
            "auc"
        ] == 1.0
        flipped = [(s, 1 - y) for s, y in perfect]
        assert auc(_mk(spark, flipped), "score", F.col("y")).collect()[0][
            "auc"
        ] == 0.0
        ties = [(5.0, 1)] * 3 + [(5.0, 0)] * 4
        assert auc(_mk(spark, ties), "score", F.col("y")).collect()[0][
            "auc"
        ] == 0.5

    def test_empty_side_is_null_not_divide_by_zero(self, spark):
        row = auc(
            _mk(spark, [(1.0, 1), (2.0, 1)]), "score", F.col("y")
        ).collect()[0]
        assert row["n_neg"] == 0 and row["auc"] is None

    def test_null_score_and_null_label_rows_dropped(self, spark):
        df = spark.createDataFrame(
            [(1.0, True), (2.0, False), (None, True), (3.0, None)],
            "score double, y boolean",
        )
        row = auc(df, "score", F.col("y")).collect()[0]
        assert (row["n_pos"], row["n_neg"]) == (1, 1)
        assert row["auc"] == 0.0  # the one neg (2.0) outranks the pos (1.0)

    def test_quantization_merges_scores_within_a_cell(self, spark):
        # 1.004 and 0.996 both quantize to 100 at scale=100 → pure tie
        pairs = [(1.004, 1), (0.996, 0)]
        row = auc(_mk(spark, pairs), "score", F.col("y")).collect()[0]
        assert row["auc"] == 0.5

    @settings(max_examples=60, derandomize=True, database=None, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=-40, max_value=40),
                st.integers(min_value=0, max_value=1),
            ),
            min_size=1,
            max_size=60,
        )
    )
    def test_fuzz_matches_mirror(self, spark, raw):
        pairs = [(s / 4.0, y) for s, y in raw]  # collision-heavy grid
        row = auc(_mk(spark, pairs), "score", F.col("y")).collect()[0]
        np_, nn, a = _auc_mirror(pairs)
        assert (row["n_pos"], row["n_neg"], row["auc"]) == (np_, nn, a)


class TestCalibration:
    def test_matches_python_incl_negative_bins(self, spark):
        pairs = [(-7.5, 0), (-0.01, 1), (0.0, 0), (4.99, 1), (5.0, 1),
                 (12.25, 0), (12.75, 1)]
        rows = {
            r["bin_id"]: r
            for r in calibration_bins(
                _mk(spark, pairs), "score", F.col("y"), 5.0, scale=100
            ).collect()
        }
        # floor(v/5): -7.5→-2, -0.01→-1, 0/4.99→0, 5.0→1, 12.xx→2
        assert set(rows) == {-2, -1, 0, 1, 2}
        assert (rows[0]["n"], rows[0]["n_pos"]) == (2, 1)
        assert rows[0]["pos_rate"] == 0.5
        assert rows[0]["mean_score"] == round((0 + 499) / 2 / 100.0, 9)
        assert rows[2]["mean_score"] == round((1225 + 1275) / 2 / 100.0, 9)
        assert rows[-2]["pos_rate"] == 0.0 and rows[-1]["pos_rate"] == 1.0

    def test_bins_merge_across_unions(self, spark):
        a = [(1.0, 1), (2.0, 0)]
        b = [(1.5, 0), (9.0, 1)]
        whole = calibration_bins(
            _mk(spark, a + b), "score", F.col("y"), 5.0
        ).collect()
        parts = calibration_bins(
            _mk(spark, a).unionByName(_mk(spark, b)),
            "score",
            F.col("y"),
            5.0,
        ).collect()
        key = lambda r: r["bin_id"]
        assert sorted(whole, key=key) == sorted(parts, key=key)


class TestConfusion:
    def test_matches_python_and_guards(self, spark):
        pairs = [(1.0, 1), (2.0, 0), (3.0, 1), (4.0, 0), (5.0, 1)]
        rows = {
            r["threshold"]: r
            for r in confusion_at_thresholds(
                _mk(spark, pairs), "score", F.col("y"), [3.0, 100.0]
            ).collect()
        }
        r3 = rows[3.0]
        assert (r3["tp"], r3["fp"], r3["fn"], r3["tn"]) == (2, 1, 1, 1)
        assert r3["precision"] == round(2 / 3, 9)
        assert r3["recall"] == round(2 / 3, 9)
        assert r3["f1"] == round(4.0 / 6, 9)
        hi = rows[100.0]  # nothing predicted positive
        assert (hi["tp"], hi["fp"]) == (0, 0)
        assert hi["precision"] is None  # tp+fp == 0 → NULL, never 0/0
        assert hi["recall"] == 0.0 and hi["f1"] == 0.0

    def test_all_negative_labels(self, spark):
        pairs = [(1.0, 0), (5.0, 0)]
        r = confusion_at_thresholds(
            _mk(spark, pairs), "score", F.col("y"), [0.0]
        ).collect()[0]
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (0, 2, 0, 0)
        assert r["recall"] is None  # tp+fn == 0: no positives at all
        assert r["f1"] == 0.0  # denominator 2tp+fp+fn == 2 > 0

    def test_duplicate_thresholds_deduped(self, spark):
        pairs = [(1.0, 1), (5.0, 0)]
        rows = confusion_at_thresholds(
            _mk(spark, pairs), "score", F.col("y"), [3.0, 3.0, 3]
        ).collect()
        assert len(rows) == 1 and rows[0]["threshold"] == 3.0

    def test_non_finite_threshold_rejected(self, spark):
        import math

        import pytest

        with pytest.raises(ValueError, match="finite"):
            confusion_at_thresholds(
                _mk(spark, [(1.0, 1)]), "score", F.col("y"),
                [1.0, math.inf],
            )
        with pytest.raises(ValueError, match="finite"):
            confusion_at_thresholds(
                _mk(spark, [(1.0, 1)]), "score", F.col("y"), [math.nan]
            )


class TestKappa:
    def _mk2(self, spark, cells):
        n11, n10, n01, n00 = cells
        rows = (
            [(True, True)] * n11
            + [(True, False)] * n10
            + [(False, True)] * n01
            + [(False, False)] * n00
        )
        return spark.createDataFrame(rows, "a boolean, b boolean")

    def test_perfect_agreement(self, spark):
        df = self._mk2(spark, (3, 0, 0, 4))
        r = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
        assert r["kappa"] == 1.0 and r["po"] == 1.0

    def test_exact_independence_is_zero(self, spark):
        df = self._mk2(spark, (1, 1, 1, 1))
        r = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
        assert r["po"] == 0.5 and r["pe"] == 0.5 and r["kappa"] == 0.0

    def test_constant_raters_null_kappa(self, spark):
        df = self._mk2(spark, (5, 0, 0, 0))
        r = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
        assert r["kappa"] is None  # 1 − pe == 0: chance agreement certain

    def test_matches_python_formula(self, spark):
        cells = (17, 5, 8, 30)
        n11, n10, n01, n00 = cells
        n = sum(cells)
        sigma = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
        expect = round((n * (n11 + n00) - sigma) / (n * n - sigma), 9)
        df = self._mk2(spark, cells)
        r = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
        assert (r["n11"], r["n10"], r["n01"], r["n00"]) == cells
        assert r["kappa"] == expect
        assert r["po"] == round((n11 + n00) / n, 9)
        assert r["pe"] == round(sigma / (n * n), 9)

    def test_null_rater_rows_dropped(self, spark):
        df = spark.createDataFrame(
            [(True, True), (None, True), (False, None), (False, False)],
            "a boolean, b boolean",
        )
        r = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
        assert r["n"] == 2 and r["kappa"] == 1.0


class TestSpearman:
    def _run(self, spark, pairs, sx=100, sy=100):
        from org_revue_de_presse_trends_spark.operators.evalmetrics import (
            spearman,
        )

        df = spark.createDataFrame(
            [(float(x), float(y)) for x, y in pairs], "x double, y double"
        )
        return spearman(df, "x", "y", scale_x=sx, scale_y=sy).collect()[0]

    def test_matches_scipy_free_mirror_with_ties(self, spark):
        pairs = [(1.0, 2.0), (2.0, 2.0), (2.0, 5.0), (3.0, 1.0),
                 (4.0, 4.0), (4.0, 4.0), (5.0, 3.0)]

        # pure-python tie-averaged Spearman (2x-scaled integer ranks)
        def ranks2(vals):
            out = []
            for v in vals:
                below = sum(1 for u in vals if u < v)
                tied = sum(1 for u in vals if u == v)
                out.append(2 * below + tied + 1)
            return out

        rx = ranks2([p[0] for p in pairs])
        ry = ranks2([p[1] for p in pairs])
        n = len(pairs)
        sx_, sy_ = sum(rx), sum(ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        sxx = sum(a * a for a in rx)
        syy = sum(b * b for b in ry)
        import math

        expect = round(
            (n * sxy - sx_ * sy_)
            / (
                math.sqrt(n * sxx - sx_ * sx_)
                * math.sqrt(n * syy - sy_ * sy_)
            ),
            9,
        )
        r = self._run(spark, pairs)
        assert r["n"] == n and r["rho"] == expect

    def test_monotone_is_one_antitone_minus_one(self, spark):
        inc = [(i, i * i) for i in range(1, 8)]  # nonlinear but monotone
        assert self._run(spark, inc)["rho"] == 1.0
        dec = [(i, -i * i) for i in range(1, 8)]
        assert self._run(spark, dec)["rho"] == -1.0

    def test_constant_side_null(self, spark):
        r = self._run(spark, [(1.0, 7.0), (2.0, 7.0), (3.0, 7.0)])
        assert r["rho"] is None


class TestMutualInformation:
    def _run(self, spark, rows):
        from org_revue_de_presse_trends_spark.operators.evalmetrics import (
            mutual_information,
        )

        df = spark.createDataFrame(rows, "a string, b long")
        return mutual_information(df, "a", "b").collect()

    def test_matches_python_mirror(self, spark):
        rows = (
            [("x", 0)] * 5 + [("x", 1)] * 2 + [("y", 0)] * 1
            + [("y", 1)] * 6 + [("z", 2)] * 3
        )
        out = self._run(spark, rows)[0]
        import math
        from collections import Counter

        cab = Counter(rows)
        ca = Counter(a for a, _ in rows)
        cb = Counter(b for _, b in rows)
        n = len(rows)
        # mirror the operator's fixed-point discipline exactly:
        # per-cell term rounded to a 1e-6-scaled long before the sum
        total = 0
        for (a, b), c in cab.items():
            t = (c / n) * math.log((n * c) / (ca[a] * cb[b])) * 1e6
            total += int(
                Decimal(repr(t)).quantize(Decimal("1"), ROUND_HALF_UP)
            )
        assert out["n"] == n and out["n_cells"] == len(cab)
        assert out["mi"] == round(total / 1e6, 6)
        assert out["mi"] > 0

    def test_independent_columns_zero(self, spark):
        # perfectly independent 2x2 with equal counts
        rows = [("x", 0)] * 4 + [("x", 1)] * 4 + [("y", 0)] * 4 + [("y", 1)] * 4
        out = self._run(spark, rows)[0]
        assert out["mi"] == 0.0

    def test_deterministic_mapping_equals_label_entropy(self, spark):
        # b = f(a): MI = H(b); two equal classes -> ln 2
        import math

        rows = [("x", 0)] * 6 + [("y", 1)] * 6
        out = self._run(spark, rows)[0]
        assert abs(out["mi"] - math.log(2)) < 2e-6

    def test_empty_input_zero_rows(self, spark):
        assert self._run(spark, []) == []


class TestChi2:
    def _run(self, spark, rows):
        from org_revue_de_presse_trends_spark.operators.evalmetrics import (
            chi2_independence,
        )

        df = spark.createDataFrame(rows, "a string, b long")
        return chi2_independence(df, "a", "b").collect()[0]

    def test_matches_textbook_formula_with_zero_cell(self, spark):
        # 2x2 with an EMPTY (x,1) cell — the algebraic -n must absorb it
        rows = [("x", 0)] * 8 + [("y", 0)] * 2 + [("y", 1)] * 6
        r = self._run(spark, rows)
        from collections import Counter

        cab = Counter(rows)
        ca = Counter(a for a, _ in rows)
        cb = Counter(b for _, b in rows)
        n = len(rows)
        # classic sum over ALL cells of (o-e)^2/e
        expect = 0.0
        for a in ca:
            for b in cb:
                e = ca[a] * cb[b] / n
                o = cab.get((a, b), 0)
                expect += (o - e) ** 2 / e
        assert r["n"] == n and r["dof"] == 1
        assert abs(r["chi2"] - expect) < 2e-5  # per-cell 1e-6 quantization
        import math

        assert abs(r["cramers_v"] - math.sqrt(expect / n)) < 2e-5

    def test_exact_independence_zero(self, spark):
        rows = [("x", 0)] * 4 + [("x", 1)] * 4 + [("y", 0)] * 4 + [("y", 1)] * 4
        r = self._run(spark, rows)
        assert abs(r["chi2"]) < 1e-5
        assert r["cramers_v"] is not None and r["cramers_v"] < 1e-2

    def test_perfect_association_v_is_one(self, spark):
        rows = [("x", 0)] * 5 + [("y", 1)] * 7
        r = self._run(spark, rows)
        assert abs(r["cramers_v"] - 1.0) < 1e-5

    def test_constant_side_null(self, spark):
        r = self._run(spark, [("x", 0)] * 3 + [("x", 1)] * 4)
        assert r["dof"] == 0 and r["chi2"] is None and r["cramers_v"] is None


class TestNonFiniteScores:
    def test_nan_and_inf_scores_dropped_not_crash(self, spark):
        # NaN/Inf would hit ANSI CAST_OVERFLOW in round(score*scale)->long
        df = spark.createDataFrame(
            [(1.0, True), (2.0, False), (float("nan"), True),
             (float("inf"), False), (float("-inf"), True)],
            "score double, y boolean",
        )
        r = auc(df, "score", F.col("y")).collect()[0]
        assert (r["n_pos"], r["n_neg"]) == (1, 1)
        rows = calibration_bins(df, "score", F.col("y"), 5.0).collect()
        assert sum(x["n"] for x in rows) == 2
        t = confusion_at_thresholds(df, "score", F.col("y"), [1.5]).collect()[0]
        assert t["tp"] + t["fp"] + t["fn"] + t["tn"] == 2

    def test_spearman_drops_non_finite_on_either_side(self, spark):
        from org_revue_de_presse_trends_spark.operators.evalmetrics import (
            spearman,
        )

        df = spark.createDataFrame(
            [(1.0, 1.0), (2.0, 4.0), (3.0, 9.0),
             (float("nan"), 1.0), (4.0, float("inf"))],
            "x double, y double",
        )
        r = spearman(df, "x", "y").collect()[0]
        assert r["n"] == 3 and r["rho"] == 1.0

    def test_empty_thresholds_raise_value_error(self, spark):
        df = spark.createDataFrame([(1.0, True)], "score double, y boolean")
        with pytest.raises(ValueError, match="non-empty"):
            confusion_at_thresholds(df, "score", F.col("y"), [])


class TestSpearmanFuzz:
    @settings(max_examples=40, derandomize=True, database=None, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=-30, max_value=30),
                st.integers(min_value=-30, max_value=30),
            ),
            min_size=2,
            max_size=40,
        )
    )
    def test_fuzz_matches_mirror(self, spark, raw):
        import math

        from org_revue_de_presse_trends_spark.operators.evalmetrics import (
            spearman,
        )

        pairs = [(x / 2.0, y / 2.0) for x, y in raw]  # tie-heavy grid
        df = spark.createDataFrame(pairs, "x double, y double")
        r = spearman(df, "x", "y").collect()[0]

        def ranks2(vals):
            return [
                2 * sum(1 for u in vals if u < v)
                + sum(1 for u in vals if u == v)
                + 1
                for v in vals
            ]

        rx = ranks2([p[0] for p in pairs])
        ry = ranks2([p[1] for p in pairs])
        n = len(pairs)
        sx_, sy_ = sum(rx), sum(ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        sxx = sum(a * a for a in rx)
        syy = sum(b * b for b in ry)
        vx, vy = n * sxx - sx_ * sx_, n * syy - sy_ * sy_
        if vx <= 0 or vy <= 0:
            assert r["rho"] is None
        else:
            expect = round(
                (n * sxy - sx_ * sy_) / (math.sqrt(vx) * math.sqrt(vy)), 9
            )
            assert r["rho"] == expect
        assert r["n"] == n


class TestGroupedAuc:
    def test_grouped_equals_per_group_ungrouped(self, spark):
        rows = [
            ("a", 1.0, True), ("a", 2.0, False), ("a", 3.0, True),
            ("b", 5.0, False), ("b", 4.0, True), ("b", 4.0, False),
            ("b", 6.0, True),
        ]
        df = spark.createDataFrame(rows, "g string, score double, y boolean")
        grouped = {
            r["g"]: (r["n_pos"], r["n_neg"], r["auc"])
            for r in auc(
                df, "score", F.col("y"), group_cols=("g",)
            ).collect()
        }
        for g in ("a", "b"):
            solo = auc(
                df.filter(F.col("g") == g), "score", F.col("y")
            ).collect()[0]
            assert grouped[g] == (
                solo["n_pos"], solo["n_neg"], solo["auc"]
            ), g

    def test_group_with_one_class_gets_null(self, spark):
        rows = [("a", 1.0, True), ("a", 2.0, True), ("b", 2.0, True),
                ("b", 1.0, False)]
        df = spark.createDataFrame(rows, "g string, score double, y boolean")
        got = {
            r["g"]: r["auc"]
            for r in auc(
                df, "score", F.col("y"), group_cols=("g",)
            ).collect()
        }
        assert got["a"] is None and got["b"] == 1.0
