"""Poisson bootstrap (operators/bootstrap.py) — weight distribution vs
a pure-Python md5 mirror, statistical sanity of the CI, and layout
independence."""

from __future__ import annotations

import hashlib
import math
import statistics

import pytest
from pyspark.sql import functions as F

from org_revue_de_presse_trends_spark.operators.bootstrap import (
    POISSON1_CDF,
    W_CAP,
    bootstrap_ci,
    poisson_bootstrap_means,
)


def _py_coin(rid, b):
    h = int(hashlib.md5(f"{b}|{rid}".encode()).hexdigest()[:12], 16)
    return (h + 0.5) / float(1 << 48)


def _py_weight(u):
    for k, t in enumerate(POISSON1_CDF):
        if u < t:
            return k
    return W_CAP


def _py_means(rows, n_resamples, scale=10**6):
    out = {}
    for b in range(n_resamples):
        sw = swv = 0
        for rid, v in rows:
            w = _py_weight(_py_coin(rid, b))
            vs = round(v * scale)
            sw += w
            swv += w * vs
        out[b] = (sw, round(swv / sw / scale, 9))
    return out


class TestBootstrap:
    def test_means_match_python_mirror_exactly(self, spark):
        rows = [(i, float(i % 17) + 0.25) for i in range(300)]
        df = spark.createDataFrame(rows, "id long, value double")
        got = {
            r["b"]: (r["n_eff"], r["mean_value"])
            for r in poisson_bootstrap_means(
                df, "value", "id", n_resamples=8
            ).collect()
        }
        assert got == _py_means(rows, 8)

    def test_weights_are_poisson1_distributed(self, spark):
        # over 2000 rows x 16 resamples the empirical weight mass must
        # track Poisson(1): mean ~1, P(w=0) ~ 1/e
        rows = [(i, 1.0) for i in range(2000)]
        df = spark.createDataFrame(rows, "id long, value double")
        means = poisson_bootstrap_means(
            df, "value", "id", n_resamples=16
        ).collect()
        n_effs = [r["n_eff"] for r in means]
        avg = sum(n_effs) / len(n_effs)
        assert abs(avg - 2000) / 2000 < 0.05  # E[sum w] = n
        # every resample of constant data has mean exactly 1.0
        assert all(r["mean_value"] == 1.0 for r in means)

    def test_ci_brackets_truth_and_shrinks_with_n(self, spark):
        def ci_width(n):
            rows = [
                (i, 10.0 + math.sin(i * 0.7) * 4.0) for i in range(n)
            ]
            df = spark.createDataFrame(rows, "id long, value double")
            means = poisson_bootstrap_means(
                df, "value", "id", n_resamples=64
            )
            r = bootstrap_ci(means).collect()[0]
            true_mean = statistics.fmean(v for _, v in rows)
            assert r["mean_lo"] <= true_mean <= r["mean_hi"]
            assert r["n_resamples"] == 64
            return r["mean_hi"] - r["mean_lo"]

        # 16x the data → ~4x narrower interval (sqrt scaling, loose)
        w_small, w_big = ci_width(400), ci_width(6400)
        assert w_big < w_small / 2.0

    def test_layout_independent(self, spark):
        rows = [(i, float((i * 13) % 97)) for i in range(500)]
        df = spark.createDataFrame(rows, "id long, value double")
        a = sorted(
            map(
                tuple,
                poisson_bootstrap_means(
                    df, "value", "id", n_resamples=8
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                poisson_bootstrap_means(
                    df.repartition(11, "id"), "value", "id", n_resamples=8
                ).collect(),
            )
        )
        assert a == b

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 1.0)], "id long, value double")
        with pytest.raises(ValueError):
            poisson_bootstrap_means(df, "value", "id", n_resamples=0)
