"""Distributed PCA (operators/pca.py) — exact covariance vs a
pure-Python scaled-long mirror, Gram-path agreement, planted principal
direction recovery, and projection correctness."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from org_revue_de_presse_trends_spark.operators.pca import (
    COORD_SCALE,
    PROD_SCALE,
    covariance_exact,
    gram_and_mean,
    pca_components,
    pca_project,
)


def _vectors(n: int, d: int = 6, planted: bool = False):
    """Deterministic pseudo-random vectors; ``planted`` adds a
    dominant direction along e0+e1."""
    out = []
    for r in range(n):
        v = [
            math.sin(r * 37.1 + c * 11.3) * 0.4 for c in range(d)
        ]
        if planted:
            t = math.sin(r * 5.7) * 3.0
            v[0] += t
            v[1] += t
        out.append([float(np.float32(x)) for x in v])
    return out


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _py_cov_exact(vecs, d):
    """Mirror of covariance_exact's scaled-long recipe."""

    def rnd(x):  # round-half-away-from-zero like Spark/DuckDB ROUND
        return int(
            math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)
        )

    n = len(vecs)
    out = {}
    sx = [
        sum(rnd(float(v[i]) * COORD_SCALE) for v in vecs)
        for i in range(d)
    ]
    for i in range(d):
        for j in range(i, d):
            sxy = sum(
                rnd(float(v[i]) * float(v[j]) * PROD_SCALE)
                for v in vecs
            )
            exy = sxy / n / PROD_SCALE
            mi = sx[i] / n / COORD_SCALE
            mj = sx[j] / n / COORD_SCALE
            out[(i + 1, j + 1)] = (n, sxy, round(exy - mi * mj, 9))
    return out


class TestCovariance:
    def test_matches_python_mirror_exactly(self, spark):
        vecs = _vectors(40, d=6)
        got = {
            (r["i"], r["j"]): (r["n"], r["sxy_scaled"], r["cov"])
            for r in covariance_exact(_df(spark, vecs), dim=6).collect()
        }
        assert got == _py_cov_exact(vecs, 6)

    def test_close_to_numpy_cov(self, spark):
        vecs = _vectors(200, d=6)
        got = {
            (r["i"], r["j"]): r["cov"]
            for r in covariance_exact(_df(spark, vecs), dim=6).collect()
        }
        ref = np.cov(np.array(vecs, dtype=np.float64).T, bias=True)
        for (i, j), c in got.items():
            assert c == pytest.approx(ref[i - 1, j - 1], abs=1e-6)

    def test_layout_independent(self, spark):
        df = _df(spark, _vectors(60, d=5))
        a = sorted(map(tuple, covariance_exact(df, dim=5).collect()))
        b = sorted(
            map(
                tuple,
                covariance_exact(
                    df.repartition(7, "vec_id"), dim=5
                ).collect(),
            )
        )
        assert a == b


class TestGramPath:
    def test_gram_agrees_with_exact(self, spark):
        vecs = _vectors(150, d=6)
        gram, mean, n = gram_and_mean(_df(spark, vecs), dim=6)
        assert n == 150
        cov_fast = gram / n - np.outer(mean, mean)
        exact = {
            (r["i"], r["j"]): r["cov"]
            for r in covariance_exact(_df(spark, vecs), dim=6).collect()
        }
        for (i, j), c in exact.items():
            assert cov_fast[i - 1, j - 1] == pytest.approx(c, abs=1e-6)

    def test_empty_raises(self, spark):
        df = _df(spark, []).filter(F.lit(False))
        with pytest.raises(Exception, match="no embedding rows"):
            gram_and_mean(df, dim=6)


class TestComponents:
    def test_planted_direction_recovered(self, spark):
        vecs = _vectors(300, d=6, planted=True)
        comps, ev, mean = pca_components(_df(spark, vecs), dim=6, k=3)
        # the planted direction is (e0+e1)/sqrt(2)
        planted = np.zeros(6)
        planted[0] = planted[1] = 1 / math.sqrt(2)
        assert abs(float(np.dot(comps[0], planted))) > 0.99
        # explained variance sorted descending, dominant way ahead
        assert ev[0] > ev[1] >= ev[2] > 0
        assert ev[0] > 10 * ev[1]
        # sign normalization: largest-|coeff| entry is positive
        for r in range(3):
            assert comps[r][np.argmax(np.abs(comps[r]))] > 0

    def test_k_validation(self, spark):
        df = _df(spark, _vectors(20, d=4))
        with pytest.raises(ValueError):
            pca_components(df, dim=4, k=0)
        with pytest.raises(ValueError):
            pca_components(df, dim=4, k=5)


class TestProjection:
    def test_projection_matches_numpy(self, spark):
        vecs = _vectors(80, d=6, planted=True)
        df = _df(spark, vecs)
        comps, _, mean = pca_components(df, dim=6, k=2)
        got = {
            r["vec_id"]: r["projected"]
            for r in pca_project(df, comps, mean).collect()
        }
        x = np.array(vecs, dtype=np.float64)
        want = (x - mean) @ comps.T
        assert len(got) == 80
        for i in range(80):
            assert np.allclose(got[i], want[i], atol=1e-9)

    def test_projection_preserves_other_columns(self, spark):
        df = _df(spark, _vectors(10, d=4)).withColumn(
            "tag", F.concat(F.lit("t"), F.col("vec_id"))
        )
        comps, _, mean = pca_components(df, dim=4, k=2)
        out = pca_project(df, comps, mean)
        assert set(out.columns) == {
            "vec_id",
            "embedding",
            "tag",
            "projected",
        }
        rows = out.collect()
        assert {r["tag"] for r in rows} == {f"t{i}" for i in range(10)}
        assert all(len(r["projected"]) == 2 for r in rows)
