"""DSIR importance weighting (operators/dsir.py): planted-distribution
sign checks, feature-stream shape, and a closed-form tiny-corpus value.
The sf0.01 driver query is additionally oracled (test_driver_contract:
doc_dsir_importance hash-matches DuckDB)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from org_revue_de_presse_trends_spark.operators import dsir


@pytest.fixture(scope="module")
def corpus(spark):
    # target-looking docs share the "alpha beta" vocabulary; raw-only
    # docs use disjoint tokens.  doc 4 is an unlabeled target-alike:
    # DSIR must rank it above the raw-alike doc 5.
    rows = [
        (1, True, "alpha beta alpha beta alpha"),
        (2, True, "beta alpha beta alpha beta"),
        (3, False, "gamma delta gamma delta gamma"),
        (4, False, "alpha beta alpha beta"),
        (5, False, "gamma delta gamma delta"),
    ]
    return spark.createDataFrame(rows, "doc_id long, is_tgt boolean, text string")


def test_feature_stream_is_unigrams_plus_bigrams(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    feats = sorted(
        r["feature"]
        for r in dsir.with_ngram_features(df).select("feature").collect()
    )
    assert feats == ["a", "a b", "b", "b c", "c"]


def test_single_token_doc_has_no_bigrams(spark):
    df = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    feats = [
        r["feature"]
        for r in dsir.with_ngram_features(df).select("feature").collect()
    ]
    assert feats == ["solo"]


def test_bucket_matches_md5_prefix(spark):
    df = spark.createDataFrame([("alpha",), ("a b",)], "f string")
    got = {
        r["f"]: r["b"]
        for r in df.select("f", dsir.bucket_of(F.col("f")).alias("b")).collect()
    }
    for s, b in got.items():
        want = int(hashlib.md5(s.encode()).hexdigest()[:6], 16) % dsir.N_BUCKETS
        assert b == want, s


def test_target_alike_outranks_raw_alike(corpus):
    out = {
        r["doc_id"]: r["log_importance"]
        for r in dsir.importance_weights(corpus, F.col("is_tgt")).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    # target-vocabulary docs (labeled or not) above raw-vocabulary
    # docs.  (Absolute signs are all negative here: with B=1024
    # add-one smoothing and a 5-doc corpus the smoothing mass
    # dominates both LMs — only the ORDER is meaningful at toy size.)
    assert min(out[1], out[2], out[4]) > max(out[3], out[5])


def test_matches_closed_form_reference(corpus):
    """Recompute the exact pipeline in Python (same hash, same
    smoothing, same scaled-long rounding) and compare values."""
    rows = corpus.collect()
    B = dsir.N_BUCKETS

    def feats(text):
        t = text.split(" ")
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:6], 16) % B

    c_raw: dict[int, int] = {}
    c_tgt: dict[int, int] = {}
    for r in rows:
        for g in feats(r["text"]):
            b = bucket(g)
            c_raw[b] = c_raw.get(b, 0) + 1
            if r["is_tgt"]:
                c_tgt[b] = c_tgt.get(b, 0) + 1
    n_raw = sum(c_raw.values())
    n_tgt = sum(c_tgt.values())
    r_scaled = {
        b: round(
            (
                math.log((c_tgt.get(b, 0) + 1) / (n_tgt + B))
                - math.log((c_raw[b] + 1) / (n_raw + B))
            )
            * 1e6
        )
        for b in c_raw
    }
    want = {}
    for r in rows:
        bs = [bucket(g) for g in feats(r["text"])]
        want[r["doc_id"]] = round(sum(r_scaled[b] for b in bs) / len(bs) / 1e6, 6)
    got = {
        r["doc_id"]: r["log_importance"]
        for r in dsir.importance_weights(corpus, F.col("is_tgt")).collect()
    }
    assert got == pytest.approx(want)
