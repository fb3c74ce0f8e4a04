"""Hashed-BoW logistic-regression trainer (operators/classifier.py):
driver≡distributed bit-equality, planted-signal learning, committed
model provenance, and rank-exact integer scoring."""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from org_revue_de_presse_trends_spark.catalog import load_table
from org_revue_de_presse_trends_spark.operators import classifier as C

SF = "/root/testdata/sf0.01"


def _planted(spark, n=400):
    """Synthetic corpus where one marker token decides the label —
    genuinely learnable, unlike the fixture's hash-assigned lang."""
    return spark.range(n).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 2 = 0"
        " THEN concat('posmark filler', CAST(id % 7 AS STRING),"
        "             ' noise', CAST(id % 11 AS STRING), ' words')"
        " ELSE concat('negmark filler', CAST(id % 7 AS STRING),"
        "             ' noise', CAST(id % 11 AS STRING), ' words')"
        " END AS text",
        "CAST(id % 2 = 0 AS BOOLEAN) AS y",
    )


def test_driver_equals_distributed_bit_for_bit(spark):
    docs = load_table(spark, SF, "documents").filter(
        F.col("doc_id") % 2 == 0
    )
    a = C.train_logreg(docs, F.col("lang") == "en", distributed="never")
    b = C.train_logreg(docs, F.col("lang") == "en", distributed="always")
    assert a == b  # weights AND bias, floats included


def test_training_is_pure_function_of_corpus(spark):
    docs = _planted(spark, 100)
    a = C.train_logreg(docs, F.col("y"), iters=4)
    b = C.train_logreg(docs, F.col("y"), iters=4)
    assert a == b


def test_learns_planted_signal(spark):
    docs = _planted(spark)
    train = docs.filter(F.col("doc_id") < 300)
    held = [
        (r["text"], bool(r["y"]))
        for r in docs.filter(F.col("doc_id") >= 300).collect()
    ]
    w, b = C.train_logreg(train, F.col("y"))
    pos_b = C.token_bucket("posmark", 64)
    neg_b = C.token_bucket("negmark", 64)
    assert w[pos_b] > 0 > w[neg_b]

    def score(text):
        cts, n = C._doc_features(text, 64)
        return sum(w[k] * c for k, c in cts.items()) / n + b

    # exact AUC over the holdout in python
    scored = sorted((score(t), y) for t, y in held)
    pos = [s for s, y in scored if y]
    neg = [s for s, y in scored if not y]
    wins = sum(
        1.0 if p > q else 0.5 if p == q else 0.0
        for p in pos for q in neg
    )
    auc = wins / (len(pos) * len(neg))
    assert auc > 0.95, auc


def test_committed_model_matches_retraining(spark):
    """The oracled AUC query ships _MODEL_WQ as literals; retraining
    on the same split must reproduce them exactly.  A failure here
    names FIXTURE DRIFT (the driver regenerated documents differently)
    — re-train and re-commit the constants; the oracled query itself
    stays green either way because both engines share the literals."""
    from org_revue_de_presse_trends_spark.plans.classifier_ext import (
        _DIM,
        _MODEL_WQ,
    )

    docs = load_table(spark, SF, "documents").filter(
        F.col("doc_id") % 2 == 0
    )
    w, _ = C.train_logreg(docs, F.col("lang") == "en", dim=_DIM)
    assert C.scaled_weights(w) == _MODEL_WQ


def test_score_sql_cross_engine_and_rank_exact(spark, duck):
    """Both engines' score_scaled_sql emit IDENTICAL doubles, and the
    integer score ranks exactly like the float sigmoid score."""
    docs = _planted(spark, 120)
    w, b = C.train_logreg(docs.filter(F.col("doc_id") < 60), F.col("y"))
    wq = C.scaled_weights(w)
    docs.createOrReplaceTempView("_clf_docs")
    got_s = {
        r["doc_id"]: r["score"]
        for r in spark.sql(
            C.score_scaled_sql(
                "spark", wq, 64,
                "SELECT doc_id, text FROM _clf_docs WHERE doc_id >= 60",
            )
        ).collect()
    }
    duck.execute("CREATE OR REPLACE TEMP TABLE _clf(doc_id BIGINT, text VARCHAR)")
    duck.executemany(
        "INSERT INTO _clf VALUES (?, ?)",
        [(r["doc_id"], r["text"])
         for r in docs.filter(F.col("doc_id") >= 60).collect()],
    )
    got_d = dict(
        duck.execute(
            C.score_scaled_sql(
                "duckdb", wq, 64, "SELECT doc_id, text FROM _clf"
            )
        ).fetchall()
    )
    duck.execute("DROP TABLE _clf")
    assert got_s == got_d  # identical doubles, not approx

    texts = {
        r["doc_id"]: r["text"]
        for r in docs.filter(F.col("doc_id") >= 60).collect()
    }

    def sig(text):
        cts, n = C._doc_features(text, 64)
        z = sum(w[k] * c for k, c in cts.items()) / n + b
        return 1.0 / (1.0 + math.exp(-z))

    ri = sorted(got_s, key=lambda k: (got_s[k], k))
    rf = sorted(got_s, key=lambda k: (sig(texts[k]), k))
    assert ri == rf


def test_null_label_and_null_text_rows(spark):
    """NULL label = unknown ground truth → dropped (the evalmetrics
    convention, mirrored by the AUC oracle's WHERE lang IS NOT NULL);
    NULL text contributes no features instead of crashing the Python
    worker (review-caught r9)."""
    base = _planted(spark, 80)
    with_null_label = base.unionByName(
        spark.sql(
            "SELECT CAST(999 AS BIGINT) AS doc_id,"
            " 'posmark filler' AS text, CAST(NULL AS BOOLEAN) AS y"
        )
    )
    assert C.train_logreg(
        with_null_label, F.col("y"), iters=3
    ) == C.train_logreg(base, F.col("y"), iters=3)
    with_null_text = base.unionByName(
        spark.sql(
            "SELECT CAST(998 AS BIGINT) AS doc_id,"
            " CAST(NULL AS STRING) AS text, TRUE AS y"
        )
    )
    w, b = C.train_logreg(with_null_text, F.col("y"), iters=3)
    assert all(math.isfinite(x) for x in w) and math.isfinite(b)


def test_guards(spark):
    docs = _planted(spark, 10)
    with pytest.raises(ValueError, match="auto"):
        C.train_logreg(docs, F.col("y"), distributed="sometimes")
    with pytest.raises(ValueError, match="empty"):
        C.train_logreg(docs.filter("doc_id < 0"), F.col("y"))
    with pytest.raises(ValueError, match="weights"):
        C.score_scaled_sql("spark", [1, 2], 64, "SELECT 1")


def test_model_artifact_matches_hand_rolled_quantization(spark):
    """model_artifact is THE documented way to write the CLI's
    --classifier-model JSON: same round(x*G_SCALE) quantization the
    model definition (scaled_weights / the committed literals) uses,
    so it must equal the hand-rolled form the tests pinned before it
    existed, and reject a dim mismatch."""
    docs = _planted(spark, 30)
    w, b = C.train_logreg(docs, F.col("y"), iters=3)
    art = C.model_artifact(w, b, dim=64)
    assert art["wq"] == C.scaled_weights(w)
    assert art["bq"] == round(b * C.G_SCALE)
    assert art["dim"] == 64
    import json

    assert json.loads(json.dumps(art)) == art  # JSON-serializable
    with pytest.raises(ValueError, match="weights"):
        C.model_artifact(w, b, dim=32)


def test_auto_switch_past_max_docs_is_identical(spark):
    docs = _planted(spark, 200)
    a = C.train_logreg(docs, F.col("y"), iters=3, max_docs=50,
                       distributed="auto")
    b = C.train_logreg(docs, F.col("y"), iters=3, distributed="never")
    assert a == b


def test_intercept_cut_matches_sigmoid_thresholding(spark):
    """r9 verdict item 5: with the scaled intercept ``bq`` included,
    the emitted score is exactly G_SCALE x logit — so a user's
    sigmoid-probability cut p and the CLI's raw-score threshold
    G_SCALE*ln(p/(1-p)) keep the SAME document set, and the intercept
    is a pure constant shift (rank-identical to the bq=0 default)."""
    docs = _planted(spark, 200)
    w, b = C.train_logreg(docs, F.col("y"), iters=4)
    wq, bq = C.scaled_weights(w), round(b * C.G_SCALE)
    rows = {
        r["doc_id"]: r["clf_score"]
        for r in C.with_classifier_score(docs, wq, bq=bq).collect()
        if r["clf_score"] is not None
    }
    assert len(rows) == 200
    # pick p at the median score so the cut provably splits the corpus
    med = sorted(rows.values())[len(rows) // 2]
    p = 1.0 / (1.0 + math.exp(-med / C.G_SCALE))
    thr = C.G_SCALE * math.log(p / (1.0 - p))
    kept_raw = {d for d, s in rows.items() if s >= thr - 1e-6}
    kept_sig = {
        d for d, s in rows.items()
        if 1.0 / (1.0 + math.exp(-s / C.G_SCALE)) >= p - 1e-15
    }
    assert kept_raw == kept_sig
    assert 0 < len(kept_raw) < len(rows)
    # bq is a constant shift: same ranking as the bq=0 default
    base = {
        r["doc_id"]: r["clf_score"]
        for r in C.with_classifier_score(docs, wq).collect()
        if r["clf_score"] is not None
    }
    order = sorted(rows, key=lambda d: (rows[d], d))
    assert order == sorted(base, key=lambda d: (base[d], d))
