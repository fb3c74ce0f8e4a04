"""Quality-classifier training + evaluation queries
(operators/classifier.py × operators/evalmetrics.py) — the curation
loop closed: train a fastText-style hashed-BoW logistic model, score a
held-out split with exact integer arithmetic, and read the exact AUC.

Two surfaces:

- ``doc_lang_classifier_weights`` — trains at query time (rows-only
  golden: GD over quantized-integer gradient sums is bit-deterministic
  and driver ≡ distributed, tests/test_classifier.py).
- ``doc_lang_classifier_auc`` — ORACLED: scores the odd-doc_id holdout
  with the COMMITTED model below (oracle strings are static, so the
  oracled query ships a model artifact — the realistic deploy shape)
  and computes exact tie-corrected AUC.  Scoring is rank-exact without
  libm: ``Σ count_b·wq_b / n_tokens`` — exact integers into one pinned
  IEEE division (sigmoid is monotone, so AUC is unchanged).

The fixture's ``lang`` label is hash-assigned independently of the
synthetic text, so the HONEST holdout AUC sits near 0.5 — that exact
value is what the oracle verifies; that the trainer actually LEARNS is
pinned on planted-signal corpora in tests/test_classifier.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.classifier import score_scaled_sql, train_logreg
from ..operators.evalmetrics import auc
from ..operators.urls import md5_bucket_sql
from .registry import query

#: feature dimension of the hashed bag-of-words space
_DIM = 64

#: AUC quantization: score magnitudes are ~|w·x|·1e9 (≤ ~6e7 for this
#: model), so 1e-4 keeps the distinct-score sketch ≤ ~2·|range|·1e-4
#: rows at any corpus size
_AUC_SCALE = 1e-4

#: committed model artifact: round(w·1e9) integer weights of
#: train_logreg over the sf0.01 EVEN-doc_id split with label
#: lang == 'en' (dim 64, 12 iterations, lr 2.0) — regenerated-fixture
#: provenance is pinned by tests/test_classifier.py::
#: test_committed_model_matches_retraining, which retrains and
#: compares; the oracle below shares these literals with the Spark
#: side, so the AUC query stays value-exact regardless of drift.
_MODEL_WQ = [
    0, 10426825, 0, 0, -6897618, 0, 8766812, -27015493, -9549845, 0,
    0, -36542458, -58785420, 0, 0, 0, 0, 0, 0, 12545380, -8090364, 0,
    0, 0, 0, 0, -19676331, 13347680, 0, 0, -328166, -26081202, 0,
    47738189, 0, 0, 0, 0, 0, 0, 0, 0, -1975037, 0, -17145167, 0,
    -11723607, -8636836, 0, 0, -42346928, 0, 0, 21928160, 0, 0,
    -3576799, 0, -12127675, 0, -21263260, 0, -34559244, -26237610,
]


@query("doc_lang_classifier_weights")
def doc_lang_classifier_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hashed-BoW logistic-regression weights trained on the even-doc
    split for lang=='en' — (feature_id, weight), intercept at
    feature_id −1.  Bit-deterministic (quantized-integer gradient
    accumulation; driver ≡ distributed pinned in tests); rows-only
    golden at sf0.01."""
    docs = load_table(spark, sf_dir, "documents")
    w, b = train_logreg(
        docs.filter(F.col("doc_id") % 2 == 0),
        F.col("lang") == "en",
        dim=_DIM,
    )
    return spark.createDataFrame(
        [(-1, b)] + [(i, x) for i, x in enumerate(w)],
        "feature_id INT, weight DOUBLE",
    )


def _auc_oracle() -> str:
    score_sql = score_scaled_sql(
        "duckdb",
        _MODEL_WQ,
        _DIM,
        "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1",
    )
    return f"""
    WITH scored AS ({score_sql}),
    base AS (
        SELECT s.score AS s,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
        FROM scored s JOIN documents d ON d.doc_id = s.doc_id
        -- NULL label = unknown ground truth: evalmetrics.auc drops it
        -- on the Spark side; the oracle must mirror that totality
        -- (review-caught r9 — fixtures are currently NULL-free, but
        -- the driver regenerates them)
        WHERE d.lang IS NOT NULL
    ),
    g AS (
        SELECT CAST(ROUND(s * 0.0001) AS BIGINT) AS sq,
               CAST(SUM(y) AS BIGINT) AS p,
               CAST(SUM(1 - y) AS BIGINT) AS q
        FROM base GROUP BY 1
    ),
    c AS (
        SELECT p, q,
               CAST(COALESCE(SUM(q) OVER (ORDER BY sq
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS qlt
        FROM g
    ),
    agg AS (
        SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
               CAST(SUM(q) AS BIGINT) AS n_neg,
               SUM(CAST(p AS HUGEINT) * CAST(qlt AS HUGEINT) * 2
                   + CAST(p AS HUGEINT) * CAST(q AS HUGEINT)) AS u2
        FROM c
    )
    SELECT n_pos, n_neg,
           CASE WHEN n_pos > 0 AND n_neg > 0 THEN
               ROUND(CAST(u2 AS DOUBLE)
                     / (2.0 * CAST(n_pos AS DOUBLE)
                        * CAST(n_neg AS DOUBLE)), 9)
           END AS auc
    FROM agg
    """


@query("doc_lang_classifier_auc", _auc_oracle())
def doc_lang_classifier_auc(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact tie-corrected AUC of the COMMITTED hashed-BoW model on
    the odd-doc_id holdout (operators/evalmetrics.auc over the
    rank-exact integer score) — the evaluation end of the curation
    loop, value-exact in DuckDB including the near-0.5 truth of the
    fixture's text-independent label."""
    docs = load_table(spark, sf_dir, "documents")
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    bucket = f"({md5_bucket_sql('spark', 't', 6)} % {_DIM})"
    witems = ", ".join(str(x) for x in _MODEL_WQ)
    scored = (
        odd.select(
            "doc_id", F.explode(F.split("text", " ")).alias("t")
        )
        .filter(F.col("t") != "")
        .groupBy("doc_id", F.expr(f"{bucket} AS b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.expr(
                f"CAST(SUM(c * element_at(array({witems}),"
                f" CAST(b + 1 AS INT))) AS DOUBLE)"
                f" / CAST(SUM(c) AS DOUBLE)"
            ).alias("score")
        )
    )
    lab = scored.join(odd.select("doc_id", "lang"), "doc_id")
    return auc(lab, "score", F.col("lang") == "en", scale=_AUC_SCALE)
