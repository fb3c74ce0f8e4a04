"""Trained quality classifier — MLlib ESCAPE HATCH variant.

Two quality-classifier stacks exist by design (r9 verdict item 6);
for "train a quality filter" the RECOMMENDED path is
``operators/classifier.py``: bit-deterministic training (quantized
gradients, driver ≡ distributed), rank-exact libm-free scoring with a
DuckDB-oracled end-to-end AUC query, and direct CLI wiring
(``prepare-corpus --classifier-model``).  Use THIS module only when
you specifically want Spark MLlib's machinery — L2 regularization,
LBFGS convergence, calibrated probabilities out of the box — and can
accept non-deterministic floats with no cross-engine oracle.

The model itself is the document filter of GPT-3 §2.2 / LLaMA's
pipeline (score documents by similarity to a "high-quality" reference
class, keep the high scorers), built on Spark's own ML stack: hashed
bag-of-tokens features (``HashingTF``, the fastText-style feature
map) + logistic regression.

Scale shape (100 TB): featurization is a pure map stage (token hash →
fixed-width sparse vector, no shuffle); training iterates only over
the (usually sampled) labeled subset via MLlib's treeAggregate;
scoring broadcasts the coefficient vector and is again map-only.  The
corpus never shuffles.

This is the engine-capability operator: the synthetic test fixture has
no linearly separable quality signal (every token occurs in every
class — only frequencies differ), so the correctness evidence is a
planted-separable corpus in tests/test_quality.py, not a driver
query.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def quality_classifier_scores(
    docs: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_filter: Column | None = None,
    n_features: int = 1 << 12,
    max_iter: int = 25,
    reg_param: float = 0.01,
) -> DataFrame:
    """(id_col, label, quality_prob, quality_pred) for every document.

    ``label`` is the weak-supervision column (1.0 = high quality —
    e.g. "comes from the curated reference corpus"); ``train_filter``
    restricts which rows train the model (defaults to all — at scale,
    pass a hash-sample predicate so the iterative fit touches a
    bounded subset while scoring stays corpus-wide).

    ``quality_prob`` is P(label=1 | tokens) under the fitted logistic
    model; filtering on it (or importance-sampling with it, the GPT-3
    Pareto trick) is the caller's policy.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF
    from pyspark.ml.functions import vector_to_array

    base = docs.select(
        F.col(id_col),
        label.cast("double").alias("label"),
        T.tokens(F.col(text_col)).alias("__toks"),
    )
    tf = HashingTF(
        inputCol="__toks", outputCol="features", numFeatures=n_features
    )
    feats = tf.transform(base)
    train = feats if train_filter is None else feats.filter(train_filter)
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=max_iter,
        regParam=reg_param,
    )
    model = lr.fit(train)
    scored = model.transform(feats)
    return scored.select(
        id_col,
        "label",
        vector_to_array(F.col("probability"))
        .getItem(1)
        .alias("quality_prob"),
        (F.col("prediction") == 1.0).alias("quality_pred"),
    )


def compression_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, raw_len, zlib_len, compression_ratio): per-document
    zlib compression ratio — the RedPajama-v2 quality signal
    (ccnet_* family): highly compressible text is repetitive
    boilerplate, incompressible text is often junk/binary; natural
    prose sits in a mid band.

    Arrow-batched map stage (mapInPandas + stdlib zlib, level 6 —
    pinned so the ratio is a pure function of the text): no shuffle,
    no external deps.  ratio = deflated/raw, exact integer division
    in doubles."""
    import zlib

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            # NULL text → empty string; empty docs get a NULL ratio
            # (0/0 is undefined, and Infinity would poison downstream
            # mid-band filters — review finding)
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            zl = raw.map(lambda b: len(zlib.compress(b, 6)))
            rl = raw.map(len)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "raw_len": rl,
                    "zlib_len": zl,
                    "compression_ratio": [
                        z / r if r else None for z, r in zip(zl, rl)
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        gen, "id long, raw_len long, zlib_len long, compression_ratio double"
    ).withColumnRenamed("id", id_col)
