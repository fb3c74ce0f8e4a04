"""DSIR-style data selection with hashed n-gram importance weights
(Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023 — public algorithm).

Importance weight of a document x under target distribution p and raw
distribution q, both modeled as bag-of-hashed-n-gram unigram LMs:

    log w(x) = Σ_{g ∈ features(x)} [ log p̂(b(g)) − log q̂(b(g)) ]

with features = unigrams + bigrams (the paper's §3 feature set),
b(g) a hash into B buckets, and add-one smoothing on the bucket
counts.  Documents whose n-gram profile looks like the target corpus
score high; selection then keeps the top-weighted (or resamples
proportionally).

Cross-engine determinism (the oracle contract):

- b(g) = base-16 value of the first 6 hex chars of md5(g), mod B —
  md5 is identical everywhere; DuckDB reproduces the hex decode with
  strpos arithmetic (no conv() there).
- each bucket's log-ratio is rounded to 6 decimals AND scaled to a
  long BEFORE the per-doc sum (longs add associatively; double ln()
  may differ in the last ulp between libm and the JVM — the
  doc_unigram_surprisal discipline).

Scale shape (100 TB): two bucket-count aggregations (map-side
combined, ≤ B rows each out), the B-row log-ratio table broadcast
back onto the exploded feature stream, one per-doc aggregation.  No
self-joins, no windows, no driver materialization — the LM is an
aggregate, never a collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

#: hashed feature buckets (the paper uses 10k; 1024 keeps the toy
#: fixtures' buckets well-populated — a constructor argument at scale)
N_BUCKETS = 1024

_SCALE = 1_000_000.0


def bucket_of(col: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Hash a feature string into [0, n_buckets): base-16 value of the
    first 6 md5 hex chars, mod n_buckets.  24 bits ≪ long — no
    overflow, ANSI-safe."""
    return F.conv(F.substring(F.md5(col), 1, 6), 16, 10).cast("long") % n_buckets


def with_ngram_features(
    df: DataFrame, text_col: str = "text", out_col: str = "feature"
) -> DataFrame:
    """Explode ``text_col`` into the DSIR feature stream: unigrams +
    space-joined bigrams.  The token array is staged behind a
    projection boundary first (interpreted HOFs re-evaluate a subtree
    once per REFERENCE — CLAUDE.md), and bigrams come from zip_with
    over two shifted slices, never a per-element lambda over the
    source array."""
    staged = df.withColumn("_toks", T.tokens(F.col(text_col)))
    n = F.size(F.col("_toks"))
    bigrams = F.zip_with(
        F.slice(F.col("_toks"), 1, F.greatest(n - 1, F.lit(0))),
        F.slice(F.col("_toks"), 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        staged.withColumn("_feats", F.concat(F.col("_toks"), bigrams))
        .withColumn(out_col, F.explode(F.col("_feats")))
        .drop("_toks", "_feats")
    )


def importance_weights(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(id_col, n_features, log_importance) — per-document mean hashed
    n-gram log importance ratio.  ``target_pred`` marks the rows whose
    distribution is the target p (e.g. ``F.col("lang") == "en"``); the
    raw distribution q is the whole input."""
    feats = with_ngram_features(
        docs.select(id_col, target_pred.alias("_is_tgt"), text_col), text_col
    ).select(
        id_col, "_is_tgt", bucket_of(F.col("feature"), n_buckets).alias("bucket")
    )
    # narrow repartition barrier: the LM-count branch and the join-back
    # branch below both consume feats — without an exchange between
    # them each branch re-runs the explode + md5 bucket hash over the
    # whole corpus (the self-join-sides lesson, CLAUDE.md).  Keying by
    # id_col pre-groups the final per-doc aggregate for free
    # (measured: 2.1 s → 1.4 s warm at sf0.1, values unchanged).
    # Dead end (r11 optimization): replacing this raw barrier with a
    # map-combined groupBy(id, _is_tgt, bucket).count() pre-aggregate
    # (r8b's fact≫agg heuristic) is a wash-to-loss — med 1.63 → 1.71 s
    # interleaved best-of-6 at sf0.1, values identical: at 1024
    # buckets a doc's features hit ~70% distinct buckets, so the
    # combine shrinks little and the second (per-doc) shuffle costs
    # what the combine saves.  Don't retry below ~4x feature:bucket
    # repetition.
    feats = feats.repartition(F.col(id_col))
    counts = feats.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.sum(F.col("_is_tgt").cast("long")).alias("c_tgt"),
    )
    totals = counts.agg(
        F.sum("c_raw").alias("n_raw"), F.sum("c_tgt").alias("n_tgt")
    )
    b = float(n_buckets)
    lm = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(
            (
                F.log(
                    (F.col("c_tgt") + 1).cast("double")
                    / (F.col("n_tgt") + b).cast("double")
                )
                - F.log(
                    (F.col("c_raw") + 1).cast("double")
                    / (F.col("n_raw") + b).cast("double")
                )
            )
            * F.lit(_SCALE)
        )
        .cast("long")
        .alias("r_scaled"),
    )
    return (
        feats.join(F.broadcast(lm), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.round(
                F.sum("r_scaled").cast("double")
                / F.count(F.lit(1))
                / F.lit(_SCALE),
                6,
            ).alias("log_importance"),
        )
    )
