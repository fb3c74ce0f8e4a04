"""Tokenizer-artifact query (round 8): the learned BPE merge TABLE —
the artifact a tokenizer ships (doc_bpe_token_stats consumes the
merges per-document; this exposes the table itself as a query
surface).

Rows-only (no DuckDB oracle — the merge loop is an iterative argmax
over corpus state, not SQL-expressible): pinned by the golden hash at
sf0.01 (tests/test_golden_rowsonly.py); the trainer itself is
cross-checked driver-vs-distributed in tests/test_bpe.py.  Scalar
output columns only, per the rows-only canonicalizer rule.

Registered after analytics_tpch3; rows-only queries order after every
oracled query, so the driver window is untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.bpe import train_bpe
from .registry import query


@query("bpe_merge_table")
def bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned BPE merge table over `documents` — (rank, left, right).
    Deterministic: exact integer pair counts with a lexicographic
    tiebreak; identical whichever trainer path (driver or distributed)
    runs."""
    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(docs, n_merges=40)
    return spark.createDataFrame(
        [(i, left, right) for i, (left, right) in enumerate(merges)],
        "rank INT, left STRING, right STRING",
    )
