"""Tokenizer-artifact queries (round 8 BPE, round 9 unigram-LM): the
learned vocabularies/merge tables — the artifacts a tokenizer ships
(doc_bpe_token_stats consumes the merges per-document; these expose
the tables themselves as query surfaces).

Rows-only (no DuckDB oracle — both trainers are iterative loops over
corpus state, not SQL-expressible): pinned by golden hashes at sf0.01
(tests/test_golden_rowsonly.py); each trainer is cross-checked
driver-vs-distributed bit-identically in tests/test_bpe.py /
tests/test_unigram.py.  Scalar output columns only, per the rows-only
canonicalizer rule.

Registered after analytics_tpch3; rows-only queries order after every
oracled query, so the driver window is untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.bpe import train_bpe
from ..operators.unigram import train_unigram
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


@query("doc_unigram_token_stats")
def doc_unigram_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM fertility audit (the doc_bpe_token_stats analog):
    train the 30-piece vocabulary, Viterbi-encode every document, emit
    per-doc whitespace-token vs piece counts.  Deterministic end to
    end (quantized-EM training + tiebroken Viterbi); rows-only golden
    at sf0.01."""
    from ..operators.unigram import train_unigram, unigram_encode

    # Dead end (r11 optimization): spread_for_cpu on the encode input
    # is a wash-to-loss here AND on doc_bpe_token_stats (med
    # 0.89/0.86 -> 0.96/1.00 best-of-6 interleaved at sf0.1) — the
    # driver-side training loop dominates both queries and the
    # per-row Python encode of 5k docs is cheap; don't retry.
    docs = load_table(spark, sf_dir, "documents")
    vocab = train_unigram(docs, vocab_size=30, seed_size=200)
    enc = unigram_encode(docs, vocab)
    return enc.select("doc_id", "n_pieces").join(
        docs.select(
            "doc_id",
            F.size(F.split(F.col("text"), " ")).cast("long").alias(
                "n_words"
            ),
        ),
        "doc_id",
    )


@query("unigram_vocab_table")
def unigram_vocab_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned unigram-LM (SentencePiece-style) piece vocabulary over
    `documents` — (rank, piece, logprob), Kudo 2018 EM over a seed
    substring vocabulary (operators/unigram.py).  Deterministic on
    both trainer paths: expected counts quantize to exact integers
    before accumulation, so driver and distributed EM produce the
    identical table; logprob rounded to 9 dp for golden stability."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = train_unigram(docs, vocab_size=30, seed_size=200)
    return spark.createDataFrame(
        [(i, p, lp) for i, (p, lp) in enumerate(vocab)],
        "rank INT, piece STRING, logprob DOUBLE",
    ).select("rank", "piece", F.round("logprob", 9).alias("logprob"))
