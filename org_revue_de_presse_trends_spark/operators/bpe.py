"""Byte-pair-encoding tokenizer training and encoding (Sennrich et
al., "Neural Machine Translation of Rare Words with Subword Units",
ACL 2016 — the public BPE algorithm used by GPT-2-family tokenizers).

Scale shape: the corpus-sized work is ONE word-frequency aggregation
(map-side combined — distinct words ≪ token occurrences); merge
training then runs on the collected word table, which is bounded by
vocabulary size, not corpus size (the same bounded-driver pattern as
sample-trained k-means centroids: GPT-2's BPE was trained from a word
count table).  Encoding is a pure map stage — the merge list rides to
executors in the closure and each Arrow batch memoizes per distinct
word, so the per-row cost is a dict lookup for all but the first
occurrence of a word in the batch.

Determinism: merge selection ties break lexicographically on the pair,
so training is a pure function of the word counts; encoding is a pure
function of (text, merges).

Distributed training (round 8): when the vocabulary exceeds
``max_words``, ``train_bpe`` no longer has to truncate to the biased
frequency head — ``distributed="auto"`` (the default) switches to a
full-vocabulary DISTRIBUTED merge loop over the (word, count)
DataFrame itself.  Per round: adjacent-pair counts via ``zip_with``
over shifted slices of the symbol array (the house shingle pattern),
one map-side-combined groupBy(pair), a one-row TakeOrdered argmax
(count DESC then pair DESC — Spark's UTF8-binary string order equals
Python's code-point tuple order because UTF-8 is order-preserving, so
the tiebreak matches the driver loop exactly), then one ``aggregate``
fold per word rebuilding its symbol array (left-to-right,
non-overlapping — the same scan ``_merge_vocab`` does), and a
``localCheckpoint`` (the repo-wide iterative-loop invariant).  Output
is merge-for-merge identical to the driver loop on any corpus — the
paths differ only in where the loop state lives.

Unicode boundary (documented, not hidden): the driver path splits
words into Python code points, the distributed path into Java UTF-16
code units (``split(word, '')``) — identical for every BMP string
(all fixtures), divergent on astral-plane characters.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

#: end-of-word marker (the classic </w>) — lets merges distinguish
#: word-final subwords; chosen outside the fixtures' alphabet
EOW = "·"


def word_counts(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, c): corpus word frequencies — the only corpus-scale pass
    of BPE training."""
    return (
        docs.select(F.explode(T.tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _pair_stats(
    vocab: dict[tuple[str, ...], int]
) -> dict[tuple[str, str], int]:
    stats: dict[tuple[str, str], int] = {}
    for symbols, c in vocab.items():
        for a, b in zip(symbols, symbols[1:]):
            stats[(a, b)] = stats.get((a, b), 0) + c
    return stats


def _merge_vocab(
    vocab: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    merged = pair[0] + pair[1]
    out: dict[tuple[str, ...], int] = {}
    for symbols, c in vocab.items():
        res = []
        i = 0
        while i < len(symbols):
            if (
                i + 1 < len(symbols)
                and symbols[i] == pair[0]
                and symbols[i + 1] == pair[1]
            ):
                res.append(merged)
                i += 2
            else:
                res.append(symbols[i])
                i += 1
        out[tuple(res)] = out.get(tuple(res), 0) + c
    return out


def train_bpe(
    docs: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
    max_words: int = 1_000_000,
    stats_out: dict | None = None,
    distributed: str = "auto",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    One Spark aggregation produces the word-frequency table.  When the
    vocabulary fits ``max_words`` it is collected (deterministic,
    driver-bounded) and the classic in-memory merge loop runs; ties on
    pair frequency break lexicographically, so the merge list is a
    pure function of the corpus.

    ``distributed`` picks the over-budget behavior:

    * ``"auto"`` (default) — a vocabulary larger than ``max_words``
      trains with the full-vocabulary DISTRIBUTED merge loop
      (``_train_bpe_distributed``): no truncation, no bias, identical
      merge semantics — the 100 TB path.
    * ``"never"`` — the legacy head-truncation mode: train on the top
      ``max_words`` by (count desc, word asc).  Truncation is NOT
      silent: the dropped-word count and dropped token-mass fraction
      are computed in the same pass, surfaced via ``warnings.warn``,
      and written into ``stats_out`` when given (keys
      ``n_words_total``, ``n_words_kept``, ``mass_total``,
      ``mass_kept``, ``truncated_mass_fraction``).
    * ``"always"`` — force the distributed loop regardless of size
      (tests exercise it this way; same output by construction).
    """
    import warnings

    if distributed not in ("auto", "never", "always"):
        raise ValueError(
            f"distributed must be auto|never|always, got {distributed!r}"
        )
    wc = word_counts(docs, text_col).localCheckpoint(eager=True)
    totals = wc.agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("mass")
    ).collect()[0]
    n_total = int(totals["n"] or 0)
    mass_total = int(totals["mass"] or 0)
    if distributed == "always" or (
        distributed == "auto" and n_total > max_words
    ):
        if stats_out is not None:
            stats_out.update(
                n_words_total=n_total,
                n_words_kept=n_total,
                mass_total=mass_total,
                mass_kept=mass_total,
                truncated_mass_fraction=0.0,
                mode="distributed",
            )
        return _train_bpe_distributed(wc, n_merges)
    rows = (
        wc.orderBy(F.col("c").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    mass_kept = sum(int(r["c"]) for r in rows)
    trunc_frac = (
        (mass_total - mass_kept) / mass_total if mass_total else 0.0
    )
    if stats_out is not None:
        stats_out.update(
            n_words_total=n_total,
            n_words_kept=len(rows),
            mass_total=mass_total,
            mass_kept=mass_kept,
            truncated_mass_fraction=trunc_frac,
            mode="driver",
        )
    if n_total > len(rows):
        warnings.warn(
            f"train_bpe: vocabulary truncated to max_words={max_words} "
            f"of {n_total} distinct words — {trunc_frac:.1%} of token "
            "mass dropped; merges train on the frequency head",
            stacklevel=2,
        )
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        key = tuple(r["word"]) + (EOW,)
        vocab[key] = vocab.get(key, 0) + int(r["c"])
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        stats = _pair_stats(vocab)
        if not stats:
            break
        best = max(stats.items(), key=lambda kv: (kv[1], kv[0]))[0]
        # max on (count, pair) makes the LARGEST pair win count ties —
        # deterministic; the specific tie order is part of the contract
        merges.append(best)
        vocab = _merge_vocab(vocab, best)
    return merges


def _pair_counts_df(d: DataFrame) -> DataFrame:
    """Adjacent-pair counts over the symbol column: zip_with over
    shifted slices (never references the source array inside the
    per-element lambda), explode, one map-side-combined groupBy."""
    pairs = F.expr(
        "zip_with(slice(symbols, 1, size(symbols) - 1),"
        " slice(symbols, 2, size(symbols) - 1),"
        " (a, b) -> struct(a AS l, b AS r))"
    )
    return (
        d.select(F.explode(pairs).alias("p"), "c")
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("c").alias("pc"))
    )


def _merge_fold(col, left: str, right: str):
    """Greedy left-to-right non-overlapping (left, right)→left||right
    merge over a symbol array as one JVM-side fold — the scan
    `_merge_vocab` performs, expressed as `aggregate`.  Equivalence:
    the fold's accumulator tail can only equal `left` via the ORIGINAL
    sequence (a just-merged tail is left||right ≠ left since right is
    non-empty), so both consume matches identically.  try_element_at
    keeps the empty-accumulator probe ANSI-safe."""
    merged = left + right
    return F.aggregate(
        col,
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, s: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - F.lit(1)),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _train_bpe_distributed(
    wc: DataFrame, n_merges: int
) -> list[tuple[str, str]]:
    """Full-vocabulary merge loop over the (word, c) DataFrame: per
    round one pair-count shuffle (bounded by |vocabulary|, never the
    corpus), a one-row TakeOrdered argmax — count DESC then pair DESC,
    matching the driver loop's max((count, pair)) because UTF-8 byte
    order preserves code-point order — one merge fold per word, and a
    localCheckpoint (iterative-loop invariant: flat plans)."""
    d = wc.withColumn(
        "symbols",
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW))),
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            _pair_counts_df(d)
            .orderBy(
                F.col("pc").desc(),
                F.col("left").desc(),
                F.col("right").desc(),
            )
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right = best[0]["left"], best[0]["right"]
        merges.append((left, right))
        d = d.withColumn(
            "symbols", _merge_fold(F.col("symbols"), left, right)
        ).localCheckpoint(eager=True)
    return merges


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    symbols = list(word) + [EOW]
    while len(symbols) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(symbols, symbols[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        symbols[best_i : best_i + 2] = [
            symbols[best_i] + symbols[best_i + 1]
        ]
    return symbols


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, bpe_tokens array<string>, n_bpe_tokens): encode every
    document with the learned merges — lowest-rank (earliest-learned)
    applicable merge first, the standard BPE encode order.

    mapInPandas with a per-batch word memo: natural text repeats words
    heavily, so the python merge loop runs once per DISTINCT word per
    batch and every other occurrence is a dict hit."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            memo: dict[str, list[str]] = {}

            def enc(text) -> list[str]:
                if not isinstance(text, str):  # NULL text → no tokens
                    return []
                out: list[str] = []
                for w in text.split(" "):
                    if not w:
                        continue
                    got = memo.get(w)
                    if got is None:
                        got = _encode_word(w, ranks)
                        memo[w] = got
                    out.extend(got)
                return out

            toks = pdf[text_col].map(enc)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "bpe_tokens": toks,
                    "n_bpe_tokens": toks.map(len),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        gen, "id long, bpe_tokens array<string>, n_bpe_tokens long"
    ).withColumnRenamed("id", id_col)
