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
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    One Spark aggregation produces the word-frequency table; the top
    ``max_words`` words by (count desc, word asc) — a deterministic,
    driver-bounded collect — seed the classic in-memory merge loop.
    Ties on pair frequency break lexicographically, so the merge list
    is a pure function of the corpus.

    Truncation is NOT silent: when the corpus vocabulary exceeds
    ``max_words`` the merges train on a biased (head-heavy) sample, so
    the dropped-word count and dropped token-mass fraction are
    computed in the same pass (the word table is localCheckpointed —
    one corpus scan), surfaced via ``warnings.warn``, and written into
    ``stats_out`` when given: keys ``n_words_total``,
    ``n_words_kept``, ``mass_total``, ``mass_kept``,
    ``truncated_mass_fraction``."""
    import warnings

    wc = word_counts(docs, text_col).localCheckpoint(eager=True)
    totals = wc.agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("mass")
    ).collect()[0]
    rows = (
        wc.orderBy(F.col("c").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    n_total = int(totals["n"] or 0)
    mass_total = int(totals["mass"] or 0)
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
