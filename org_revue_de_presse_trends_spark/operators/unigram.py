"""Unigram-LM subword tokenizer training and encoding (Kudo,
"Subword Regularization", ACL 2018 — the SentencePiece unigram model;
public algorithm).  The second standard subword tokenizer beside BPE
(operators/bpe.py), built on the same bounded-word-table discipline.

Algorithm: seed a large candidate vocabulary (frequent word substrings
+ all single characters), then alternate EM rounds (E: per-word lattice
forward-backward expected piece counts under the current piece
probabilities; M: re-estimate probabilities from the expected counts)
with prune rounds (drop the lowest-expected-count pieces, keeping
single characters for coverage) until the target vocabulary size is
reached.  Pruning by expected count is the standard simplification of
SentencePiece's likelihood-loss ranking; the EM itself is the real
soft-EM over the segmentation lattice.

Scale shape: identical to ``train_bpe`` — the only corpus-scale pass
is the word-frequency aggregation (map-side combined; distinct words
≪ token occurrences).  The EM state is bounded by |seed vocabulary|,
never the corpus.  Two paths share every numeric decision:

* driver (vocabulary fits ``max_words``): the word table is collected
  and the EM loop runs in-process;
* distributed (``distributed="auto"`` above ``max_words``, or
  ``"always"``): the E-step maps over the (word, c) DataFrame with
  ``mapInPandas`` — each batch runs the SAME per-word lattice code and
  emits per-piece quantized expected counts, summed exactly.

Driver ≡ distributed bit-identity (the r7b determinism recipe):
floating point enters ONLY inside the per-word forward-backward, which
is the same Python function evaluated per word on both paths (a pure
function of (word, piece log-probs) — partitioning cannot reorder it).
Each word's expected piece counts are QUANTIZED to 1e9-scaled integers
before accumulation, and the accumulation is exact (Python int /
Spark ``decimal(38,0)`` sum — order-independent, overflow-free), so
the M-step sees identical integers on both paths and derives identical
log-probabilities.  The quantization is part of the model definition,
not a tolerance.

Unicode boundary: words are split into Python code points on both
paths (the E-step is Python everywhere), so unlike ``train_bpe`` there
is no UTF-16 divergence on astral-plane characters.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import word_counts

#: expected-count quantization scale — exact-integer accumulation
#: makes driver and distributed training bit-identical
Q_SCALE = 1_000_000_000


def _seed_candidates(
    words: list[tuple[str, int]],
    seed_size: int,
    max_piece_len: int,
) -> list[tuple[str, int]]:
    """Top ``seed_size`` substrings (length ≥ 2, each OCCURRENCE
    counted, weighted by word count) plus every single character —
    (count desc, piece asc) tiebreak, pure integers."""
    counts: dict[str, int] = {}
    chars: dict[str, int] = {}
    for w, c in words:
        n = len(w)
        for i in range(n):
            chars[w[i]] = chars.get(w[i], 0) + c
            for ln in range(2, min(max_piece_len, n - i) + 1):
                p = w[i : i + ln]
                counts[p] = counts.get(p, 0) + c
    multi = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return sorted(chars.items(), key=lambda kv: (-kv[1], kv[0])) + multi[
        :seed_size
    ]


def _word_expected_counts(
    word: str,
    wc: int,
    logp: dict[str, float],
    max_piece_len: int,
) -> dict[str, float] | None:
    """Soft-EM E-step for one word: lattice forward-backward expected
    counts of each matching piece, scaled by the word's corpus count.
    Returns None when the word is unsegmentable under ``logp`` (cannot
    happen while single characters stay in the vocabulary)."""
    n = len(word)
    NEG = float("-inf")
    matches: list[tuple[int, int, str, float]] = []
    for j in range(n):
        for i in range(j + 1, min(j + max_piece_len, n) + 1):
            lp = logp.get(word[j:i])
            if lp is not None:
                matches.append((j, i, word[j:i], lp))
    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    for j, i, _, lp in matches:  # matches are sorted by j
        if alpha[j] != NEG:
            x = alpha[j] + lp
            a = alpha[i]
            alpha[i] = (
                x
                if a == NEG
                else (a + math.log1p(math.exp(x - a)) if a >= x
                      else x + math.log1p(math.exp(a - x)))
            )
    z = alpha[n]
    if z == NEG:
        return None
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for j, i, _, lp in reversed(matches):
        if beta[i] != NEG:
            x = beta[i] + lp
            b = beta[j]
            beta[j] = (
                x
                if b == NEG
                else (b + math.log1p(math.exp(x - b)) if b >= x
                      else x + math.log1p(math.exp(b - x)))
            )
    out: dict[str, float] = {}
    for j, i, p, lp in matches:
        if alpha[j] != NEG and beta[i] != NEG:
            e = math.exp(alpha[j] + lp + beta[i] - z) * wc
            if e > 0.0:
                out[p] = out.get(p, 0.0) + e
    return out


def _e_step_quantized(
    words: list[tuple[str, int]],
    logp: dict[str, float],
    max_piece_len: int,
) -> dict[str, int]:
    """Driver-side E-step: exact-integer accumulation of the quantized
    per-word expected counts."""
    acc: dict[str, int] = {}
    for w, c in words:
        e = _word_expected_counts(w, c, logp, max_piece_len)
        if not e:
            continue
        for p, v in e.items():
            q = round(v * Q_SCALE)
            if q:
                acc[p] = acc.get(p, 0) + q
    return acc


def _e_step_distributed(
    wc_df: DataFrame,
    logp: dict[str, float],
    max_piece_len: int,
) -> dict[str, int]:
    """Distributed E-step: the SAME per-word function over the (word,
    c) DataFrame; per-batch partial dicts shrink the shuffle to one
    row per (batch, piece), summed in decimal(38,0) — exact, so the
    result equals the driver accumulation integer-for-integer."""

    def gen(batches):
        for pdf in batches:
            acc: dict[str, int] = {}
            for w, c in zip(pdf["word"], pdf["c"]):
                e = _word_expected_counts(
                    w, int(c), logp, max_piece_len
                )
                if not e:
                    continue
                for p, v in e.items():
                    q = round(v * Q_SCALE)
                    if q:
                        acc[p] = acc.get(p, 0) + q
            if acc:
                yield pd.DataFrame(
                    {"piece": list(acc), "q": list(acc.values())}
                )

    rows = (
        wc_df.mapInPandas(gen, "piece string, q decimal(38,0)")
        .groupBy("piece")
        .agg(F.sum("q").alias("q"))
        .collect()
    )
    return {r["piece"]: int(r["q"]) for r in rows}


def _m_step(
    q: dict[str, int], pieces: dict[str, float]
) -> dict[str, float]:
    """Piece log-probabilities from the exact quantized expected
    counts — one log per piece over integer ratios, identical on both
    paths by construction.  Single-character pieces are floored at one
    quantum (coverage guarantee: a char whose soft mass quantizes to
    zero must stay segmentable — SentencePiece's character-coverage
    analog; the floor is part of the model, applied identically on
    both paths).  Multi-character pieces with zero quantized mass drop
    — a tiny corpus legitimately supports fewer pieces than the
    budget."""
    eff = {
        p: max(q.get(p, 0), 1) if len(p) == 1 else q.get(p, 0)
        for p in pieces
    }
    tot = sum(eff.values())
    return {
        p: math.log(v) - math.log(tot) for p, v in eff.items() if v > 0
    }


def _prune(
    q: dict[str, int],
    logp: dict[str, float],
    keep_multi: int,
) -> dict[str, float]:
    """Keep every single-character piece (coverage guarantee) and the
    top ``keep_multi`` multi-character pieces by (expected count desc,
    piece asc)."""
    multi = sorted(
        ((p, q.get(p, 0)) for p in logp if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )
    kept = {p for p, _ in multi[:keep_multi]} | {
        p for p in logp if len(p) == 1
    }
    return {p: lp for p, lp in logp.items() if p in kept}


def train_unigram(
    docs: DataFrame,
    vocab_size: int = 80,
    text_col: str = "text",
    max_piece_len: int = 5,
    seed_size: int = 400,
    em_iters: int = 2,
    shrink: float = 0.75,
    max_words: int = 1_000_000,
    distributed: str = "auto",
) -> list[tuple[str, float]]:
    """Learn a unigram-LM piece vocabulary of ``vocab_size`` entries
    (single characters always included) → [(piece, logprob)] sorted by
    (logprob desc, piece asc).

    ``distributed``: ``"auto"`` runs the E-step distributed when the
    vocabulary exceeds ``max_words`` (the word table never collects);
    ``"never"`` / ``"always"`` force a path — outputs are identical
    whichever runs (tests pin bit-equality)."""
    if distributed not in ("auto", "never", "always"):
        raise ValueError(
            f"distributed must be auto|never|always, got {distributed!r}"
        )
    wc = word_counts(docs, text_col).localCheckpoint(eager=True)
    n_total = wc.count()
    use_dist = distributed == "always" or (
        distributed == "auto" and n_total > max_words
    )
    if use_dist:
        # seed candidates via the same integer counts, distributively:
        # every (start, length≥2) substring occurrence + single chars
        sub = wc.selectExpr(
            "c",
            "explode(flatten(transform(sequence(1, length(word)), "
            "j -> transform("
            f"sequence(2, least({int(max_piece_len)}, length(word) - j + 1)), "
            "l -> substring(word, j, l))))) AS piece",
        ).filter(F.length("piece") >= 2)
        multi = (
            sub.groupBy("piece").agg(F.sum("c").alias("n"))
            .orderBy(F.col("n").desc(), F.col("piece").asc())
            .limit(int(seed_size))
            .collect()
        )
        chars = (
            wc.selectExpr(
                "c", "explode(split(word, '')) AS piece"
            )
            .filter(F.length("piece") == 1)
            .groupBy("piece")
            .agg(F.sum("c").alias("n"))
            .collect()
        )
        seeds = sorted(
            ((r["piece"], int(r["n"])) for r in chars),
            key=lambda kv: (-kv[1], kv[0]),
        ) + [(r["piece"], int(r["n"])) for r in multi]
        words = None
    else:
        words = [
            (r["word"], int(r["c"]))
            for r in wc.orderBy("word").collect()
        ]
        seeds = _seed_candidates(words, seed_size, max_piece_len)

    tot = sum(c for _, c in seeds)
    logp = {p: math.log(c) - math.log(tot) for p, c in seeds if c > 0}
    n_chars = sum(1 for p in logp if len(p) == 1)
    if vocab_size < n_chars:
        raise ValueError(
            f"vocab_size={vocab_size} below the {n_chars} single "
            "characters required for coverage"
        )

    def e_step(lp):
        if use_dist:
            return _e_step_distributed(wc, lp, max_piece_len)
        return _e_step_quantized(words, lp, max_piece_len)

    q = e_step(logp)
    while True:
        for _ in range(em_iters):
            logp = _m_step(q, logp)
            q = e_step(logp)
        n_multi = sum(1 for p in logp if len(p) > 1)
        target_multi = vocab_size - n_chars
        if n_multi <= target_multi:
            break
        keep = max(target_multi, int(n_multi * shrink))
        logp = _prune(q, logp, keep)
        q = {p: v for p, v in q.items() if p in logp}
    logp = _m_step(q, logp)
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


def _viterbi(
    word: str, logp: dict[str, float], max_piece_len: int
) -> list[str]:
    """Best segmentation under the unigram model: max total logprob,
    ties broken toward FEWER pieces then lexicographically smaller
    piece sequence (scanning longer pieces first makes the first
    maximal path win) — deterministic."""
    n = len(word)
    NEG = float("-inf")
    best: list[tuple[float, int, int]] = [(NEG, 0, 0)] * (n + 1)
    back: list[int] = [0] * (n + 1)
    best[0] = (0.0, 0, 0)
    for i in range(1, n + 1):
        cand = None
        for ln in range(min(max_piece_len, i), 0, -1):
            j = i - ln
            lp = logp.get(word[j:i])
            if lp is None or best[j][0] == NEG:
                continue
            score = (best[j][0] + lp, -(best[j][1] + 1))
            if cand is None or score > cand[0]:
                cand = (score, j)
        if cand is not None:
            best[i] = (cand[0][0], -cand[0][1], 0)
            back[i] = cand[1]
    if best[n][0] == NEG:
        return [word]  # unsegmentable (char missing from vocab)
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def unigram_encode(
    docs: DataFrame,
    vocab: list[tuple[str, float]],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 5,
) -> DataFrame:
    """(id_col, pieces array<string>, n_pieces): Viterbi-encode every
    document — mapInPandas with a per-batch word memo, the
    ``bpe_encode`` shape."""
    logp = dict(vocab)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            memo: dict[str, list[str]] = {}

            def enc(text) -> list[str]:
                if not isinstance(text, str):
                    return []
                out: list[str] = []
                for w in text.split(" "):
                    if not w:
                        continue
                    got = memo.get(w)
                    if got is None:
                        got = _viterbi(w, logp, max_piece_len)
                        memo[w] = got
                    out.extend(got)
                return out

            toks = pdf[text_col].map(enc)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "pieces": toks,
                    "n_pieces": toks.map(len),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        gen, "id long, pieces array<string>, n_pieces long"
    ).withColumnRenamed("id", id_col)
