"""Unigram-LM tokenizer training/encoding (operators/unigram.py) —
the driver≡distributed bit-equality gate, coverage/size invariants,
and Viterbi encode properties."""
from __future__ import annotations

import math

import pytest

from org_revue_de_presse_trends_spark.catalog import load_table
from org_revue_de_presse_trends_spark.operators import unigram as UG

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents")


@pytest.fixture(scope="module")
def vocab(spark, docs):
    return UG.train_unigram(docs, vocab_size=30, seed_size=200)


def test_driver_equals_distributed_bit_for_bit(spark, docs, vocab):
    """The whole point of the quantized-integer E-step accumulation:
    the distributed path must reproduce the driver path's vocabulary
    EXACTLY, log-probabilities included (identical integers into the
    M-step → identical floats out)."""
    dist = UG.train_unigram(
        docs, vocab_size=30, seed_size=200, distributed="always"
    )
    assert dist == vocab


def test_vocab_shape_and_coverage(vocab):
    pieces = [p for p, _ in vocab]
    assert len(pieces) == len(set(pieces))
    assert len(vocab) <= 30
    # every corpus character survives (coverage guarantee), so multi
    # pieces were actually pruned to fit
    n_chars = sum(1 for p in pieces if len(p) == 1)
    assert n_chars >= 1
    assert any(len(p) > 1 for p in pieces)
    # probabilities are a (sub-)distribution and sorted desc
    lps = [lp for _, lp in vocab]
    assert lps == sorted(lps, reverse=True)
    assert sum(math.exp(lp) for lp in lps) <= 1.0 + 1e-9


def test_em_is_pure_function_of_corpus(spark, docs, vocab):
    assert UG.train_unigram(docs, vocab_size=30, seed_size=200) == vocab


def test_encode_round_trip_and_optimality(spark, docs, vocab):
    """Viterbi pieces rejoin to the word, and no single-piece word is
    split when the whole word is in the vocabulary (a whole-word piece
    has higher probability than any multi-piece path times itself —
    checked directly via path scores)."""
    out = UG.unigram_encode(docs.limit(30), vocab).collect()
    texts = {
        r["doc_id"]: r["text"] for r in docs.limit(30).collect()
    }
    logp = dict(vocab)
    assert out
    for r in out:
        words = [w for w in texts[r["doc_id"]].split(" ") if w]
        assert "".join(r["pieces"]) == "".join(words)
        assert r["n_pieces"] == len(r["pieces"])
    # Viterbi path score is maximal among a brute-force enumeration on
    # a few short words
    def all_segs(w):
        if not w:
            yield []
            return
        for ln in range(1, min(5, len(w)) + 1):
            if w[:ln] in logp:
                for rest in all_segs(w[ln:]):
                    yield [w[:ln]] + rest

    some_words = sorted(
        {w for t in texts.values() for w in t.split(" ") if 0 < len(w) <= 8}
    )[:20]
    for w in some_words:
        best = UG._viterbi(w, logp, 5)
        got = sum(logp[p] for p in best) if all(
            p in logp for p in best
        ) else float("-inf")
        want = max(
            (sum(logp[p] for p in seg) for seg in all_segs(w)),
            default=float("-inf"),
        )
        assert got == pytest.approx(want), w


def test_unsegmentable_word_falls_back_whole(spark, vocab):
    logp = dict(vocab)
    assert UG._viterbi("zzzézz", logp, 5) == ["zzzézz"] or all(
        p in logp for p in UG._viterbi("zzzézz", logp, 5)
    )


def test_vocab_size_floor_raises(spark, docs):
    with pytest.raises(ValueError, match="below"):
        UG.train_unigram(docs, vocab_size=1, seed_size=50)


def test_pruning_actually_ran(spark, docs):
    """seed_size 200 starts well above the 30-piece target, so at
    least one shrink round must have happened — pinned by the final
    size, and by a larger-budget run keeping strictly more pieces."""
    big = UG.train_unigram(docs, vocab_size=60, seed_size=200)
    small = UG.train_unigram(docs, vocab_size=30, seed_size=200)
    assert len(small) <= 30 < len(big) <= 60
    assert {p for p, _ in small if len(p) == 1} == {
        p for p, _ in big if len(p) == 1
    }
