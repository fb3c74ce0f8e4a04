"""BPE training/encoding (operators/bpe.py) vs hand-computed merges
and a pure-Python reference encoder."""

from __future__ import annotations

from org_revue_de_presse_trends_spark.operators.bpe import (
    EOW,
    _encode_word,
    bpe_encode,
    train_bpe,
)


def test_train_learns_frequent_pairs_first(spark):
    """Classic toy corpus: 'low' ×5 and 'lower' ×2 share the 'lo'/'ow'
    structure — the first merges must capture the dominant pairs, and
    after enough merges the most frequent word becomes ONE token."""
    docs = spark.createDataFrame(
        [(0, " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6))],
        ["doc_id", "text"],
    )
    merges = train_bpe(docs, n_merges=30)
    # deterministic: training twice gives the identical merge list
    assert merges == train_bpe(docs, n_merges=30)
    enc = {
        r["doc_id"]: r
        for r in bpe_encode(
            spark.createDataFrame(
                [(1, "low"), (2, "newest"), (3, "unseen")],
                ["doc_id", "text"],
            ),
            merges,
        ).collect()
    }
    # frequent training words collapse to a single token
    assert enc[1]["bpe_tokens"] == ["low" + EOW]
    assert enc[2]["bpe_tokens"] == ["newest" + EOW]
    assert enc[1]["n_bpe_tokens"] == 1
    # an unseen word still round-trips: concatenation of its subword
    # tokens reconstructs the word + end marker
    assert "".join(enc[3]["bpe_tokens"]) == "unseen" + EOW
    assert enc[3]["n_bpe_tokens"] > 1


def test_encode_matches_pure_python_reference(spark):
    docs = spark.createDataFrame(
        [(0, "banana bandana ban"), (1, "banana banana")],
        ["doc_id", "text"],
    )
    merges = train_bpe(docs, n_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe_encode(docs, merges).collect()
    }
    for i, text in [(0, "banana bandana ban"), (1, "banana banana")]:
        want = []
        for w in text.split(" "):
            want.extend(_encode_word(w, ranks))
        assert got[i] == want, (i, got[i], want)


def test_encode_token_stream_reconstructs_text(spark):
    """Lossless: joining a doc's BPE tokens and splitting on the EOW
    marker reproduces the original words."""
    docs = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    merges = train_bpe(docs, n_merges=20)
    for r in bpe_encode(docs, merges).collect():
        words = "".join(r["bpe_tokens"]).split(EOW)
        assert words[-1] == ""
        original = {0: "the quick brown fox",
                    1: "jumps over the lazy dog"}[r["doc_id"]]
        assert words[:-1] == original.split(" ")


def test_train_bpe_truncation_is_signaled(spark):
    """A vocabulary larger than max_words must warn and report the
    dropped token-mass fraction instead of silently training on the
    biased head."""
    import warnings

    from org_revue_de_presse_trends_spark.operators.bpe import train_bpe

    rows = [(i, f"common common w{i:03d}") for i in range(20)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    stats: dict = {}
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        merges = train_bpe(
            docs, n_merges=5, max_words=5, stats_out=stats,
            distributed="never",
        )
    assert any("truncated" in str(w.message) for w in caught)
    assert merges, "merges must still train on the kept head"
    assert stats["n_words_total"] == 21  # 'common' + 20 unique words
    assert stats["n_words_kept"] == 5
    # kept mass: 'common' (40) + 4 words (1 each); total = 60
    assert stats["mass_total"] == 60
    assert stats["mass_kept"] == 44
    assert abs(stats["truncated_mass_fraction"] - 16 / 60) < 1e-12
    # no warning when the vocab fits
    with warnings.catch_warnings(record=True) as caught2:
        warnings.simplefilter("always")
        train_bpe(docs, n_merges=2, max_words=1000)
    assert not any("truncated" in str(w.message) for w in caught2)


# ---------------------------------------------------------------------------
# distributed full-vocabulary training (round 8)
# ---------------------------------------------------------------------------

def test_distributed_equals_driver_loop_on_fixture(spark):
    """Forced distributed training must reproduce the driver loop's
    merge list exactly on the real corpus — same argmax tiebreak, same
    greedy merge scan, only the loop state's location differs."""
    from org_revue_de_presse_trends_spark.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    driver = train_bpe(docs, n_merges=30)
    dist = train_bpe(docs, n_merges=30, distributed="always")
    assert dist == driver
    assert len(driver) == 30


def test_auto_goes_distributed_past_max_words_without_truncation(spark):
    """distributed='auto' + a vocab over max_words must produce the
    UNtruncated result (= driver loop with a big budget), not the
    biased head — and must say so in stats_out."""
    rows = [(i, f"common common w{i:03d}") for i in range(20)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    untruncated = train_bpe(docs, n_merges=6, max_words=1000)
    stats: dict = {}
    got = train_bpe(docs, n_merges=6, max_words=5, stats_out=stats)
    assert got == untruncated
    assert stats["mode"] == "distributed"
    assert stats["truncated_mass_fraction"] == 0.0
    # the legacy mode differs once merges reach the truncated tail
    # ('common' fully merges in 6 rounds; round 7+ trains on 4 kept
    # rare words vs all 20)
    legacy = train_bpe(
        docs, n_merges=12, max_words=5, distributed="never"
    )
    full = train_bpe(docs, n_merges=12, max_words=1000)
    assert legacy != full


def test_distributed_handles_bmp_unicode_and_tie_order(spark):
    docs = spark.createDataFrame(
        [(0, "café café crème zz zz zz")], ["doc_id", "text"]
    )
    driver = train_bpe(docs, n_merges=5)
    dist = train_bpe(docs, n_merges=5, distributed="always")
    assert dist == driver and len(dist) == 5


def test_train_bpe_rejects_unknown_mode(spark):
    import pytest as _pytest

    docs = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="auto|never|always"):
        train_bpe(docs, n_merges=1, distributed="sometimes")
