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
        merges = train_bpe(docs, n_merges=5, max_words=5, stats_out=stats)
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
