"""Gopher §A1.1 rule-set filter (plans/analytics_ext.gopher_rule_flags):
planted docs that flip exactly one rule each.  The sf0.01 driver query
is additionally oracled (doc_gopher_rules hash-matches DuckDB)."""

from __future__ import annotations

import pytest

from org_revue_de_presse_trends_spark.plans.analytics_ext import (
    gopher_rule_flags,
)

GOOD = "the quick brown fox and the lazy dog ran over a hill to chase " \
    "a ball of red yarn near the old barn while birds sang softly"


@pytest.fixture(scope="module")
def flags(spark):
    rows = [
        (1, GOOD),                                  # passes everything
        (2, "too short a doc"),                     # word count < 20
        (3, " ".join(["a"] * 30)),                  # mean word len < 3 (+ stop frac)
        (4, " ".join(["extraordinarily"] * 30)),    # mean word len > 10, no stops
        (5, GOOD.replace("the", "xx1").replace("and", "9z")
             .replace(" a ", " 7 ").replace("of", "by")
             .replace("to", "at")),                 # < 2 stop words
        (6, " ".join(["12345"] * 25) + " the a"),   # alpha fraction < 0.8
        (7, " ".join(["the", "a", "of"] * 10)),     # stop fraction > 0.3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in gopher_rule_flags(df).collect()}


def test_clean_doc_passes_all(flags):
    r = flags[1]
    assert all(
        r[k]
        for k in ("r_word_count", "r_word_len", "r_stopwords",
                  "r_alpha_words", "r_stop_frac", "pass_gopher")
    )


@pytest.mark.parametrize(
    "doc_id,rule",
    [
        (2, "r_word_count"),
        (3, "r_word_len"),
        (4, "r_word_len"),
        (5, "r_stopwords"),
        (6, "r_alpha_words"),
        (7, "r_stop_frac"),
    ],
)
def test_planted_violation_fails_named_rule(flags, doc_id, rule):
    r = flags[doc_id]
    assert not r[rule], (doc_id, rule, r)
    assert not r["pass_gopher"]


def test_mean_word_len_identity(flags):
    # single-space identity: chars_in_words = length(text) - (n-1)
    r = flags[3]
    assert r["n_words"] == 30 and r["mean_word_len"] == 1.0
