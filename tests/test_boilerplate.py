"""Corpus-level boilerplate removal (operators/boilerplate.py)."""

from __future__ import annotations

from org_revue_de_presse_trends_spark.operators.boilerplate import (
    remove_common_segments,
)

HEADER = "SITE NAV | home | products | contact"
FOOTER = "(c) example corp - all rights reserved"


def _docs(spark):
    rows = [
        # five docs on src-a share header+footer around unique bodies
        *[
            (i, "src-a", f"{HEADER}\nunique body {i} text\n{FOOTER}")
            for i in range(5)
        ],
        # src-b shares the SAME header text but only twice — per-source
        # df must not cross-count it into boilerplate
        (10, "src-b", f"{HEADER}\nother body ten"),
        (11, "src-b", f"{HEADER}\nother body eleven"),
        # a doc whose every segment is boilerplate
        (12, "src-a", f"{HEADER}\n{FOOTER}"),
        # an empty doc
        (13, "src-a", ""),
        # repetition INSIDE one doc is not boilerplate (df is distinct)
        (14, "src-b", "solo line\nsolo line\nsolo line"),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_per_source_line_boilerplate(spark):
    out = remove_common_segments(
        _docs(spark), delimiter="\n", min_df=3, per="source"
    )
    got = {r["doc_id"]: r for r in out.collect()}
    # src-a: header+footer appear in 6 and 5 distinct docs -> removed
    for i in range(5):
        assert got[i]["clean_text"] == f"unique body {i} text"
        assert got[i]["n_segments"] == 3
        assert got[i]["n_removed"] == 2
    # src-b's copies of the same header: df=2 < 3 -> kept
    assert got[10]["clean_text"] == f"{HEADER}\nother body ten"
    assert got[10]["n_removed"] == 0
    # all-boilerplate doc collapses to empty
    assert got[12]["clean_text"] == ""
    assert (got[12]["n_segments"], got[12]["n_removed"]) == (2, 2)
    # empty doc: zero segments, unchanged
    assert got[13]["clean_text"] == ""
    assert (got[13]["n_segments"], got[13]["n_removed"]) == (0, 0)
    # in-doc repetition: one distinct doc -> df=1 -> kept intact
    assert got[14]["clean_text"] == "solo line\nsolo line\nsolo line"
    assert got[14]["n_removed"] == 0


def test_global_df_crosses_sources(spark):
    out = remove_common_segments(
        _docs(spark), delimiter="\n", min_df=7, per=None
    )
    got = {r["doc_id"]: r for r in out.collect()}
    # header df across ALL sources = 8 distinct docs >= 7 -> removed
    # everywhere; footer df = 6 < 7 -> kept
    assert got[10]["clean_text"] == "other body ten"
    assert got[0]["clean_text"] == f"unique body 0 text\n{FOOTER}"


def test_token_window_mode(spark):
    rows = [
        (i, "s", f"cookie banner accept terms now doc{i} tail{i} end{i}")
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = remove_common_segments(
        df, delimiter=None, window_tokens=3, min_df=4, per="source"
    )
    got = {r["doc_id"]: r for r in out.collect()}
    # windows: [cookie banner accept][terms now docN][tailN endN]
    # only the first window is identical across all 4 docs (the last
    # one is a short 2-token remainder, kept)
    for i in range(4):
        assert got[i]["clean_text"] == f"terms now doc{i} tail{i} end{i}"
        assert (got[i]["n_segments"], got[i]["n_removed"]) == (3, 1)


def test_layout_independence(spark):
    df = _docs(spark)
    a = remove_common_segments(df, min_df=3, per="source")
    b = remove_common_segments(df.repartition(7), min_df=3, per="source")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_regex_special_delimiter(spark):
    """split() takes a Java regex: a '|' delimiter must segment on the
    literal pipe, not on every character (r6 ADVICE — the delimiter is
    now Pattern.quote'd)."""
    rows = [
        (1, "s", "common part|body one|tail"),
        (2, "s", "common part|body two|tail"),
        (3, "s", "common part|body three|tail"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_segments"], r["n_removed"])
        for r in remove_common_segments(
            df, delimiter="|", min_df=3, per="source"
        ).collect()
    }
    # 'common part' and 'tail' hit df=3 and drop; the bodies survive
    assert out[1] == ("body one", 3, 2)
    assert out[2] == ("body two", 3, 2)
    assert out[3] == ("body three", 3, 2)


def test_reassembly_plan_is_skinny_and_broadcast(spark):
    """The r6 plan audit found the reassembly groupBy carrying full
    segment text through a wide shuffle.  Pin the r7 shape: (a) the
    common-set join and the flag-side rejoin both broadcast, (b) the
    per-doc aggregate collects segment POSITIONS, never segment
    text."""
    df = _docs(spark)
    out = remove_common_segments(df, min_df=4, per="source")
    out.collect()  # force AQE final plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    # the only collect_list in the plan aggregates the pos attribute
    # behind the rm flag — segment strings never enter an aggregate
    assert "collect_list(CASE WHEN NOT rm" in plan
    assert "collect_list(seg" not in plan
