"""Edit-distance near-dup pairs (operators/dedup.edit_distance_pairs)."""

from __future__ import annotations

from org_revue_de_presse_trends_spark.operators.dedup import (
    edit_distance_pairs,
)


def test_planted_pairs_and_bucket_boundaries(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5  # 220 chars
    rows = [
        (1, "s", base),
        (2, "s", base[:-3] + "cat"),          # tiny edit -> close pair
        (3, "s", base + "x" * 9),             # +9 chars, dist <= 10
        (4, "s", base + "y" * 50),            # beyond max_dist=10
        (5, "other", base),                   # different block: excluded
        (6, "s", "z" * len(base)),            # same length, far away
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = edit_distance_pairs(df, block_cols=["source"], max_dist=10)
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in out.collect()}
    # (2,3) is dist 12 (cat->dog plus 9 appended chars): excluded
    assert set(got) == {(1, 2), (1, 3)}
    assert got[(1, 2)] == 3  # dog -> cat
    assert got[(1, 3)] == 9
    # each pair appears exactly once despite the 3-bucket explode
    assert out.count() == len(got)


def test_cross_bucket_pair_found(spark):
    # lengths straddle a bucket edge (width max_dist+1 = 11): 10 vs 15
    rows = [(1, "s", "a" * 10), (2, "s", "a" * 15)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = edit_distance_pairs(df, block_cols=["source"], max_dist=10)
    assert [(r["id_a"], r["id_b"], r["dist"]) for r in out.collect()] == [
        (1, 2, 5)
    ]


def test_qchunk_matches_bucket_path(spark):
    """edit_distance_pairs_qchunk must agree exactly with the
    length-bucket path on a corpus mixing planted near-dups, far
    strings, cross-block twins, and short-short pairs (the pigeonhole
    fallback corner: both sides shorter than max_dist+1)."""
    from org_revue_de_presse_trends_spark.operators.dedup import (
        edit_distance_pairs_qchunk,
    )

    base = "the quick brown fox jumps over the lazy dog " * 7  # 308
    rows = [
        (1, "s", base),
        (2, "s", base[:100] + "XYZ" + base[103:]),   # dist 3
        (3, "s", base + "x" * 15),                   # dist 15
        (4, "s", base + "y" * 50),                   # beyond 20
        (5, "other", base),                          # other block
        (6, "s", "z" * len(base)),                   # far
        (7, "s", "tiny doc"),                        # short (8 chars)
        (8, "s", "tiny dog"),                        # short, dist 1
        (9, "s", "tiny doc" + "q" * 280),            # long vs short: far
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    out = edit_distance_pairs_qchunk(
        df, block_cols=["source"], max_dist=20
    )
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in out.collect()}
    assert got == {(1, 2): 3, (1, 3): 15, (2, 3): 18, (7, 8): 1}
    # no duplicate emissions across the index/probe directions or the
    # short-short fallback union
    assert out.count() == len(got)


def test_qchunk_no_blocking(spark):
    """block_cols=None: candidates cross sources."""
    from org_revue_de_presse_trends_spark.operators.dedup import (
        edit_distance_pairs_qchunk,
    )

    base = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 5
    rows = [(1, "a", base), (2, "b", base + "zz")]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    out = edit_distance_pairs_qchunk(df, max_dist=20)
    assert [(r["id_a"], r["id_b"], r["dist"]) for r in out.collect()] == [
        (1, 2, 2)
    ]


def test_qchunk_long_doc_cap_regimes(spark):
    """max_doc_len routes over-long docs through the bucket path with
    no duplicates and no gaps across the boundary: long-long pairs,
    boundary-straddling pairs (one side just under the cap), and
    mid-mid pairs must each be found exactly once."""
    from org_revue_de_presse_trends_spark.operators.dedup import (
        edit_distance_pairs_qchunk,
    )

    base = "abcdefghij" * 12  # 120 chars
    long_a = base + "x" * 20          # 140 >= cap
    rows = [
        (1, long_a),                  # 140: long
        (2, long_a[:-2] + "QQ"),      # 140: long, dist 2 to doc 1
        (3, base + "x" * 11),         # 131: straddles (>= cap - tau)
        (4, base),                    # 120: mid (q-chunk)
        (5, base[:60] + "Z" + base[61:]),  # 120: mid, dist 1 to doc 4
        (6, "completely different text made of other words entirely!!"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = edit_distance_pairs_qchunk(df, max_dist=20, max_doc_len=140)
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in out.collect()}
    # (1,2) long-long dist 2; (1,3)/(2,3) long-straddle dist 9/11;
    # (4,5) mid-mid dist 1; (3,4) has len diff 11 <= 20 and dist 11
    # found via the q-chunk band (both < 140)
    assert got[(1, 2)] == 2
    assert got[(1, 3)] == 9
    assert got[(4, 5)] == 1
    assert got[(3, 4)] == 11
    assert out.count() == len(got)  # each pair exactly once
