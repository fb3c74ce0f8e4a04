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
