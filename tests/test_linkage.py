"""Cross-table fuzzy join (operators/linkage.py) — exactness vs a
brute-force Levenshtein cross join, corner ownership (short strings,
the max_len cap), blocks, and planted-typo recovery."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from org_revue_de_presse_trends_spark.operators.linkage import fuzzy_join


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(left, right, tau, blocks=False):
    out = set()
    for li, lb, lt_ in left:
        for ri, rb, rt_ in right:
            if blocks and lb != rb:
                continue
            d = _lev(lt_, rt_)
            if d <= tau:
                out.add((li, ri, d))
    return out


def _dfs(spark, left, right):
    l = spark.createDataFrame(left, "lid long, blk string, txt string")
    r = spark.createDataFrame(right, "rid long, blk string, txt string")
    return l, r


def _run(spark, left, right, tau, blocks=None, max_len=8192):
    l, r = _dfs(spark, left, right)
    rows = fuzzy_join(
        l,
        r,
        left_text="txt",
        right_text="txt",
        left_id="lid",
        right_id="rid",
        max_dist=tau,
        block_cols=blocks,
        max_len=max_len,
    ).collect()
    return {(x["lid"], x["rid"], x["dist"]) for x in rows}


WORDS = [
    "alpha", "alpah", "alphabet", "beta", "betta", "gamma", "gamm",
    "delta", "dleta", "x", "xy", "", "epsilon", "epsilon9",
    "a-very-much-longer-string-here", "a-very-much-longer-string-herX",
]


class TestExactness:
    def test_matches_brute_force(self, spark):
        left = [(i, "b", w) for i, w in enumerate(WORDS)]
        right = [
            (100 + i, "b", w + s)
            for i, (w, s) in enumerate(
                (w, s) for w in WORDS for s in ("", "z")
            )
        ]
        for tau in (1, 2, 3):
            got = _run(spark, left, right, tau)
            assert got == _brute(left, right, tau), f"tau={tau}"

    def test_short_and_empty_strings(self, spark):
        # everything at or below the pigeonhole limit
        left = [(i, "b", w) for i, w in enumerate(["", "a", "ab", "abc"])]
        right = [
            (100 + i, "b", w)
            for i, w in enumerate(["", "b", "ba", "abcd", "zzzz"])
        ]
        for tau in (1, 2):
            got = _run(spark, left, right, tau)
            assert got == _brute(left, right, tau), f"tau={tau}"

    def test_max_len_cap_ownership(self, spark):
        # strings straddling a tiny cap: corner ownership must neither
        # drop nor duplicate pairs
        base = "abcdefghijklmnop"  # 16 chars; cap at 12
        left = [
            (1, "b", base),
            (2, "b", base[:11]),
            (3, "b", base[:12]),
            (4, "b", base[:13] + "z"),
        ]
        right = [
            (101, "b", base),
            (102, "b", base[:11] + "q"),
            (103, "b", base[:12] + "x"),
        ]
        for tau in (1, 2):
            got = _run(spark, left, right, tau, max_len=12)
            assert got == _brute(left, right, tau), f"tau={tau}"

    def test_blocks_partition_the_join(self, spark):
        left = [(1, "x", "hello"), (2, "y", "hello")]
        right = [(101, "x", "hella"), (102, "y", "hellz")]
        got = _run(spark, left, right, 1, blocks=["blk"])
        assert got == {(1, 101, 1), (2, 102, 1)}

    def test_validation(self, spark):
        l, r = _dfs(spark, [(1, "b", "aa")], [(2, "b", "aa")])
        with pytest.raises(ValueError, match="max_len"):
            fuzzy_join(
                l, r, "txt", "txt", "lid", "rid", max_dist=3, max_len=6
            )


class TestPlanted:
    def test_recovers_planted_typos_only(self, spark):
        import hashlib

        keys = [hashlib.md5(str(i).encode()).hexdigest() for i in range(60)]
        right = [(i, "b", k) for i, k in enumerate(keys)]
        left = []
        for i, k in enumerate(keys):
            if i % 3 == 0:
                left.append((1000 + i, "b", k[:7] + k[8:]))  # deletion
            elif i % 3 == 1:
                left.append((1000 + i, "b", k[:9] + "z" + k[10:]))  # sub
            else:
                left.append((1000 + i, "b", k))  # exact
        got = _run(spark, left, right, 2)
        want = {
            (1000 + i, i, 0 if i % 3 == 2 else 1) for i in range(60)
        }
        assert got == want  # md5 keys: no accidental cross links
