"""Count-min sketch (operators/cms.py) and Stupid-Backoff LM scoring
(operators/lm.py) — properties vs pure-Python references."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from org_revue_de_presse_trends_spark.operators.cms import (
    cms_bucket,
    cms_estimates,
    cms_table,
)
from org_revue_de_presse_trends_spark.operators.lm import (
    bigram_stream,
    stupid_backoff_doc_scores,
    trigram_stream,
)


def _py_bucket(value, row: int, width: int) -> int:
    h = int(hashlib.md5(f"{row}|{value}".encode()).hexdigest()[:12], 16)
    return h % width


def _py_cms(stream, depth: int, width: int):
    tab = {}
    for v, w in stream:
        for r in range(depth):
            k = (r, _py_bucket(v, r, width))
            tab[k] = tab.get(k, 0) + w
    return tab


def _py_estimate(tab, v, depth: int, width: int) -> int:
    return min(
        tab.get((r, _py_bucket(v, r, width)), 0) for r in range(depth)
    )


class TestCMS:
    def test_bucket_matches_python_md5(self, spark):
        df = spark.createDataFrame([(k,) for k in range(50)], "k long")
        got = {
            r["k"]: (r["b0"], r["b3"])
            for r in df.select(
                "k",
                cms_bucket(F.col("k"), 0, 64).alias("b0"),
                cms_bucket(F.col("k"), 3, 64).alias("b3"),
            ).collect()
        }
        for k in range(50):
            assert got[k] == (_py_bucket(k, 0, 64), _py_bucket(k, 3, 64))

    def test_estimates_match_reference_and_never_undercount(self, spark):
        # skewed stream: key i appears i+1 times
        rows = [(i,) for i in range(30) for _ in range(i + 1)]
        df = spark.createDataFrame(rows, "k long")
        depth, width = 3, 8  # narrow on purpose: collisions guaranteed
        tab = cms_table(df, "k", depth=depth, width=width)
        est = {
            r["k"]: r["est"]
            for r in cms_estimates(
                tab, df, "k", depth=depth, width=width
            ).collect()
        }
        ref_tab = _py_cms([(i, 1) for i, in rows], depth, width)
        over = 0
        for i in range(30):
            exact = i + 1
            assert est[i] == _py_estimate(ref_tab, i, depth, width)
            assert est[i] >= exact  # CMS never under-counts
            over += est[i] > exact
        assert over > 0  # width 8 for 30 keys must actually collide

    def test_table_bounded_and_mass_preserved(self, spark):
        rows = [(f"key{i % 100}",) for i in range(1000)]
        df = spark.createDataFrame(rows, "k string")
        depth, width = 4, 16
        tab = cms_table(df, "k", depth=depth, width=width).collect()
        assert len(tab) <= depth * width
        # every row of the sketch holds the full stream weight
        per_row = {}
        for r in tab:
            per_row[r["row"]] = per_row.get(r["row"], 0) + r["c"]
        assert per_row == {r: 1000 for r in range(depth)}

    def test_weighted(self, spark):
        df = spark.createDataFrame(
            [("a", 5), ("a", 7), ("b", 1)], "k string, w long"
        )
        tab = cms_table(df, "k", depth=2, width=32, weight_col="w")
        est = {
            r["k"]: r["est"]
            for r in cms_estimates(tab, df, "k", depth=2, width=32).collect()
        }
        assert est["a"] >= 12 and est["b"] >= 1


def _round_half_up(x: float, nd: int = 0):
    """Both engines round the SHORTEST DECIMAL repr of the double,
    half away from zero (Spark BigDecimal.valueOf + HALF_UP; DuckDB
    matches — probed).  Python's round() is half-even: wrong here."""
    import decimal

    q = decimal.Decimal(1).scaleb(-nd)
    d = decimal.Decimal(repr(x)).quantize(
        q, rounding=decimal.ROUND_HALF_UP
    )
    return int(d) if nd == 0 else float(d)


def _py_stupid_backoff(train_texts, score_docs, alpha=0.4, min_count=1):
    tri, bi, uni, n = {}, {}, {}, 0
    for t in train_texts:
        w = t.split(" ")
        n += len(w)
        for i in range(len(w)):
            uni[w[i]] = uni.get(w[i], 0) + 1
            if i + 1 < len(w):
                g = f"{w[i]} {w[i+1]}"
                bi[g] = bi.get(g, 0) + 1
            if i + 2 < len(w):
                g = f"{w[i]} {w[i+1]} {w[i+2]}"
                tri[g] = tri.get(g, 0) + 1
    tri = {g: c for g, c in tri.items() if c >= min_count}
    out = {}
    for doc_id, t in score_docs:
        w = t.split(" ")
        if len(w) < 3:
            continue
        total = 0
        m = len(w) - 2
        for i in range(m):
            t3 = f"{w[i]} {w[i+1]} {w[i+2]}"
            lead, trail = f"{w[i]} {w[i+1]}", f"{w[i+1]} {w[i+2]}"
            if t3 in tri:
                s = tri[t3] / bi[lead]
            elif trail in bi:
                s = alpha * bi[trail] / uni[w[i + 1]]
            else:
                s = alpha * alpha * max(uni.get(w[i + 2], 0), 1) / n
            total += _round_half_up(math.log10(s) * 1e6)
        out[doc_id] = (m, _round_half_up(total / m / 1e6, 6))
    return out


class TestStupidBackoffLM:
    TRAIN = [
        "the cat sat on the mat",
        "the cat ate the fish",
        "a dog sat on the rug",
    ]
    # exercises all three arms: seen trigram, trigram-miss/bigram-hit,
    # double-miss with seen unigram, and OOV (zebra) hitting the
    # max(c,1) floor
    SCORE = [
        (1, "the cat sat on the rug"),
        (2, "fish ate a dog"),
        (3, "zebra zebra the cat sat"),
        (4, "too short"),
    ]

    def _run(self, spark, **kw):
        train = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TRAIN)],
            "doc_id long, text string",
        )
        score = spark.createDataFrame(
            list(self.SCORE), "doc_id long, text string"
        )
        got = stupid_backoff_doc_scores(train, score, **kw).collect()
        return {
            r["doc_id"]: (r["n_trigrams"], r["mean_log10_score"])
            for r in got
        }

    def test_matches_python_reference(self, spark):
        got = self._run(spark)
        ref = _py_stupid_backoff(self.TRAIN, self.SCORE)
        assert got == ref
        assert 4 not in got  # <3 tokens: no trigrams, absent

    def test_min_count_prunes_to_bigram_arm(self, spark):
        got = self._run(spark, min_count=2)
        ref = _py_stupid_backoff(self.TRAIN, self.SCORE, min_count=2)
        assert got == ref
        # pruning must actually change scores (every train trigram is
        # a singleton here, so arm 1 dies entirely)
        assert got != _py_stupid_backoff(self.TRAIN, self.SCORE)

    def test_streams_count_multiplicity(self, spark):
        df = spark.createDataFrame(
            [(1, "a b a b a")], "doc_id long, text string"
        )
        tris = [r["tri"] for r in trigram_stream(df).collect()]
        assert sorted(tris) == ["a b a", "a b a", "b a b"]
        bis = [r["bg"] for r in bigram_stream(df).collect()]
        assert sorted(bis) == ["a b", "a b", "b a", "b a"]


class TestBloom:
    def _py_positions(self, v, k, n_words):
        import hashlib

        out = []
        for j in range(k):
            h = int(
                hashlib.md5(f"{j}|{v}".encode()).hexdigest()[:12], 16
            ) % (n_words * 62)
            out.append((h // 62, 1 << (h % 62)))
        return out

    def test_matches_python_reference_including_fps(self, spark):
        from org_revue_de_presse_trends_spark.operators.bloom import (
            bloom_build,
            bloom_probe,
        )

        members = [f"member-{i}" for i in range(40)]
        probes = members + [f"other-{i}" for i in range(400)]
        n_words, k = 4, 3  # tiny on purpose: false positives certain
        bf = bloom_build(
            spark.createDataFrame([(m,) for m in members], "g string"),
            "g",
            n_words=n_words,
            k=k,
        )
        got = {
            r["g"]: r["maybe_member"]
            for r in bloom_probe(
                spark.createDataFrame([(p,) for p in probes], "g string"),
                "g",
                bf,
                n_words=n_words,
                k=k,
            ).collect()
        }
        # python reference filter
        words = {}
        for m in members:
            for w, mask in self._py_positions(m, k, n_words):
                words[w] = words.get(w, 0) | mask
        fps = 0
        for p in probes:
            ref = all(
                words.get(w, 0) & mask == mask
                for w, mask in self._py_positions(p, k, n_words)
            )
            assert got[p] == ref, p
            if ref and p.startswith("other"):
                fps += 1
        assert all(got[m] for m in members)  # never a false negative
        assert fps > 0  # 248 bits for 40 keys must collide

    def test_filter_is_bounded_and_probe_preserves_rows(self, spark):
        from org_revue_de_presse_trends_spark.operators.bloom import (
            bloom_build,
            bloom_probe,
        )

        keys = spark.createDataFrame(
            [(f"k{i}",) for i in range(500)], "g string"
        )
        bf = bloom_build(keys, "g", n_words=8, k=3)
        assert bf.count() <= 8
        # duplicate probe rows must survive (no dedup inside probe)
        dup = spark.createDataFrame(
            [("k1", 1), ("k1", 2), ("zzz", 3)], "g string, tag long"
        )
        out = bloom_probe(dup, "g", bf, n_words=8, k=3).collect()
        assert len(out) == 3
        assert {r["tag"] for r in out} == {1, 2, 3}

    def test_probe_handles_non_identifier_columns(self, spark):
        # passthrough columns and out_col route through selectExpr —
        # hyphens, spaces and reserved words must survive (ADVICE r8)
        from org_revue_de_presse_trends_spark.operators.bloom import (
            bloom_build,
            bloom_probe,
        )

        keys = spark.createDataFrame([("k1",), ("k2",)], "g string")
        bf = bloom_build(keys, "g", n_words=8, k=3)
        probes = (
            spark.createDataFrame(
                [("k1", 1), ("zzz", 2)], "g string, tag long"
            )
            .withColumnRenamed("tag", "tag-with dash")
            .withColumnRenamed("g", "select")
        )
        out = bloom_probe(
            probes, "select", bf, n_words=8, k=3, out_col="is member?"
        ).collect()
        assert sorted(r["tag-with dash"] for r in out) == [1, 2]
        got = {r["select"]: r["is member?"] for r in out}
        assert got["k1"] is True


class TestKneserNey:
    @staticmethod
    def _py_kn(train_docs, score_docs):
        """Pure-Python mirror of kneser_ney_doc_scores' pinned
        conventions (scaled-long log rounding included)."""
        import math
        from collections import Counter
        from decimal import ROUND_HALF_UP, Decimal

        def rhu(x):
            return int(
                Decimal(repr(x)).quantize(Decimal("1"), ROUND_HALF_UP)
            )

        c12 = Counter()
        for d in train_docs:
            t = d.split(" ")
            for a, b in zip(t, t[1:]):
                c12[(a, b)] += 1
        cw1, n1p_w1, n1p_w2 = Counter(), Counter(), Counter()
        for (a, b), c in c12.items():
            cw1[a] += c
            n1p_w1[a] += 1
            n1p_w2[b] += 1
        n1p_all = len(c12)
        n_once = sum(1 for c in c12.values() if c == 1)
        n_twice = sum(1 for c in c12.values() if c == 2)
        D = float(n_once) / (float(n_once) + 2.0 * float(n_twice))
        out = {}
        for i, d in enumerate(score_docs):
            t = d.split(" ")
            ss = []
            for a, b in zip(t, t[1:]):
                pcont = float(max(n1p_w2.get(b, 0), 1)) / float(n1p_all)
                if a in cw1:
                    p = (
                        max(float(c12.get((a, b), 0)) - D, 0.0)
                        + D * float(n1p_w1[a]) * pcont
                    ) / float(cw1[a])
                else:
                    p = pcont
                ss.append(rhu(math.log10(p) * 1000000.0))
            if ss:
                out[i] = (
                    len(ss),
                    round(float(sum(ss)) / len(ss) / 1000000.0, 6),
                )
        return out

    def test_matches_python_reference(self, spark):
        from org_revue_de_presse_trends_spark.operators.lm import (
            kneser_ney_doc_scores,
        )

        train = [
            "the cat sat on the mat",
            "the dog sat on the rug",
            "a cat and a dog",
            "the cat ran",
        ]
        score = [
            "the cat sat",         # seen bigrams
            "the zebra ran",       # unseen bigram, seen head
            "zebra gnu the cat",   # unseen head -> continuation arm
            "one",                 # single token: no bigrams, absent
        ]
        tr = spark.createDataFrame(
            [(i, t) for i, t in enumerate(train)], "doc_id long, text string"
        )
        sc = spark.createDataFrame(
            [(i, t) for i, t in enumerate(score)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["n_bigrams"], r["mean_log10_kn"])
            for r in kneser_ney_doc_scores(tr, sc).collect()
        }
        assert got == self._py_kn(train, score)
        assert 3 not in got  # no-bigram doc absent

    def test_probabilities_normalize_over_seen_heads(self, spark):
        """For a head w1 seen in training, sum over the TRAIN bigram
        vocab of P_KN(w2|w1) stays <= 1 + tiny (the discount mass is
        redistributed through P_cont, floored continuation adds at
        most |V_floor|/N1+ beyond it)."""
        import math
        from collections import Counter

        train = [
            "b a b b a c a b a a c b",
            "c c a b a b c a",
        ]
        c12 = Counter()
        for d in train:
            t = d.split(" ")
            for x, y in zip(t, t[1:]):
                c12[(x, y)] += 1
        cw1, n1p_w1, n1p_w2 = Counter(), Counter(), Counter()
        for (x, y), c in c12.items():
            cw1[x] += c
            n1p_w1[x] += 1
            n1p_w2[y] += 1
        n1p_all = len(c12)
        n_once = sum(1 for c in c12.values() if c == 1)
        n_twice = sum(1 for c in c12.values() if c == 2)
        D = n_once / (n_once + 2.0 * n_twice)
        vocab = {y for _, y in c12}
        for w1 in cw1:
            s = 0.0
            for w2 in vocab:
                pcont = max(n1p_w2.get(w2, 0), 1) / n1p_all
                s += (
                    max(c12.get((w1, w2), 0) - D, 0.0)
                    + D * n1p_w1[w1] * pcont
                ) / cw1[w1]
            assert s <= 1.0 + 1e-9, (w1, s)
            assert s >= 0.5  # discounting never destroys most mass
        assert 0.0 < D < 1.0
        assert math.isfinite(D)
