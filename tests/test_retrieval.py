"""token_chunks (operators/packing.py) and BM25 scoring
(plans/retrieval_ext.py) — closed-form and pure-Python references."""

from __future__ import annotations

import math

from tests.conftest import SF_SMOKE


class TestTokenChunks:
    def test_closed_form(self, spark):
        from org_revue_de_presse_trends_spark.operators.packing import (
            token_chunks,
        )

        toks = [f"t{i}" for i in range(10)]
        df = spark.createDataFrame(
            [(1, " ".join(toks)), (2, "a b"), (3, "")],
            "doc_id long, text string",
        )
        out = sorted(
            (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_tokens"])
            for r in token_chunks(df, size=4, stride=3).collect()
        )
        assert out == [
            (1, 0, "t0 t1 t2 t3", 4),
            (1, 1, "t3 t4 t5 t6", 4),
            (1, 2, "t6 t7 t8 t9", 4),
            (1, 3, "t9", 1),
            (2, 0, "a b", 2),
            (3, 0, "", 1),  # split('') = [''] — one empty token
        ]

    def test_coverage_and_overlap(self, spark):
        from org_revue_de_presse_trends_spark.operators.packing import (
            token_chunks,
        )

        toks = [f"w{i}" for i in range(100)]
        df = spark.createDataFrame(
            [(7, " ".join(toks))], "doc_id long, text string"
        )
        rows = sorted(
            (r["chunk_idx"], r["chunk_text"].split(" "))
            for r in token_chunks(df, size=32, stride=24).collect()
        )
        seen = set()
        for idx, chunk in rows:
            assert chunk == toks[idx * 24 : idx * 24 + 32]
            seen.update(chunk)
        assert seen == set(toks)  # every token covered
        # consecutive chunks overlap by size - stride
        for (i1, c1), (i2, c2) in zip(rows, rows[1:]):
            if len(c2) >= 8:
                assert c1[-8:] == c2[:8]


class TestBM25:
    def test_matches_python_reference_on_fixture(self, spark, duck):
        """Recompute BM25 in pure Python from the parquet and compare
        to the registered query — engine-independent ground truth
        (the DuckDB oracle is separately checked by the contract
        gate)."""
        from org_revue_de_presse_trends_spark import plans
        from tests.test_cms_lm import _round_half_up

        docs = duck.execute(
            f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
        ).fetchall()
        tf_all, dfreq, counts, dls = {}, {}, {}, {}
        for doc_id, text in docs:
            toks = text.split(" ")
            dls[doc_id] = len(toks)
            seen = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
                seen[t] = seen.get(t, 0) + 1
            for t, c in seen.items():
                tf_all[(doc_id, t)] = c
                dfreq[t] = dfreq.get(t, 0) + 1
        qt = sorted(counts, key=lambda t: (counts[t], t))[:3]
        n = len(docs)
        avgdl = sum(dls.values()) / n
        k1, b = 1.2, 0.75
        ref = {}
        for doc_id, _ in docs:
            terms = [t for t in qt if (doc_id, t) in tf_all]
            if not terms:
                continue
            s = 0
            for t in terms:
                tf = tf_all[(doc_id, t)]
                idf = math.log(
                    1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
                )
                score = (
                    idf
                    * (tf * (k1 + 1.0))
                    / (tf + k1 * (1.0 - b + b * dls[doc_id] / avgdl))
                )
                s += _round_half_up(score * 1e6)
            ref[doc_id] = (len(terms), _round_half_up(s / 1e6, 6))
        got = {
            r["doc_id"]: (r["n_hit_terms"], r["bm25"])
            for r in plans.QUERIES["doc_bm25_rarest_terms"](
                spark, SF_SMOKE
            ).collect()
        }
        assert got == ref
        assert len(got) > 0


class TestNFC:
    def test_composes_and_idempotent(self, spark):
        from pyspark.sql import functions as F
        from org_revue_de_presse_trends_spark.functions.udf_escape import (
            nfc_normalize_pandas,
        )

        rows = [
            (1, "cafe\u0301"),  # decomposed: e + combining acute
            (2, "caf\u00e9"),  # precomposed e-acute
            (3, None),
            (4, "plain ascii"),
        ]
        df = spark.createDataFrame(rows, "i long, t string")
        nfc = nfc_normalize_pandas()
        out = {
            r["i"]: r["n"]
            for r in df.select("i", nfc(F.col("t")).alias("n")).collect()
        }
        assert out[1] == out[2] == "caf\u00e9"  # canonical equivalence
        assert out[3] is None and out[4] == "plain ascii"
        # idempotent: NFC(NFC(x)) == NFC(x)
        out2 = {
            r["i"]: r["n2"]
            for r in df.select(
                "i", nfc(nfc(F.col("t"))).alias("n2")
            ).collect()
        }
        assert out2 == out
