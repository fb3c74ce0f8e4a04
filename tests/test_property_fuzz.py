"""Hypothesis fuzz: engine text expressions vs pure-Python references
on adversarial inputs (unicode, repeated tokens, single-token docs).
Batched: each example set becomes ONE DataFrame so Spark round-trips
stay cheap.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from org_revue_de_presse_trends_spark.functions import text as T

# tokens: non-space printable unicode runs, joined by single spaces
token_st = st.text(
    alphabet=st.characters(blacklist_categories=("Zs", "Zl", "Zp", "Cc", "Cs")),
    min_size=1,
    max_size=8,
)
doc_st = st.lists(token_st, min_size=1, max_size=30).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(st.lists(doc_st, min_size=1, max_size=20))
def test_token_count_and_fingerprint_match_python(spark, docs):
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)],
                               ["id", "text"])
    rows = df.select(
        "id",
        F.size(T.tokens(F.col("text"))).alias("n"),
        T.fingerprint(F.col("text")).alias("fp"),
    ).collect()
    got = {r["id"]: (r["n"], r["fp"]) for r in rows}
    for i, d in enumerate(docs):
        expect_n = len(d.split(" "))
        expect_fp = hashlib.md5(d.lower().strip().encode()).hexdigest()
        assert got[i] == (expect_n, expect_fp), (d, got[i])


@settings(max_examples=5, deadline=None)
@given(st.lists(doc_st, min_size=1, max_size=10))
def test_shingle_hash_count_invariant(spark, docs):
    """|shingle_hashes(text,k)| == |distinct k-windows| (collisions in a
    64-bit space are effectively impossible at this size) and >= 1."""
    k = 3
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)],
                               ["id", "text"])
    rows = df.select(
        "id", F.size(T.shingle_hashes(F.col("text"), k)).alias("n")
    ).collect()
    got = {r["id"]: r["n"] for r in rows}
    for i, d in enumerate(docs):
        toks = d.split(" ")
        if len(toks) < k:
            expect = 1
        else:
            expect = len(
                {tuple(toks[j : j + k]) for j in range(len(toks) - k + 1)}
            )
        assert got[i] == expect, (d, got[i], expect)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(doc_st, min_size=1, max_size=8),
    st.integers(min_value=2, max_value=12),
    st.integers(min_value=0, max_value=6),
)
def test_chunk_coverage_invariants(spark, docs, size, overlap):
    """Every chunk has 1..size tokens; reassembling chunks with the
    overlap removed reproduces the original token stream."""
    if overlap >= size:
        overlap = size - 1
    step = size - overlap
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], ["id", "text"]
    ).withColumn("__toks", T.tokens(F.col("text")))
    rows = (
        df.select(
            "id",
            F.explode(
                T.chunks_from_tokens(F.col("__toks"), size, overlap)
            ).alias("c"),
        )
        .select("id", "c.chunk_id", "c.chunk", "c.n_tokens")
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in rows:
        assert 1 <= r["n_tokens"] <= size
        by_doc.setdefault(r["id"], []).append((r["chunk_id"], r["chunk"]))
    for i, d in enumerate(docs):
        chunks = [c for _, c in sorted(by_doc[i])]
        rebuilt = chunks[0].split(" ")
        for c in chunks[1:]:
            rebuilt.extend(c.split(" ")[overlap:])
        assert rebuilt == d.split(" "), (d, chunks)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.lists(token_st, min_size=1, max_size=40), min_size=2,
             max_size=8),
    st.integers(min_value=0, max_value=10**6),
)
def test_winnow_guarantee_fuzz(spark, token_lists, salt):
    """Winnowing guarantee on arbitrary docs: plant one shared
    (w + k - 1)-token run into every doc — all pairs must share a
    fingerprint.  Tokens are salted so runs don't collide with the
    random content by construction."""
    k, w = 5, 4
    shared = [f"__run{salt}_{j}" for j in range(w + k - 1)]
    docs = [
        " ".join(toks[: len(toks) // 2] + shared + toks[len(toks) // 2 :])
        for toks in token_lists
    ]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], ["id", "text"]
    )
    rows = df.select(
        "id", T.winnow_fingerprints(F.col("text"), k=k, w=w).alias("fps")
    ).collect()
    fps = {r["id"]: set(r["fps"]) for r in rows}
    base = fps[0]
    for i in range(1, len(docs)):
        assert fps[i] & base, (docs[0], docs[i])


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=1, max_value=200),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: (t[0], t[1]),
    ),
    st.integers(min_value=16, max_value=128),
)
def test_pack_sequences_fuzz(spark, chunks, budget):
    """Packing invariants under arbitrary chunk sets: exactly-once
    assignment; any sequence over budget is a singleton oversize chunk."""
    from org_revue_de_presse_trends_spark.operators.packing import (
        pack_sequences,
    )

    df = spark.createDataFrame(chunks, ["doc_id", "chunk_id", "n_tokens"])
    out = pack_sequences(df, budget=budget, num_bins=4).collect()
    assert {(r["doc_id"], r["chunk_id"]) for r in out} == {
        (d, c) for d, c, _ in chunks
    }
    assert len(out) == len(chunks)
    seqs: dict[int, list] = {}
    for r in out:
        seqs.setdefault(r["seq_id"], []).append(r["n_tokens"])
    for members in seqs.values():
        if sum(members) > budget:
            assert len(members) == 1 and members[0] > budget
