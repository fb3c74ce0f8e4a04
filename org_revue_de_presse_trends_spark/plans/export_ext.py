"""Late-registering export-integrity queries (past the driver window;
contract-gated): the deterministic shard manifest of the documents
table — operators/export.py's order-independent checksum sidecar —
and the corpus content diff between two export versions, both
value-exact in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.export import (
    corpus_diff,
    manifest_oracle_sql,
    shard_manifest,
)
from .registry import query

#: shard count for the driver query — small enough that every shard
#: is non-empty at the 500-doc fixtures, large enough to exercise the
#: md5 assignment
_N_SHARDS = 8


@query(
    "doc_shard_manifest",
    manifest_oracle_sql(
        "duckdb", _N_SHARDS, "doc_id", ["text"],
        "SELECT doc_id, text FROM documents",
    ),
)
def doc_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard manifest of the documents corpus: layout-independent
    md5 shard assignment + per-shard order-independent content
    checksums (exact decimal sums of 60-bit row digests, reduced mod
    2^61-1) — the sidecar that lets a reader verify a training-data
    export shard-by-shard without sorting either side.  The DuckDB
    oracle recomputes every digest from scratch, so a hash-match here
    pins the whole canonicalization + checksum arithmetic cross-engine
    (operators/export.py; write_shards' round-trip integrity is pinned
    in tests/test_export.py)."""
    # Dead end (r11 optimization): spread_for_cpu on this scan LOSES
    # (med 0.276 -> 0.351 s best-of-6 interleaved at sf0.1) — one md5
    # per row over 5k docs is too little CPU to buy the extra
    # exchange, unlike winnow_md5's 64-hash fan (r10b sweep).  Same
    # result, worse, on doc_corpus_diff below (0.47 -> 0.94: the
    # spread exchange feeds BOTH diff sides).  Don't retry on
    # one-hash-per-row digest chains.
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return shard_manifest(docs, _N_SHARDS, "doc_id", ["text"])


#: the deterministic "re-crawl" of the documents table the diff query
#: compares against: every 17th doc removed, every (remaining) 11th
#: doc's text changed, one synthetic doc added per 23rd id — pure
#: SQL-expressible functions of doc_id (the image_near_dup_from_docs
#: synthesis precedent), so both engines rebuild the identical v2
#: corpus independently
_V2_ADDED_OFFSET = 1_000_000_000


def _recrawl(docs: DataFrame) -> DataFrame:
    kept = docs.filter(F.expr("doc_id % 17 <> 0"))
    changed = kept.selectExpr(
        "doc_id",
        "CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END"
        " AS text",
    )
    added = docs.filter(F.expr("doc_id % 23 = 0")).selectExpr(
        f"doc_id + {_V2_ADDED_OFFSET} AS doc_id",
        "'added ' || CAST(doc_id AS STRING) AS text",
    )
    return changed.unionByName(added)


_DIFF_ORACLE = f"""
WITH v1 AS (SELECT doc_id, text FROM documents),
v2 AS (
    SELECT doc_id,
           CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END
             AS text
    FROM documents WHERE doc_id % 17 <> 0
    UNION ALL
    SELECT doc_id + {_V2_ADDED_OFFSET} AS doc_id,
           'added ' || CAST(doc_id AS VARCHAR) AS text
    FROM documents WHERE doc_id % 23 = 0
)
SELECT coalesce(n.doc_id, o.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM v1 o FULL OUTER JOIN v2 n ON o.doc_id = n.doc_id
WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.text <> n.text
"""


@query("doc_corpus_diff", _DIFF_ORACLE)
def doc_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content diff between two corpus versions (operators/export.
    corpus_diff): (doc_id, status ∈ added/removed/changed) for rows
    whose content moved between the documents table and its
    deterministic re-crawl — |delta|-sized output, digest-compared in
    Spark.  The DuckDB oracle compares the raw TEXT instead, so a
    hash-match additionally proves the 60-bit digests collision-free
    on the fixture (the literal-vs-rolled-hash mirror, CLAUDE.md r8).
    The manifest-pruned variant (corpus_diff_pruned: skip shards whose
    checksum didn't move via partition pruning) is pinned equal to
    this full diff in tests/test_export.py."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return corpus_diff(docs, _recrawl(docs), "doc_id", ["text"])
