"""Late-registering export-integrity query (past the driver window;
contract-gated): the deterministic shard manifest of the documents
table — operators/export.py's order-independent checksum sidecar,
value-exact in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.export import manifest_oracle_sql, shard_manifest
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
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return shard_manifest(docs, _N_SHARDS, "doc_id", ["text"])
