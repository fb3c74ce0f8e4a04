"""Late-registering stratified-sampling queries (past the driver
window; contract-gated): the deterministic eval-set carve —
largest-remainder apportionment across sources + md5-ordered
per-stratum selection (operators/sampling.py), value-exact in both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.sampling import eval_carve, eval_carve_oracle_sql
from .registry import query

#: carve size for the driver query — small vs the 500-doc fixtures and NOT a
#: multiple of the source count, so quotas mix base and remainder
#: seats and the equal-remainder tiebreak (stratum ascending) is
#: exercised on the uniformly-sized fixture sources
_CARVE_N = 67


@query(
    "doc_eval_carve",
    eval_carve_oracle_sql(
        "duckdb",
        ["source"],
        _CARVE_N,
        "doc_id",
        "SELECT source, doc_id FROM documents",
        ["source", "doc_id"],
    ),
)
def doc_eval_carve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic eval-set carve: exactly 67 documents, apportioned
    across sources by largest remainder (exact DECIMAL(38,0)/HUGEINT
    integer arithmetic — N·c overflows BIGINT long before 100 TB) and
    picked inside each source by the md5 order coin with a doc_id
    tiebreak.  The Spark side is the DataFrame operator
    (operators/sampling.eval_carve: |strata|-row quota table broadcast
    + per-stratum rank window, no single-partition stage); the oracle
    is an independently templated SQL formulation, so a hash-match
    pins the apportionment algebra AND the selection order
    cross-engine."""
    docs = load_table(spark, sf_dir, "documents").select("source", "doc_id")
    return eval_carve(docs, ["source"], _CARVE_N, "doc_id")
