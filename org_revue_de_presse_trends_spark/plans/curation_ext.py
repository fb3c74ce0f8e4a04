"""Late-registering curation queries (past the driver's 50-slot
window on purpose — the in-repo contract gate still oracle-checks
them; see tests/test_driver_contract.py overflow pin).

Currently: corpus-level boilerplate removal (CCNet-style common-
segment drop, operators/boilerplate.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.boilerplate import remove_common_segments
from .registry import query


@query(
    "doc_boilerplate_removal",
    """
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(string_split(text, ' '), x -> x != '') AS t
      FROM documents
    ),
    pos AS (
      SELECT doc_id, source, t, unnest(range(1, len(t)+1)) AS ord
      FROM toks
    ),
    segs AS (
      SELECT doc_id, source, (ord-1)//2 AS pos,
             string_agg(t[CAST(ord AS INT)], ' ' ORDER BY ord) AS seg
      FROM pos GROUP BY doc_id, source, (ord-1)//2
    ),
    common AS (
      SELECT source, seg FROM segs
      GROUP BY source, seg HAVING count(DISTINCT doc_id) >= 4
    ),
    flag AS (
      SELECT s.doc_id, s.pos, s.seg, (c.seg IS NOT NULL) AS rm
      FROM segs s LEFT JOIN common c USING (source, seg)
    )
    SELECT doc_id,
           coalesce(string_agg(seg, ' ' ORDER BY pos)
                    FILTER (WHERE NOT rm), '') AS clean_text,
           count(*) AS n_segments,
           count(*) FILTER (WHERE rm) AS n_removed
    FROM flag GROUP BY doc_id
    """,
)
def doc_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate drop over the documents table: 2-token
    windows (the synthetic corpus has no paragraph structure), document
    frequency counted per source, segments shared by >= 4 distinct docs
    of a source removed and the survivors rejoined in order."""
    docs = load_table(spark, sf_dir, "documents")
    out = remove_common_segments(
        docs,
        delimiter=None,
        window_tokens=2,
        min_df=4,
        per="source",
    )
    return out.select("doc_id", "clean_text", "n_segments", "n_removed")
