"""Corpus-level boilerplate removal (CCNet-style common-segment drop).

Web-scale corpora repeat navigation headers, cookie banners, and
footers across thousands of pages of the same domain; CCNet (Wenzek et
al. 2020, arXiv:1911.00359 §4.1) removes them by hashing paragraphs
and dropping those whose document frequency within a shard exceeds a
threshold.  This operator is the Spark-first form:

1. segment every document (paragraph delimiter, or fixed non-
   overlapping token windows for un-delimited text),
2. count each segment's DISTINCT-document frequency within a grouping
   (``per`` — typically the domain/source; repetition *inside* one doc
   is Gopher-style repetition, not boilerplate, so df is distinct),
3. drop segments with df ≥ ``min_df`` and reassemble the survivors in
   original order.

Scale shape (100 TB): the df aggregation is one hash shuffle keyed on
(group, segment) with map-side partial distinct; the boilerplate set
(df ≥ min_df) is by construction a SMALL head — it is collected into a
broadcast join, so the corpus-side pass never shuffles text.  The only
full-width shuffle is the per-document reassembly groupBy, keyed on
the doc id.  Reference parity: the reference engine has no corpus
dedup at all (trends.go is a relational job); this belongs to the
training-data-pipeline surface SURVEY.md §6 adds beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _segments_expr(text_col: str, delimiter: str | None, window_tokens: int):
    """Segment array as ONE parsed SQL expression (plan-build tax:
    Column-by-Column fans cost ~0.2 ms of py4j per node, CLAUDE.md)."""
    if delimiter is not None:
        d = delimiter.replace("\\", "\\\\").replace("'", "\\'")
        return F.expr(
            f"filter(split(`{text_col}`, '{d}'), x -> trim(x) != '')"
        )
    w = int(window_tokens)
    # non-overlapping w-token windows over the staged token array; the
    # CASE guards sequence(), which DESCENDS when size = 0 would make
    # the stop negative (sequence(0,-1) = [0,-1], not empty)
    return F.expr(
        f"CASE WHEN size(`__bp_toks`) = 0 THEN array() ELSE "
        f"transform(sequence(0, (size(`__bp_toks`) + {w} - 1) DIV {w} - 1), "
        f"i -> array_join(slice(`__bp_toks`, i * {w} + 1, {w}), ' ')) END"
    )


def remove_common_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delimiter: str | None = "\n",
    window_tokens: int = 3,
    min_df: int = 5,
    per: str | None = None,
    out_col: str = "clean_text",
) -> DataFrame:
    """All input columns plus ``out_col`` (survivor segments rejoined
    with the delimiter, or a single space in token-window mode),
    ``n_segments`` and ``n_removed`` (longs).

    ``delimiter=None`` switches to fixed ``window_tokens``-token
    segmentation for corpora without paragraph structure.  ``per``
    names a column (e.g. the source domain) within which document
    frequency is counted — boilerplate is a property of a site
    template, not of the whole web; ``None`` counts globally.
    ``min_df`` is the smallest distinct-document count that marks a
    segment as boilerplate.
    """
    join_delim = delimiter if delimiter is not None else " "
    per_cols = [per] if per is not None else []

    base = df.select(
        F.col(id_col),
        *per_cols,
        F.col(text_col),
        *(
            []
            if delimiter is not None
            else [
                F.expr(
                    f"filter(split(`{text_col}`, ' '), x -> x != '')"
                ).alias("__bp_toks")
            ]
        ),
    )
    # stage the segment array behind a projection boundary, then one
    # posexplode: (id, [per], pos, seg)
    segs = base.select(
        F.col(id_col),
        *per_cols,
        _segments_expr(text_col, delimiter, window_tokens).alias("__bp_segs"),
    ).select(
        F.col(id_col),
        *per_cols,
        F.posexplode("__bp_segs").alias("pos", "seg"),
    )

    # distinct-doc frequency per (group, segment); only the boilerplate
    # head survives the HAVING, so the result is broadcast-sized
    common = (
        segs.groupBy(*per_cols, "seg")
        .agg(F.countDistinct(id_col).alias("__bp_df"))
        .where(F.col("__bp_df") >= F.lit(int(min_df)))
        .select(*per_cols, "seg", F.lit(True).alias("__bp_rm"))
    )

    flagged = segs.join(
        F.broadcast(common), on=[*per_cols, "seg"], how="left"
    ).select(
        F.col(id_col),
        "pos",
        "seg",
        F.coalesce("__bp_rm", F.lit(False)).alias("rm"),
    )

    # one reassembly shuffle on the doc id: order by pos, keep the
    # survivors, rejoin
    rebuilt = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.count(F.when(F.col("rm"), 1)).alias("n_removed"),
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "rm", "seg"))
                    ),
                    lambda s: ~s["rm"],
                ),
                lambda s: s["seg"],
            ),
            join_delim,
        ).alias(out_col),
    )

    return df.join(rebuilt, on=id_col, how="left").select(
        *df.columns,
        F.coalesce(F.col(out_col), F.lit("")).alias(out_col),
        F.coalesce("n_segments", F.lit(0)).cast("long").alias("n_segments"),
        F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
    )
