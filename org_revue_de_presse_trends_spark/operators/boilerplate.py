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

from .skew import spread_for_cpu as _spread


def _segments_expr(text_col: str, delimiter: str | None, window_tokens: int):
    """Segment array as ONE parsed SQL expression (plan-build tax:
    Column-by-Column fans cost ~0.2 ms of py4j per node, CLAUDE.md)."""
    if delimiter is not None:
        # split() takes a Java REGEX: quote the delimiter with \Q...\E
        # (Pattern.quote), else '|', '.', '+' silently mis-segment —
        # every char becomes a boundary (r6 ADVICE).  A literal \E
        # inside the delimiter must close/reopen the quote region.
        quoted = "\\Q" + delimiter.replace("\\E", "\\E\\\\E\\Q") + "\\E"
        d = quoted.replace("\\", "\\\\").replace("'", "\\'")
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

    # spread_for_cpu: segmentation is an interpreted HOF fan running
    # in the scan stage, and a small corpus file arrives as ONE split
    # (r7 profile: the posexplode stage ran 1.84 s on a single task at
    # sf0.1); no-op whenever the scan already has >= cores splits
    base = _spread(df).select(
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
    # posexplode_OUTER + null-filter instead of posexplode: the
    # InferFiltersFromGenerate rule only fires on non-outer Generate,
    # and when it does it pushes a size(..)>0 filter below the
    # projection boundaries with the WHOLE segmentation expression
    # inlined several times — measured 1.5 s of interpreted re-eval in
    # the single-split scan stage at sf0.1 (r7 plan audit; the filter
    # lands BELOW the spread exchange, so no amount of repartitioning
    # helps).  The outer rows (docs with zero segments) are dropped
    # right above the Generate, where pos is a plain attribute.
    segs = (
        base.select(
            F.col(id_col),
            *per_cols,
            _segments_expr(text_col, delimiter, window_tokens).alias(
                "__bp_segs"
            ),
        )
        .select(
            F.col(id_col),
            *per_cols,
            F.posexplode_outer("__bp_segs").alias("pos", "seg"),
        )
        .where(F.col("pos").isNotNull())
    )

    # distinct-doc frequency per (group, segment); only the boilerplate
    # head survives the HAVING, so the result is broadcast-sized
    common = (
        segs.groupBy(*per_cols, "seg")
        .agg(F.countDistinct(id_col).alias("__bp_df"))
        .where(F.col("__bp_df") >= F.lit(int(min_df)))
        .select(*per_cols, "seg", F.lit(True).alias("__bp_rm"))
    )

    # flags are SKINNY from here on: (id, pos, rm) only — the r6 plan
    # audit found the old reassembly groupBy carried full segment text
    # through a wide shuffle (34.8 MB moved for a 13.6 MB read); the
    # segment strings now cross exactly one shuffle (the df count
    # above) and the clean text is rebuilt from each doc's staged
    # segment array by INDEX, in the scan stage
    flagged = segs.join(
        F.broadcast(common), on=[*per_cols, "seg"], how="left"
    ).select(
        F.col(id_col),
        "pos",
        F.coalesce("__bp_rm", F.lit(False)).alias("rm"),
    )

    # per-doc survivor positions: an ints-only shuffle (collect_list
    # skips the nulls when() yields for removed segments)
    flag_agg = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.count(F.when(F.col("rm"), 1)).alias("n_removed"),
        F.sort_array(
            F.collect_list(F.when(~F.col("rm"), F.col("pos")))
        ).alias("__bp_keep"),
    )

    # rejoin text ONCE per doc: the broadcast-sized flag side meets the
    # staged segment array in the scan stage (AQE broadcasts the agg;
    # at 100 TB this is one co-partitioned join on the doc id), and the
    # survivors are picked by index — element_at on a staged array
    # attribute is O(1) per element, no O(n^2) HOF trap
    with_segs = base.select(
        F.col(id_col),
        _segments_expr(text_col, delimiter, window_tokens).alias(
            "__bp_segs"
        ),
    )
    rebuilt = with_segs.join(flag_agg, on=id_col, how="left").select(
        F.col(id_col),
        F.array_join(
            F.transform(
                F.col("__bp_keep"),
                lambda p: F.element_at(F.col("__bp_segs"), p + F.lit(1)),
            ),
            join_delim,
        ).alias(out_col),
        "n_segments",
        "n_removed",
    )

    return df.join(rebuilt, on=id_col, how="left").select(
        *df.columns,
        F.coalesce(F.col(out_col), F.lit("")).alias(out_col),
        F.coalesce("n_segments", F.lit(0)).cast("long").alias("n_segments"),
        F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
    )
