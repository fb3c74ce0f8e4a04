"""Change-data-capture operators: MERGE (upsert/delete apply) and
slowly-changing-dimension type-2 history building.

Both are the batch halves of a lakehouse ingestion loop the reference
delegated to Postgres (trends.go's relational writes): apply a
changelog onto a snapshot (MERGE), or keep the full attribute history
with validity intervals (SCD2, Kimball's type-2 dimension).

Scale shape (100 TB): everything is keyed on the entity key — MERGE is
one union + one hash aggregate (max_by picks the winner per key, with
map-side partial combine, so the shuffle carries one candidate row per
key per map partition, not the changelog); SCD2 is window work inside
one hash partitioning on the key plus a second, already-collapsed pass
for the interval close-off.  No joins, no driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a changelog to a snapshot: the LATEST entry per key wins
    (changes always beat the snapshot; among changes, ``seq_cols``
    lexicographically — the caller must make them a total order per
    key, e.g. (ts, unique event id)).  A key whose latest entry is a
    ``delete_op`` disappears; keys only in the snapshot pass through;
    keys only in the changelog are inserts.

    ``snapshot`` carries the key + value columns; ``changes`` carries
    key + value + ``op_col`` + ``seq_cols``.  Returns the snapshot
    schema (key + value columns).
    """
    val_cols = [c for c in snapshot.columns if c not in key_cols]
    snap = snapshot.select(
        *key_cols,
        *val_cols,
        F.lit("U").alias("__m_op"),
        F.lit(0).alias("__m_rank"),
        *[
            F.lit(None).cast(changes.schema[s].dataType).alias(f"__m_seq{i}")
            for i, s in enumerate(seq_cols)
        ],
    )
    chg = changes.select(
        *key_cols,
        *val_cols,
        F.col(op_col).alias("__m_op"),
        F.lit(1).alias("__m_rank"),
        *[F.col(s).alias(f"__m_seq{i}") for i, s in enumerate(seq_cols)],
    )
    seq_names = [f"__m_seq{i}" for i in range(len(seq_cols))]
    # struct comparison is lexicographic: __m_rank alone orders the
    # snapshot (0) below every change (1), so the NULL snapshot seq
    # fields are never reached; seq fields only break ties AMONG
    # changes, where they are non-null by the caller's contract
    winner = snap.unionByName(chg).groupBy(*key_cols).agg(
        F.max_by(
            F.struct(*val_cols, "__m_op"),
            F.struct("__m_rank", *seq_names),
        ).alias("__m_w")
    )
    return (
        winner.where(F.col("__m_w")["__m_op"] != F.lit(delete_op))
        .select(
            *key_cols,
            *[F.col("__m_w")[c].alias(c) for c in val_cols],
        )
    )


def scd2_from_observations(
    df: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Type-2 history from an observation stream: consecutive
    observations of the same ``attr_cols`` value per key collapse into
    one validity interval.  Output: key + attrs + ``valid_from`` (first
    observation ts), ``valid_to`` (next interval's valid_from, NULL for
    the open current interval), ``is_current``, ``n_obs``.

    ``tiebreak_col`` must make (ts, tiebreak) a total order per key
    (determinism invariant: every window carries a unique tiebreaker).
    """
    order = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col)
    attrs = F.struct(*attr_cols)
    changed = F.when(
        F.lag(attrs).over(order).isNull()
        | ~attrs.eqNullSafe(F.lag(attrs).over(order)),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = Window.partitionBy(*key_cols).orderBy(
        ts_col, tiebreak_col
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = df.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col),
        F.sum(changed).over(running).alias("__s_island"),
    )
    collapsed = islands.groupBy(*key_cols, "__s_island").agg(
        *[F.first(a).alias(a) for a in attr_cols],
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    closing = Window.partitionBy(*key_cols).orderBy("__s_island")
    return collapsed.select(
        *key_cols,
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(closing).alias("valid_to"),
        F.lead("valid_from").over(closing).isNull().alias("is_current"),
        "n_obs",
    )
