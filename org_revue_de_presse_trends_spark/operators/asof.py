"""As-of / same-day interval joins (SURVEY §2.4 J5, reference
trends.go:396-399).

The reference's popularity join is a day-granularity as-of join: match
each publication with popularity checks taken on the publication's own
civil day, then collapse to the peak (MAX).  Generalized here:

- ``same_day_join``  — exact reference semantics (equi-join on key +
  derived day column, so it stays a shuffled HASH join, never a range
  join — the day column IS the range bucket).
- ``asof_join``      — generic "latest right row at or before left ts"
  via equi-key join + range predicate + max_by collapse.  The equi-key
  keeps the join hash-partitioned; the range predicate is evaluated
  post-match, so no BroadcastNestedLoop at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def same_day_join(
    left: DataFrame,
    right: DataFrame,
    key: tuple[str, str],
    day: tuple[Column, Column],
    how: str = "left",
) -> DataFrame:
    lk, rk = key
    ld, rd = day
    cond = (left[lk] == right[rk]) & (ld == rd)
    return left.join(right, cond, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: tuple[str, str],
    ts: tuple[str, str],
    payload: list[str],
    tolerance: str | None = None,
    tiebreak: str | None = None,
    left_id: str | None = None,
) -> DataFrame:
    """For each left row: the right row with the greatest ``ts`` that is
    <= left ts (optionally within ``tolerance``, e.g. '7 days').

    ``tiebreak`` names a unique right column used to break equal-ts
    matches deterministically (max wins); without it, ties are
    implementation-defined.

    ``left_id`` names a unique left column: the argmax collapse then
    groups by that id ALONE — grouping by every left column would hash
    and serialize whole row payloads per matched row, and the rejoin
    would re-shuffle on the same wide key.  Without it a synthetic id
    is derived; the id'd left is lazily localCheckpointed because
    ``monotonically_increasing_id`` is nondeterministic under
    recomputation and the probe and rejoin branches must see identical
    ids.  At scale, pass a real key column to skip that materialization.

    Implementation: inner equi-join on key over an (id, key, ts)-slim
    probe side (hash-partitioned shuffle), range filter in the join
    condition, argmax collapse per left id — one shuffle + one
    partial-aggregating shuffle on the narrow id.  Left rows with no
    match are preserved via a final left join back on the id.
    """
    lk, rk = key
    lts, rts = ts
    derived = left_id is None
    if derived:
        lid = "__asof_lid"
        base = left.withColumn(
            lid, F.monotonically_increasing_id()
        ).localCheckpoint(eager=False)
    else:
        lid, base = left_id, left
    # alias both sides: left/right often share lineage (self as-of
    # joins, e.g. purchases vs clicks from one events table), which
    # makes bare column references ambiguous
    probe_cols = list(dict.fromkeys([lid, lk, lts]))
    la = base.select(*probe_cols).alias("__asof_l")
    ra = right.alias("__asof_r")
    L = lambda c: F.col(f"__asof_l.{c}")
    R = lambda c: F.col(f"__asof_r.{c}")
    cond = (L(lk) == R(rk)) & (R(rts) <= L(lts))
    if tolerance is not None:
        cond = cond & (R(rts) >= L(lts) - F.expr(f"INTERVAL {tolerance}"))
    order_key = (
        F.struct(R(rts), R(tiebreak))
        if tiebreak is not None
        else F.struct(R(rts))
    )
    matched = (
        la.join(ra, cond, "inner")
        .groupBy(L(lid).alias(lid))
        .agg(
            *[
                F.max_by(R(p), order_key).alias(f"asof_{p}")
                for p in payload
            ]
        )
    )
    out = base.join(matched, on=lid, how="left")
    return out.drop(lid) if derived else out
