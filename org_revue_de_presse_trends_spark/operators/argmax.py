"""Argmax-per-group (SURVEY §2.5 A4, reference trends.go:336-349).

The reference implements "the top tweet of each publisher" as ten
parallel ``(ARRAY_AGG(col ORDER BY pop DESC))[1]`` columns sharing one
sort key.  Spark-first equivalent: ONE ``max_by(struct(payload), key)``
declarative aggregate — a single hash aggregation with map-side partial
combine (each task keeps only its local argmax per group), no array
materialization, no window sort.  This is the formulation that survives
100 TB: state per group is O(1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def argmax(
    df: DataFrame,
    group: list[str],
    order_key: Column,
    payload: list[str] | None = None,
    extra: list[Column] | None = None,
) -> DataFrame:
    """One row per group: the payload columns of the row with the
    maximal ``order_key``.  ``order_key`` must be totally ordered within
    each group (append a unique id as a struct tiebreaker for
    determinism).

    ``extra`` — additional aliased aggregate columns computed in the
    SAME hash aggregate (e.g. ``F.min("ts").alias("first_ts")``).  This
    keeps argmax + sibling per-group stats a single shuffle instead of
    an aggregate-then-self-join."""
    payload = payload or [c for c in df.columns if c not in group]
    picked = F.max_by(F.struct(*[F.col(c) for c in payload]), order_key).alias("__top")
    out = df.groupBy(*[F.col(c) for c in group]).agg(picked, *(extra or []))
    extra_names = [c for c in out.columns if c not in group and c != "__top"]
    return out.select(
        *group,
        *[F.col(f"__top.{c}").alias(c) for c in payload],
        *extra_names,
    )
