"""Banded interval (range) join — the distributed pattern for non-equi
joins on |left.val − right.val| ≤ radius.

Spark turns a raw theta-join into BroadcastNestedLoopJoin (or worse, a
cartesian) because there is no equi key.  The banded form synthesizes
one: bucket the value axis into bands of width ≥ the radius, key the
BUILD side by its band once, explode the PROBE side to its band and
both neighbors (any in-radius partner lands in one of the three), then
apply the exact residual predicate.  The result is a plain shuffled
equi-join on the band key: partitionable, AQE-skew-splittable, linear
in matches — the same family trick as the LSH band join (dedup) and
the same-day as-of join (operators/asof.py).

When only an AGGREGATE over matches is needed and the predicate
touches a low-cardinality axis (days), push the aggregation through
the join instead — see plans/analytics_ext.orders_nearby_count for the
measured 20×-cheaper rewrite.  This operator is for when the per-pair
rows themselves survive.

Band width = radius: with bands b = floor(v / radius) and probe
exploded to {b−1, b, b+1}, any partner within ±radius shares one of
those bands (|v1 − v2| ≤ radius ⇒ their bands differ by ≤ 1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def band_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    radius: int | float,
    how: str = "inner",
) -> DataFrame:
    """All (left × right) pairs with |left_val − right_val| ≤ radius.

    Column sets must be disjoint (alias beforehand).  ``how`` supports
    'inner' and 'left' ('left' keeps unmatched left rows with NULL
    right columns, like a LEFT range join).
    """
    if radius <= 0:
        raise ValueError(f"radius must be positive, got {radius}")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"left/right share columns {sorted(overlap)}; alias first"
        )
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")

    def band(col: Column) -> Column:
        return F.floor(col / F.lit(radius)).cast("long")

    build = right.withColumn("__band", band(F.col(right_val)))
    probe = left.withColumn(
        "__band",
        F.explode(
            F.array(
                band(F.col(left_val)) - 1,
                band(F.col(left_val)),
                band(F.col(left_val)) + 1,
            )
        ),
    )
    residual = (
        F.abs(F.col(left_val) - F.col(right_val)) <= F.lit(radius)
    )
    matched = (
        probe.join(build, "__band")
        .filter(residual)
        .drop("__band")
    )
    if how == "inner":
        return matched
    # left join: re-attach unmatched left rows with NULL right side
    matched_keys = matched.select(*left.columns).distinct()
    unmatched = left.join(matched_keys, list(left.columns), "left_anti")
    for c in right.columns:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(dict(right.dtypes)[c])
        )
    return matched.unionByName(unmatched)
