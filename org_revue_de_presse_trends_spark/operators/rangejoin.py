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
those bands (|v1 − v2| ≤ radius ⇒ their bands differ by ≤ 1) — exact
for the long-arithmetic (integral) path.  The double path probes
{b−2 … b+2}: the residual predicate is evaluated in doubles, whose
rounding can accept a pair whose true distance is one ulp past the
radius, and that pair can sit two bands apart at a band boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint"}


def band_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    radius: int | float,
    how: str = "inner",
    left_id: str | None = None,
) -> DataFrame:
    """All (left × right) pairs with |left_val − right_val| ≤ radius.

    Column sets must be disjoint (alias beforehand).  ``how`` supports
    'inner' and 'left' ('left' keeps unmatched left rows with NULL
    right columns, like a LEFT range join).  For 'left', pass
    ``left_id`` (a unique left key) when you have one: the unmatched
    re-attach then anti-joins on that single column instead of every
    left column, which is cheaper and lets the matched side's shuffles
    be reused.

    Banding is exact long arithmetic when both the value column and
    the radius are integral (floor division via truncating DIV plus a
    negative-remainder correction — double division would lose
    integer precision above 2^53, e.g. nanosecond-epoch longs, and
    silently drop in-radius pairs).  Float values use double floor
    division, exact within the double domain.
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
    if left_id is not None and left_id not in left.columns:
        raise ValueError(f"left_id {left_id!r} not in left columns")

    ltypes = dict(left.dtypes)
    rtypes = dict(right.dtypes)
    integral = (
        isinstance(radius, int)
        and ltypes[left_val] in _INTEGRAL_TYPES
        and rtypes[right_val] in _INTEGRAL_TYPES
    )

    def band(colname: str) -> Column:
        if integral:
            # floor division in pure long arithmetic: truncating DIV,
            # minus 1 when the remainder is negative (dividend < 0) —
            # no double round-trip, so bands stay exact above 2^53
            r = int(radius)
            q = F.expr(f"`{colname}` DIV {r}")
            return F.when(
                F.col(colname) % F.lit(r) < 0, q - 1
            ).otherwise(q)
        return F.floor(F.col(colname) / F.lit(radius)).cast("long")

    build = right.withColumn("__band", band(right_val))
    lband = band(left_val)
    if integral:
        # long arithmetic is exact: |a−b| ≤ r ⟹ bands differ by ≤ 1
        probe_bands = F.array(lband - 1, lband, lband + 1)
    else:
        # double slack: the residual |a−b| ≤ r is evaluated in doubles,
        # whose one-ulp rounding can accept a pair whose TRUE distance
        # exceeds r — and such a pair can sit 2 bands apart when a
        # value lies within an ulp of a band boundary (hypothesis
        # counterexample: a=0.5, b=−2.2e−308, r=0.5: a−b rounds to
        # exactly 0.5 but b's band is −1 vs a's 1).  ±2 covers every
        # pair the double residual can accept.
        probe_bands = F.array(
            lband - 2, lband - 1, lband, lband + 1, lband + 2
        )
    probe = left.withColumn("__band", F.explode(probe_bands))
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
    # left join: re-attach unmatched left rows with NULL right columns.
    # The anti-join must be NULL-SAFE on every key it uses — a plain
    # column-list anti never equates NULL=NULL, so a matched left row
    # carrying a NULL column would ALSO come back as "unmatched" and
    # appear twice in the output.
    if left_id is not None:
        matched_keys = matched.select(left_id).distinct()
        unmatched = left.join(matched_keys, [left_id], "left_anti")
    else:
        matched_keys = matched.select(*left.columns).distinct()
        cond = None
        for c in left.columns:
            eq = left[c].eqNullSafe(matched_keys[c])
            cond = eq if cond is None else (cond & eq)
        unmatched = left.join(matched_keys, cond, "left_anti")
    for c in right.columns:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(rtypes[c]))
    return matched.unionByName(unmatched)
