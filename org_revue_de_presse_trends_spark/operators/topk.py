"""Top-k / pagination operators (SURVEY §2.6, reference trends.go:395-406).

``orderBy().limit(n)`` compiles to TakeOrderedAndProject — a distributed
top-k (per-partition heap + driver merge), NOT a full global sort, so it
scales to arbitrarily large inputs with O(k) memory per task.

Offset pagination (reference OFFSET $5 LIMIT $6, trends.go:404-406) uses
Spark 3.4+ native ``offset``; a window-based fallback is provided for
grouped pagination.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: list[Column], k: int, offset: int = 0) -> DataFrame:
    """Global deterministic top-k.  ``order`` must be a total order
    (callers append a unique-id tiebreaker — SURVEY §5.2 item 3)."""
    out = df.orderBy(*order)
    if offset > 0:
        out = out.offset(offset)
    return out.limit(k)


def top_k_per_group(
    df: DataFrame, group: list[Column], order: list[Column], k: int
) -> DataFrame:
    """Top-k within each group via ranked window; whole-stage codegen'd,
    single shuffle on the group key."""
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
