"""Deleted-member exclusion / anti-joins (SURVEY §2.3 F3, reference
trends.go:313-320,379-386).

The reference uses Postgres ``NOT IN (subquery)`` — null-aware (one NULL
key in the subquery empties the result).  Engine policy (SURVEY §2.3):
``left_anti`` on non-null keys is the default; ``null_aware=True``
reproduces exact NOT IN semantics via Spark SQL's native null-aware
anti-join rewrite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def anti_join(
    left: DataFrame,
    keys: DataFrame,
    on: tuple[str, str],
    null_aware: bool = False,
) -> DataFrame:
    lk, rk = on
    if not null_aware:
        return left.join(
            keys.select(F.col(rk).alias(rk)).where(F.col(rk).isNotNull()).distinct(),
            left[lk] == F.col(rk),
            "left_anti",
        )
    # NOT IN semantics: if the key set contains any NULL, nothing passes.
    # View names are uuid-suffixed: two concurrent null-aware anti-joins
    # in one session must not clobber each other's views, and sql()
    # resolves eagerly so the views can be dropped right away.
    import uuid

    tag = uuid.uuid4().hex
    lv, kv = f"__aj_left_{tag}", f"__aj_keys_{tag}"
    spark = left.sparkSession
    left.createOrReplaceTempView(lv)
    keys.select(F.col(rk)).createOrReplaceTempView(kv)
    try:
        return spark.sql(
            f"SELECT * FROM {lv} WHERE {lk} NOT IN (SELECT {rk} FROM {kv})"
        )
    finally:
        spark.catalog.dropTempView(lv)
        spark.catalog.dropTempView(kv)


def semi_join(left: DataFrame, keys: DataFrame, on: tuple[str, str]) -> DataFrame:
    lk, rk = on
    return left.join(keys.select(F.col(rk)).distinct(), left[lk] == F.col(rk), "left_semi")
