"""Bucketed tables — co-located joins without a per-query shuffle.

At 100 TB the dominant cost of the trends spine joins (J1/J5: status ⋈
highlight ⋈ popularity, all keyed by status id) is the repeated shuffle
of the fact tables.  Persisting them bucketed by the join key makes
every subsequent join shuffle-free: both sides are pre-hash-partitioned
into the same bucket layout, so SortMergeJoin reads buckets pairwise
(verified in tests: the joined plan contains no Exchange).

Bucket count is a layout-time decision: pick ≈ (table size /
target-partition-size), power of two, identical on co-joined tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    num_buckets: int = 8,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
