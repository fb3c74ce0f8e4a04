"""Count-min sketch (CMS) frequency estimation — the fixed-memory
heavy-hitters path for key spaces too large to groupBy exactly.

A CMS is a ``depth × width`` counter table: each key increments one
counter per row (bucket = hash_row(key) mod width) and its frequency
estimate is the MIN over its depth counters (Cormode & Muthukrishnan,
"An improved data stream summary: the count-min sketch and its
applications", J. Algorithms 2005 — public algorithm).  Estimates
never under-count; over-count is bounded by collisions
(ε ≈ e/width of the stream weight, with probability 1 − e^(−depth)).

Why it matters at 100 TB: the exact heavy-hitters query shuffles a
full |distinct keys|-sized aggregation (token vocab, URL/domain
space — can be billions of groups); the CMS table is depth×width rows
REGARDLESS of key cardinality, its construction is one map-side
combinable groupBy over a bounded key space, and the finished table
broadcast-joins against any candidate set.  Estimation for a probe
set touches |probes| × depth rows.

Cross-engine determinism: the row hash is the base-16 value of the
first 12 md5 hex chars of ``"<row>|<key>"`` (the ``dsir.bucket_of``
discipline widened to 12 chars, seeded by the row index), reproducible
in DuckDB via strpos hex-decode arithmetic; all counters and estimates
are integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(col: Column, row: int, width: int) -> Column:
    """Bucket of ``col`` in CMS row ``row``: 48-bit md5-prefix hash of
    ``"<row>|<value>"`` mod width.  48 bits ≪ long — ANSI-safe."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{int(row)}|"), col.cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    return h % F.lit(int(width))


def _bucket_fan(key: Column, depth: int, width: int) -> Column:
    """array<long> of the key's bucket in every CMS row — one
    posexplode of this yields (row, bucket) pairs directly."""
    return F.array(
        *[cms_bucket(key, i, width) for i in range(int(depth))]
    )


def cms_table(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    weight_col: str | None = None,
) -> DataFrame:
    """(row, bucket, c) — the depth×width counter table, ≤ depth*width
    rows.  One posexplode (depth integer rows per input row) into one
    map-side-combinable groupBy; no key-cardinality-sized state
    anywhere."""
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    return (
        df.select(
            w.alias("__w"),
            F.posexplode(
                _bucket_fan(F.col(key_col), depth, width)
            ).alias("row", "bucket"),
        )
        .groupBy("row", "bucket")
        .agg(F.sum("__w").alias("c"))
    )


def cms_estimates(
    table: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """(key_col, est) — the CMS frequency estimate (min over depth
    counters) for every probe key.  The counter table is ≤ depth*width
    rows: broadcast-joined regardless of probe volume.  A probe key
    whose (row, bucket) is absent from the table (possible only when
    nothing hashed there) contributes 0 to the min."""
    fan = (
        probes.select(F.col(key_col))
        .distinct()
        .select(
            key_col,
            F.posexplode(
                _bucket_fan(F.col(key_col), depth, width)
            ).alias("row", "bucket"),
        )
    )
    joined = fan.join(F.broadcast(table), ["row", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0).cast("long"))).alias("est")
    )
