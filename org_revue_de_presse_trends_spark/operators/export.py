"""Deterministic shard export + order-independent content manifests —
the data-integrity step of a training-data export (WebDataset/
tfrecord-style pipelines ship a shard manifest next to the shards;
public practice, e.g. the shard-listing `.json`/`nvinfo` sidecars of
WebDataset and Megatron data tooling).

Two guarantees a 100 TB export needs and plain `write.parquet` lacks:

1. **Layout-independent shard assignment** — a row's shard is a pure
   function of its ID (md5-bucket, the `operators/packing.py` hash-bin
   discipline), never of `spark_partition_id`/input split order, so a
   re-run of the same corpus on any cluster layout produces the same
   shard membership.
2. **Order-independent content checksums** — per shard, the exact
   integer SUM of a 60-bit per-row md5 digest, reduced mod 2^61-1.
   Modular addition is commutative/associative, so the checksum is
   independent of row order, partitioning, and engine; two exports
   can be compared shard-by-shard WITHOUT sorting either one.  The
   sum accumulates in decimal(38,0) (HUGEINT in DuckDB) before the
   one mod, so no intermediate overflows under ANSI (60-bit rows
   overflow BIGINT at ~8k rows).

Cross-engine determinism: the row digest is the base-16 value of the
first 15 md5 hex chars (`urls.md5_bucket_sql` — the dsir/kmv/bloom
recipe) over a canonical `id \\x1f payload` string with an explicit
NULL sentinel (concat_ws would silently SKIP nulls, making
`("a", NULL)` collide with `("a", "")`).  Payload columns must be
strings or integers — float-to-string formatting differs between
engines and is rejected at plan build.

Scale shape: manifesting is one map + one |shards|-row map-side-
combined aggregate; writing is one hash repartition to n_shards
followed by a partitioned write.  Nothing collects but the manifest
itself (|shards| rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .urls import md5_bucket_sql

#: checksum modulus: the Mersenne prime 2^61 - 1 (fits BIGINT in both
#: engines; sums are reduced once, AFTER the exact decimal accumulation)
CHECKSUM_MOD = (1 << 61) - 1

#: unit separator — the canonical-string field delimiter, embedded as
#: the REAL control character (DuckDB string literals do not process
#: backslash escapes, so '\\u001f' would be six literal chars there
#: and one char in Spark — a silent cross-engine divergence)
_SEP = "\x1f"
#: explicit NULL sentinel (concat_ws drops nulls silently; starts with
#: the separator so it cannot equal any payload that lacks US chars —
#: payloads containing \\x1f are the caller's delimiter problem,
#: documented above)
_NULL = "\x1fNULL"

_INTISH = ("int", "bigint", "smallint", "tinyint", "long")


def _canonical_expr(engine: str, id_col: str, payload_cols: list[str]) -> str:
    """`id <US> col1 <US> col2 ...` with NULL sentinels, per engine."""
    e_str = "STRING" if engine == "spark" else "VARCHAR"
    parts = [f"CAST({id_col} AS {e_str})"]
    parts += [
        f"coalesce(CAST({c} AS {e_str}), '{_NULL}')" for c in payload_cols
    ]
    sep = f"'{_SEP}'"
    joined = f" || {sep} || ".join(parts)
    return f"({joined})"


def row_checksum_sql(engine: str, id_col: str, payload_cols: list[str]) -> str:
    """60-bit per-row content digest, identical in Spark and DuckDB."""
    return md5_bucket_sql(
        engine, _canonical_expr(engine, id_col, payload_cols), 15
    )


def shard_id_sql(engine: str, id_col: str, n_shards: int) -> str:
    """Layout-independent shard assignment: md5-bucket of the ID."""
    e_str = "STRING" if engine == "spark" else "VARCHAR"
    return (
        f"({md5_bucket_sql(engine, f'CAST({id_col} AS {e_str})', 6)}"
        f" % {int(n_shards)})"
    )


def _check_payload_types(
    df: DataFrame, id_col: str, payload_cols: list[str]
) -> None:
    types = dict(df.dtypes)
    for c in [id_col, *payload_cols]:
        t = types.get(c, "?")
        if t != "string" and t not in _INTISH:
            raise ValueError(
                f"column {c!r} has type {t}: only string/integer "
                "columns checksum identically across engines (float "
                "formatting differs)"
            )


def shard_manifest(
    df: DataFrame,
    n_shards: int,
    id_col: str,
    payload_cols: list[str],
    extra_group_cols: list[str] | None = None,
) -> DataFrame:
    """(shard_id, n_rows, total_chars, checksum) per shard — the
    sidecar a reader uses to verify an export without sorting it.
    ``extra_group_cols`` (e.g. the train/val/test split) prepend to
    the grouping so a split-partitioned export gets one manifest row
    per (split, shard).

    checksum = SUM(60-bit row digest) accumulated exactly in
    decimal(38,0), reduced mod 2^61-1, cast BIGINT; total_chars =
    exact sum of payload canonical-string lengths (a cheap secondary
    invariant that catches truncation even under digest collisions).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    _check_payload_types(df, id_col, payload_cols)
    extra = list(extra_group_cols or [])
    canon = _canonical_expr("spark", id_col, payload_cols)
    return (
        df.selectExpr(
            *extra,
            f"{shard_id_sql('spark', id_col, n_shards)} AS shard_id",
            f"{row_checksum_sql('spark', id_col, payload_cols)} AS __ck",
            f"length({canon}) AS __len",
        )
        .groupBy(*extra, "shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("__len").cast("long")).alias("total_chars"),
            F.expr(
                "CAST(SUM(CAST(__ck AS DECIMAL(38,0)))"
                f" % {CHECKSUM_MOD} AS BIGINT)"
            ).alias("checksum"),
        )
    )


def manifest_oracle_sql(
    engine: str,
    n_shards: int,
    id_col: str,
    payload_cols: list[str],
    table_sql: str,
) -> str:
    """The manifest as one SQL string (both engines — the Spark form
    is the exact expression tree shard_manifest builds, pinned by the
    cross-engine test; the DuckDB form is the oracle)."""
    canon = _canonical_expr(engine, id_col, payload_cols)
    ck = row_checksum_sql(engine, id_col, payload_cols)
    sid = shard_id_sql(engine, id_col, n_shards)
    dec = "DECIMAL(38,0)" if engine == "spark" else "HUGEINT"
    return f"""
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(clen AS BIGINT)) AS BIGINT) AS total_chars,
           CAST(SUM(CAST(ck AS {dec})) % {CHECKSUM_MOD} AS BIGINT)
             AS checksum
    FROM (
        SELECT {sid} AS shard_id, {ck} AS ck, length({canon}) AS clen
        FROM ({table_sql})
    )
    GROUP BY shard_id
    """


def verify_export(
    spark,
    path: str,
    manifest: DataFrame,
    n_shards: int,
    id_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Reader-side integrity check: recompute the manifest from the
    files at ``path`` and FULL-OUTER-join it against the expected one
    — returns only mismatched shards (empty = export verified), with
    both sides' counts/checksums so a corrupt, truncated, or missing
    shard names itself.  The outer join (not inner) is the totality
    rule: a shard absent on either side must surface, not vanish."""
    got = shard_manifest(
        spark.read.parquet(path).select(id_col, *payload_cols),
        n_shards,
        id_col,
        payload_cols,
    ).select(
        F.col("shard_id"),
        F.col("n_rows").alias("got_rows"),
        F.col("total_chars").alias("got_chars"),
        F.col("checksum").alias("got_checksum"),
    )
    want = manifest.select(
        F.col("shard_id"),
        F.col("n_rows").alias("want_rows"),
        F.col("total_chars").alias("want_chars"),
        F.col("checksum").alias("want_checksum"),
    )
    return want.join(got, "shard_id", "full_outer").filter(
        ~(
            F.col("got_rows").eqNullSafe(F.col("want_rows"))
            & F.col("got_chars").eqNullSafe(F.col("want_chars"))
            & F.col("got_checksum").eqNullSafe(F.col("want_checksum"))
        )
    )


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str,
    payload_cols: list[str],
    mode: str = "overwrite",
) -> DataFrame:
    """Write `df` as `path/shard_id=K/` parquet shards plus return the
    manifest (computed from the INPUT frame; a reader recomputing it
    from the written files must reproduce it — that round-trip is the
    export-integrity test).  One hash repartition co-locates each
    shard into one task's output files."""
    manifest = shard_manifest(df, n_shards, id_col, payload_cols)
    out = df.selectExpr(
        "*", f"{shard_id_sql('spark', id_col, n_shards)} AS shard_id"
    )
    (
        out.repartition(n_shards, F.col("shard_id"))
        .write.mode(mode)
        .partitionBy("shard_id")
        .parquet(path)
    )
    return manifest
