"""Streaming → relational-DB sink leg (BASELINE north star: "worker
synchronizing relational DB to real-time DB ... as Structured Streaming
with JDBC source/sink").

``streaming.jdbc_sync`` covers the SOURCE half (bookmark polling with
predicate pushdown); this module completes the pair: a ``foreachBatch``
upsert writer that lands each micro-batch in a relational table keyed
on a unique column set, idempotently.

Why foreachBatch + upsert (and not ``writeStream.format("jdbc")``):
Spark has no native streaming JDBC sink, and the SIGMOD 2018 paper's
exactly-once recipe is an idempotent batch write per micro-batch — the
same argument as ``incremental.foreach_batch_day_overwrite`` (delete-
then-write per day partition), specialized to row-keyed tables:

- within the batch, collapse to ONE row per key (latest by ``order_col``
  with a total order — the reference's MAX-collapse semantics, A2);
- per partition, ``executemany`` a dialect-aware
  ``INSERT ... ON CONFLICT (keys) DO UPDATE`` so replayed batches and
  at-least-once delivery converge to the same final table.

The connection factory is injectable (mirrors ``document_sink``'s
``store_factory``): tests use stdlib sqlite3 (a real SQL round-trip, no
fake), production wires ``postgres_connection_factory`` (psycopg2,
import-gated — not in this container).

Scale note: writes are per-partition ``executemany`` batches over the
existing partitioning — no shuffle, no driver materialization; fan-out
to the database is bounded by the partition count, which the caller
sizes with ``coalesce`` exactly like the document sink's S5 bound.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, Row, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType

#: DB-API paramstyle placeholder per dialect.
_PLACEHOLDER = {"postgresql": "%s", "sqlite": "?"}


def upsert_sql(
    table: str,
    cols: list[str],
    key_cols: list[str],
    dialect: str = "postgresql",
) -> str:
    """Build the idempotent upsert statement for one row.

    Both PostgreSQL (9.5+) and sqlite (3.24+) speak
    ``INSERT ... ON CONFLICT (keys) DO UPDATE SET c = excluded.c``;
    only the parameter placeholder differs.  Identifiers are quoted to
    keep mixed-case column names intact.
    """
    if dialect not in _PLACEHOLDER:
        raise ValueError(f"unsupported dialect {dialect!r}")
    missing = [k for k in key_cols if k not in cols]
    if missing:
        raise ValueError(f"key columns {missing} not in frame columns {cols}")
    ph = _PLACEHOLDER[dialect]
    q = lambda c: f'"{c}"'  # noqa: E731
    non_keys = [c for c in cols if c not in key_cols]
    insert = (
        f"INSERT INTO {q(table)} ({', '.join(q(c) for c in cols)}) "
        f"VALUES ({', '.join([ph] * len(cols))})"
    )
    conflict = f" ON CONFLICT ({', '.join(q(k) for k in key_cols)})"
    if non_keys:
        sets = ", ".join(f"{q(c)} = excluded.{q(c)}" for c in non_keys)
        return f"{insert}{conflict} DO UPDATE SET {sets}"
    return f"{insert}{conflict} DO NOTHING"


def _orderable(dt) -> bool:
    """Whether Spark can sort on this type (maps cannot appear in an
    ORDER BY; arrays/structs are orderable iff their elements are)."""
    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def collapse_to_latest(
    df: DataFrame, key_cols: list[str], order_col: str | None
) -> DataFrame:
    """One row per key within the batch: latest by ``order_col`` (ties
    broken by the remaining ORDERABLE columns for a total order —
    cross-engine determinism invariant), or ``dropDuplicates`` when no
    order exists.  Without this, two updates to one key inside a
    micro-batch would race on executemany ordering.

    Unorderable columns (maps, or nested types containing maps) are
    excluded from the implicit tiebreak — a map-typed payload column
    must not make the whole batch throw at plan time; rows identical
    in every orderable column remain an arbitrary-but-single pick."""
    if order_col is None:
        return df.dropDuplicates(key_cols)
    orderable = {
        f.name for f in df.schema.fields if _orderable(f.dataType)
    }
    tiebreak = [
        c
        for c in df.columns
        if c != order_col and c not in key_cols and c in orderable
    ]
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(order_col).desc(), *[F.col(c).desc() for c in tiebreak]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def jdbc_upsert_foreach_batch(
    connection_factory: Callable[[], object],
    table: str,
    key_cols: list[str],
    order_col: str | None = None,
    dialect: str = "postgresql",
    rows_per_execute: int = 1000,
    max_partitions: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function for ``writeStream``.

    ``connection_factory`` returns a fresh DB-API connection (opened on
    the EXECUTOR, one per partition — it must be serializable, i.e.
    capture a DSN/path, not a live connection).  ``max_partitions``
    bounds concurrent database connections (the S5 argument).
    """

    def run(batch_df: DataFrame, batch_id: int) -> None:
        out = collapse_to_latest(batch_df, key_cols, order_col)
        if max_partitions is not None:
            out = out.coalesce(max_partitions)
        cols = out.columns
        sql = upsert_sql(table, cols, key_cols, dialect)

        def write_partition(rows: Iterator[Row]) -> None:
            conn = connection_factory()
            try:
                cur = conn.cursor()
                buf: list[tuple] = []
                for row in rows:
                    buf.append(tuple(row[c] for c in cols))
                    if len(buf) >= rows_per_execute:
                        cur.executemany(sql, buf)
                        buf.clear()
                if buf:
                    cur.executemany(sql, buf)
                conn.commit()
            finally:
                conn.close()

        out.foreachPartition(write_partition)

    return run


def sqlite_connection_factory(path: str) -> Callable[[], object]:
    """Test/local factory: stdlib sqlite3 against a file DB.  A 30 s
    busy timeout serializes concurrent partition writers on the file
    lock (sqlite allows one writer at a time)."""
    import sqlite3

    def connect():
        return sqlite3.connect(path, timeout=30.0)

    return connect


def postgres_connection_factory(dsn: str) -> Callable[[], object]:
    """Production factory for the reference's PostgreSQL (DSN form,
    reference trends.go:215-223).  psycopg2 is not in this container —
    the import is deferred to first use on the executor."""

    def connect():
        try:
            import psycopg2
        except ImportError as e:  # pragma: no cover - env without driver
            raise ImportError(
                "postgres_connection_factory requires psycopg2; install it "
                "on the executors or use sqlite_connection_factory locally"
            ) from e
        return psycopg2.connect(dsn)

    return connect
