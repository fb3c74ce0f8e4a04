"""Relational-DB → document-store sync bridge (BASELINE.json north
star: "worker synchronizing relational DB to real-time DB ... as
Structured Streaming with JDBC source/sink").

Spark has no native streaming JDBC source, so the idiomatic bridge is
incremental polling: each poll reads only rows past a monotonic
bookmark column (pushed down to the database as a WHERE predicate),
processes them with the normal batch pipeline, and advances the
bookmark — exactly the coordination logic the reference's cron rerun
approximates, made continuous.  Combined with
``foreach_batch_day_overwrite`` the end-to-end path is:

    Postgres --(bookmark polls)--> trends pipeline --(day overwrite)-->
    lake / document store

Delivery semantics: at-least-once per poll window; the idempotent
day-overwrite sink upgrades it to effectively exactly-once, the same
argument as foreachBatch upserts (SIGMOD 2018).

The reader is injectable (``read_increment(lower_exclusive) -> DF``)
so tests drive the bookmark protocol against parquet; production wires
``sources.jdbc.read_jdbc`` with a pushed-down predicate.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class IncrementalSync:
    """Bookmark-driven incremental poller over a monotonic column
    (auto-increment PK, commit timestamp, ...)."""

    def __init__(
        self,
        read_increment: Callable[[object], DataFrame],
        bookmark_col: str,
        start: object = None,
    ):
        self.read_increment = read_increment
        self.bookmark_col = bookmark_col
        self.bookmark = start

    def poll(self) -> DataFrame | None:
        """Read rows past the bookmark; advance it to the batch max.
        Returns None when no new rows arrived."""
        df = self.read_increment(self.bookmark)
        hi = df.agg(F.max(self.bookmark_col)).collect()[0][0]
        if hi is None:
            return None
        self.bookmark = hi
        return df


def jdbc_increment_reader(
    spark, options: dict[str, str], table: str, bookmark_col: str
) -> Callable[[object], DataFrame]:
    """Production reader: pushes ``bookmark_col > lower`` down to the
    database inside the JDBC query (only new rows cross the wire)."""
    from ..sources.jdbc import read_jdbc

    def read(lower) -> DataFrame:
        predicate = "" if lower is None else f" WHERE {bookmark_col} > {lower!r}"
        opts = dict(options)
        opts.pop("dbtable", None)
        opts["query"] = f"SELECT * FROM {table}{predicate}"
        return read_jdbc(spark, opts)

    return read


def run_sync(
    sync: IncrementalSync,
    process_batch: Callable[[DataFrame, int], None],
    max_polls: int = 10,
    poll_interval_s: float = 0.0,
    stop_on_empty: bool = True,
) -> int:
    """Drive the poll loop: each non-empty increment goes through
    ``process_batch`` (typically foreach_batch_day_overwrite's
    function or a document-sink write).  Returns batches processed."""
    processed = 0
    for i in range(max_polls):
        batch = sync.poll()
        if batch is None:
            if stop_on_empty:
                break
            if poll_interval_s:
                time.sleep(poll_interval_s)
            continue
        process_batch(batch, i)
        processed += 1
        if poll_interval_s:
            time.sleep(poll_interval_s)
    return processed
