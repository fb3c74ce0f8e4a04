"""Per-query execution counters — the engine's observability surface.

The reference ships Datadog APM tracing around each worker run
(reference trends.go:14, dd-trace-go in go.mod:5-12): per-query spans
with row counts.  The Spark-native analogue reads the driver's own
status stores after each action:

- ``SQLAppStatusStore`` (``sharedState().statusStore()``) — the store
  behind the SQL UI tab, populated even with the UI disabled: per-
  execution SQLMetrics (output rows, files/bytes read, shuffle bytes,
  spill).
- ``StatusTracker`` (public PySpark API) — job/stage/task counts for a
  job group.

No SparkListener callback is involved: py4j's Python-callback channel
is not available in every deployment (probed — the classic client
gateway here has no callback server), while these stores are always
populated on the driver.  Overhead is two in-memory reads per query,
zero per-task cost.

Usage::

    mc = MetricsCollector(spark)
    rows, qm = mc.measure("daily_top_events", df)
    log(qm.to_json())        # one structured line, dd-span parity

Scale note: both stores are bounded ring buffers
(``spark.sql.ui.retainedExecutions`` / ``spark.ui.retainedJobs``), so
the collector is safe in long-lived sessions; it diffs execution ids
per measure call rather than scanning history.
"""

from __future__ import annotations

import json
import re
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_SIZE_UNITS = {
    "B": 1,
    "KiB": 1024,
    "MiB": 1024**2,
    "GiB": 1024**3,
    "TiB": 1024**4,
}

#: metric name → QueryMetrics field it accumulates into
_SUMMED_METRICS = {
    "number of output rows": "sql_output_rows",
    "number of files read": "files_read",
    "size of files read": "bytes_read",
    "shuffle bytes written": "shuffle_bytes_written",
    "spill size": "spill_bytes",
}


def parse_metric_value(s: str) -> float:
    """Parse a formatted SQLMetric value into a number.

    The store renders values for the UI: ``'1,500'``, ``'35.8 KiB'``,
    ``'261 ms'``, or the multi-task form ``'total (min, med, max (...))
    \\n3.2 MiB (...)'`` — we take the total (text before the first
    parenthesis/newline) and convert size/time units (sizes to bytes,
    times to seconds).
    """
    lines = s.strip().splitlines()
    if not lines:  # empty metric value: degrade to 0.0 like garbage does
        return 0.0
    head = lines[-1]  # multi-line: total is last line
    head = head.split("(", 1)[0].strip()
    m = re.match(r"^(-?[\d.,]+)\s*([A-Za-z]*)$", head)
    if not m:
        return 0.0
    num = float(m.group(1).replace(",", ""))
    unit = m.group(2)
    if unit in _SIZE_UNITS:
        return num * _SIZE_UNITS[unit]
    if unit == "ms":
        return num / 1000.0
    if unit in ("s", "sec"):
        return num
    return num


@dataclass
class QueryMetrics:
    """One query's execution counters (the dd-trace span analogue)."""

    name: str
    wall_sec: float = 0.0
    result_rows: int = 0
    n_executions: int = 0
    n_jobs: int = 0
    n_tasks: int = 0
    sql_output_rows: float = 0.0  # summed across plan nodes
    files_read: float = 0.0
    bytes_read: float = 0.0
    shuffle_bytes_written: float = 0.0
    spill_bytes: float = 0.0
    extra: dict = field(default_factory=dict)

    def to_dict(self) -> dict:
        d = {
            "query": self.name,
            "wall_sec": round(self.wall_sec, 3),
            "result_rows": self.result_rows,
            "executions": self.n_executions,
            "jobs": self.n_jobs,
            "tasks": self.n_tasks,
            "sql_output_rows": int(self.sql_output_rows),
            "files_read": int(self.files_read),
            "bytes_read": int(self.bytes_read),
            "shuffle_bytes_written": int(self.shuffle_bytes_written),
            "spill_bytes": int(self.spill_bytes),
        }
        d.update(self.extra)
        return d

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), sort_keys=True)


class MetricsCollector:
    """Measure actions against a SparkSession, yielding QueryMetrics.

    Each ``measure`` call brackets the action with (a) a job group so
    StatusTracker attributes jobs/stages/tasks to THIS query even on a
    shared session, and (b) an execution-id watermark on the SQL status
    store so only new executions are aggregated.
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.sc = spark.sparkContext

    def _status_store(self):
        return self.spark._jsparkSession.sharedState().statusStore()

    def _max_execution_id(self) -> int:
        execs = self._status_store().executionsList()
        n = execs.size()
        return execs.apply(n - 1).executionId() if n else -1

    def measure(
        self,
        name: str,
        df: DataFrame,
        action=None,
        job_group=None,
        since_execution_id: int | None = None,
    ):
        """Run ``action(df)`` (default ``collect``) and return
        ``(result, QueryMetrics)``.

        ``job_group``: join an existing thread-local job group instead
        of setting our own — lets a caller that owns the group (e.g. a
        watchdog that needs to ``cancelJobGroup`` it) compose with
        metrics collection; the caller is responsible for set/unset.

        ``since_execution_id``: aggregate SQL-execution metrics from
        executions AFTER this id instead of from the call time —
        callers that run eager work during plan BUILD (localCheckpoint
        gates, k-means/driver loops) pass ``_max_execution_id()`` taken
        before the build so that work's shuffle/IO is attributed to the
        query rather than silently dropped (bench.py r8: the clustering
        query's containment-pair join executes at build and its shuffle
        vanished from query_io)."""
        own_group = job_group is None
        group = job_group or f"metrics:{name}:{time.monotonic_ns()}"
        watermark = (
            since_execution_id
            if since_execution_id is not None
            else self._max_execution_id()
        )
        qm = QueryMetrics(name=name)
        if own_group:
            self.sc.setJobGroup(group, f"metrics for {name}", False)
        t0 = time.perf_counter()
        try:
            result = action(df) if action is not None else df.collect()
        finally:
            if own_group:
                self.sc.setJobGroup("", "", False)
        qm.wall_sec = time.perf_counter() - t0
        try:
            qm.result_rows = len(result)
        except TypeError:
            qm.result_rows = -1

        tracker = self.sc.statusTracker()
        job_ids = tracker.getJobIdsForGroup(group) or []
        qm.n_jobs = len(job_ids)
        for jid in job_ids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None:
                    qm.n_tasks += si.numTasks

        store = self._status_store()
        execs = store.executionsList()
        for i in range(execs.size()):
            ex = execs.apply(i)
            if ex.executionId() <= watermark:
                continue
            qm.n_executions += 1
            values = store.executionMetrics(ex.executionId())
            it = ex.metrics().iterator()
            while it.hasNext():
                metric = it.next()
                field_name = _SUMMED_METRICS.get(metric.name())
                if field_name is None:
                    continue
                opt = values.get(metric.accumulatorId())
                if opt.isDefined():
                    current = getattr(qm, field_name)
                    setattr(
                        qm,
                        field_name,
                        current + parse_metric_value(opt.get()),
                    )
        return result, qm
