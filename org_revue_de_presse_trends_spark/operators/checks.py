"""Declarative data-quality constraints — the unit tests FOR data
(Schelter et al., "Automating large-scale data quality verification",
VLDB 2018 — the Deequ model): a training pipeline asserts
completeness, uniqueness, ranges, and accepted domains on every
ingest, and gates downstream work on the report.

Design: every constraint compiles to AGGREGATE EXPRESSIONS over one
``df.agg(...)`` pass — N constraints cost one scan + one map-side
combined aggregate, never N scans (uniqueness adds count-distincts,
which Spark plans as expands in the same aggregate).  The report is a
small DataFrame of (constraint, column, metric DOUBLE, passed
BOOLEAN) rows — joinable, storable, and ORACLE-CHECKABLE: metrics are
exact counts/mins/maxes and pinned ratios, so the whole report
reproduces value-exactly in DuckDB
(plans/sketch_ext.orders_quality_report).

Metric conventions (pinned):
- completeness  = non-null / total, rounded 9 dp; passes at ≥ min_ratio
- uniqueness    = distinct / total over the key columns (countDistinct
  drops rows with any NULL key — the SQL standard; keep keys NOT NULL)
- bounds        = the observed min or max itself; passes within bound
- accepted      = in-domain / total; passes at ≥ min_ratio
- non_empty     = row count; passes at ≥ 1
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One constraint: an aggregate metric expression plus the pass
    rule ``metric <op> bound`` (op ∈ {'ge', 'le'})."""

    constraint: str
    column: str
    metric: Column
    op: str
    bound: float


def _ratio(num: Column, den: Column) -> Column:
    return F.round(num.cast("double") / den.cast("double"), 9)


def completeness(col: str, min_ratio: float = 1.0) -> Check:
    return Check(
        f"completeness>={min_ratio!r}",
        col,
        _ratio(F.count(F.col(col)), F.count(F.lit(1))),
        "ge",
        float(min_ratio),
    )


def uniqueness(cols: Sequence[str], min_ratio: float = 1.0) -> Check:
    return Check(
        f"uniqueness>={min_ratio!r}",
        ",".join(cols),
        _ratio(
            F.countDistinct(*[F.col(c) for c in cols]),
            F.count(F.lit(1)),
        ),
        "ge",
        float(min_ratio),
    )


def min_bound(col: str, at_least: float) -> Check:
    return Check(
        f"min>={at_least!r}",
        col,
        F.round(F.min(F.col(col)).cast("double"), 9),
        "ge",
        float(at_least),
    )


def max_bound(col: str, at_most: float) -> Check:
    return Check(
        f"max<={at_most!r}",
        col,
        F.round(F.max(F.col(col)).cast("double"), 9),
        "le",
        float(at_most),
    )


def accepted_values(
    col: str, values: Sequence[str], min_ratio: float = 1.0
) -> Check:
    dom = F.col(col).isin(list(values))
    return Check(
        f"accepted_values>={min_ratio!r}",
        col,
        _ratio(F.sum(F.when(dom, 1).otherwise(0)), F.count(F.lit(1))),
        "ge",
        float(min_ratio),
    )


def non_empty() -> Check:
    return Check(
        "non_empty", "*", F.count(F.lit(1)).cast("double"), "ge", 1.0
    )


def quality_report(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """(constraint, column, metric DOUBLE, passed BOOLEAN) — one row
    per constraint, all metrics from ONE aggregate pass over ``df``.
    The wide 1-row aggregate is stacked to rows via an inline-array
    explode — no second scan, no per-check jobs."""
    if not checks:
        raise ValueError("no checks given")
    wide = df.agg(
        *[c.metric.alias(f"_m{i}") for i, c in enumerate(checks)]
    )
    structs = []
    for i, c in enumerate(checks):
        if c.op == "ge":
            passed = F.col(f"_m{i}") >= F.lit(c.bound)
        elif c.op == "le":
            passed = F.col(f"_m{i}") <= F.lit(c.bound)
        else:
            raise ValueError(f"unknown op {c.op!r}")
        structs.append(
            F.struct(
                F.lit(c.constraint).alias("constraint"),
                F.lit(c.column).alias("column"),
                F.col(f"_m{i}").alias("metric"),
                passed.alias("passed"),
            )
        )
    return wide.select(F.explode(F.array(*structs)).alias("r")).select(
        "r.constraint", "r.column", "r.metric", "r.passed"
    )


def profile_table(df: DataFrame) -> DataFrame:
    """Generic per-column profile — the DISCOVERY companion to the
    constraint checks: (column, dtype, n BIGINT, n_null BIGINT,
    n_distinct BIGINT, min_value DOUBLE, max_value DOUBLE), one row
    per column, ALL from one aggregate pass.

    min/max are populated for numeric columns only (rounded to 6 dp
    after a double cast — cross-engine string rendering of decimals
    and dates is not pinned, doubles are); n_distinct counts non-null
    values (count-distinct SQL semantics).  The profile a pipeline
    writes next to every snapshot so schema or cardinality drift is a
    diff, not an investigation."""
    from pyspark.sql import types as T

    numeric = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType, T.DecimalType,
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for f in df.schema.fields:
        c = f.name
        aggs.append(F.count(F.col(c)).cast("long").alias(f"_nn_{c}"))
        aggs.append(
            F.countDistinct(F.col(c)).cast("long").alias(f"_nd_{c}")
        )
        if isinstance(f.dataType, numeric):
            aggs.append(
                F.round(F.min(F.col(c)).cast("double"), 6).alias(
                    f"_mn_{c}"
                )
            )
            aggs.append(
                F.round(F.max(F.col(c)).cast("double"), 6).alias(
                    f"_mx_{c}"
                )
            )
    wide = df.agg(*aggs)
    structs = []
    for f in df.schema.fields:
        c = f.name
        is_num = isinstance(f.dataType, numeric)
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(f.dataType.simpleString()).alias("dtype"),
                F.col("_n").alias("n"),
                (F.col("_n") - F.col(f"_nn_{c}")).alias("n_null"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                (
                    F.col(f"_mn_{c}") if is_num else F.lit(None).cast("double")
                ).alias("min_value"),
                (
                    F.col(f"_mx_{c}") if is_num else F.lit(None).cast("double")
                ).alias("max_value"),
            )
        )
    return wide.select(F.explode(F.array(*structs)).alias("r")).select(
        "r.column", "r.dtype", "r.n", "r.n_null", "r.n_distinct",
        "r.min_value", "r.max_value",
    )
