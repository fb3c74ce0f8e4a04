"""Grouped-map operators: the applyInPandas escape hatch and its JVM
window-expression twin.

``applyInPandas`` ships whole groups into Python as Arrow batches —
the right tool when per-group logic genuinely needs numpy/pandas
(model scoring, curve fitting).  For anything expressible as window
aggregates the JVM path wins by an order of magnitude, so both are
provided and equivalence-tested (tests/test_udf_escape.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zscore_jvm(
    df: DataFrame, group_col: str = "user_id", value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-group z-score via two window passes over ONE shuffle (the
    second Window reuses the first's partitioning).  Mean and variance
    go through exact decimal sums so the result is engine-deterministic
    (population variance, ddof=0)."""
    w = Window.partitionBy(group_col)
    n = F.count(F.lit(1)).over(w).cast("double")
    mean = (
        F.sum(F.expr(f"CAST({value_col} AS DECIMAL(18,6))")).over(w)
        .cast("double")
        / n
    )
    step1 = df.select(
        id_col, group_col, value_col,
        mean.alias("_mean"), n.alias("_n"),
    )
    dev = F.col(value_col) - F.col("_mean")
    var = (
        F.sum((dev * dev).cast("decimal(24,6)")).over(w).cast("double")
        / F.col("_n")
    )
    return (
        step1.select(
            id_col, group_col,
            (dev / F.sqrt(var)).alias("z"),
            var.alias("_var"),
        )
        .filter(F.col("_var") > 0)
        .drop("_var")
    )


def zscore_apply_in_pandas(
    df: DataFrame, group_col: str = "user_id", value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Same computation through the grouped-map Arrow path."""

    def fn(pdf):
        import pandas as pd

        m = pdf[value_col].astype(float).mean()
        v = pdf[value_col].astype(float).var(ddof=0)
        if v <= 0:
            return pd.DataFrame(
                {id_col: [], group_col: [], "z": []}
            )
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                group_col: pdf[group_col],
                "z": (pdf[value_col].astype(float) - m) / (v**0.5),
            }
        )

    return df.groupBy(group_col).applyInPandas(
        fn, schema=f"{id_col} long, {group_col} long, z double"
    )
