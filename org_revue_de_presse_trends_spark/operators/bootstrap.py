"""Deterministic Poisson bootstrap — confidence intervals for corpus
statistics in one distributed pass.

The Poisson bootstrap (Chamandy et al. 2012, "Estimating uncertainty
for massive data streams", Google TR; Hanley & MacGibbon 2006) is THE
resampling scheme for data too large to index: instead of drawing n
rows with replacement (which needs global n and random access), each
row independently receives a Poisson(1) replication weight per
resample — so B resamples are one streaming pass with a ×B fan,
map-side combinable to B partial rows, no shuffle of the data itself.

Determinism discipline: the per-(row, resample) uniform is the
md5-prefix coin ``(h48(b||'|'||id) + 0.5) / 2**48`` — NOT the Knuth
multiplicative coin in operators/splits.py, whose (id+seed) argument
collapses resample b of row i and resample b+1 of row i−1 into the
SAME weight (shift-correlated resamples would make every bootstrap
mean nearly identical and the CI collapse).  The weight is an
inverse-CDF CASE ladder over HARD-CODED 12-digit cumulative-Poisson
literals (no libm exp cross-engine), capped at 8 (tail mass < 2e-6);
values are rounded to scaled longs before the weighted sums, so each
resample mean is exact-integer arithmetic plus one pinned IEEE
division — value-identical in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: cumulative Poisson(1) probabilities P(X <= k), k = 0..7, rounded to
#: 12 digits and FROZEN as literals (both engines compare the same
#: decimal constants; the true values' 13th digit cannot matter)
POISSON1_CDF = (
    0.367879441171,
    0.735758882343,
    0.919698602929,
    0.981011843124,
    0.996340153173,
    0.999405815182,
    0.999916758851,
    0.999989750803,
)
#: replication weight when u falls beyond the last threshold
W_CAP = len(POISSON1_CDF)


def bootstrap_coin(id_col: Column, b_col: Column) -> Column:
    """Uniform double in (0,1) from (row id, resample index): base-16
    value of the first 12 md5 hex chars of ``"<b>|<id>"`` (the
    cms_bucket discipline — a fresh, well-mixed coin per resample)."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    b_col.cast("string"), F.lit("|"), id_col.cast("string")
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    return (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 48))


def poisson_weight(u: Column) -> Column:
    """Inverse-CDF Poisson(1) weight from a uniform coin."""
    w = F.lit(W_CAP)
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    return w.cast("int")


def poisson_bootstrap_means(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_resamples: int = 64,
    scale: int = 10**6,
) -> DataFrame:
    """Per-resample weighted means → (b INT, n_eff BIGINT,
    mean_value DOUBLE), one row per resample.

    One pass: each row fans to ``n_resamples`` (map-side partial
    aggregation collapses the fan before any exchange — the shuffle
    carries B rows per task, never B×n), values as scaled longs so
    the weighted sums are exact integers; the mean is one pinned
    division chain rounded to 9 dp.

    Exactness budget: ``W_CAP · |value| · scale · n`` must stay under
    2**63 for the integer sum and each term under 2**53 for the
    double rounding — lower ``scale`` for huge or wide-valued data."""
    if n_resamples < 1:
        raise ValueError(f"n_resamples must be >= 1, got {n_resamples}")
    fan = df.select(
        F.col(id_col).alias("_id"),
        F.round(F.col(value_col).cast("double") * F.lit(float(scale)), 0)
        .cast("long")
        .alias("_v"),
        F.explode(F.sequence(F.lit(0), F.lit(n_resamples - 1))).alias("b"),
    )
    u = bootstrap_coin(F.col("_id"), F.col("b"))
    weighted = fan.select(
        "b", "_v", poisson_weight(u).cast("long").alias("_w")
    )
    agg = weighted.groupBy("b").agg(
        F.sum("_w").alias("n_eff"),
        F.sum(F.col("_w") * F.col("_v")).alias("_swv"),
    )
    return agg.select(
        F.col("b").cast("int").alias("b"),
        "n_eff",
        # a zero-weight resample (P = e^-n, real only for tiny inputs)
        # must yield NULL, not the engine-divergent 0/0 NaN
        F.when(
            F.col("n_eff") > 0,
            F.round(
                F.col("_swv").cast("double")
                / F.col("n_eff").cast("double")
                / F.lit(float(scale)),
                9,
            ),
        ).alias("mean_value"),
    )


def bootstrap_ci(
    means: DataFrame, alpha: float = 0.05
) -> DataFrame:
    """Percentile-method CI over the resample means → one row
    (n_resamples BIGINT, mean_lo DOUBLE, mean_hi DOUBLE).  Exact
    interpolated percentiles — Spark ``percentile()`` and DuckDB
    ``quantile_cont`` interpolate identically (proved by
    q:value_percentiles_exact)."""
    lo, hi = alpha / 2.0, 1.0 - alpha / 2.0
    return means.agg(
        F.count(F.lit(1)).cast("long").alias("n_resamples"),
        F.round(F.expr(f"percentile(mean_value, {lo!r})"), 9).alias(
            "mean_lo"
        ),
        F.round(F.expr(f"percentile(mean_value, {hi!r})"), 9).alias(
            "mean_hi"
        ),
    )
