"""Classifier-evaluation queries (operators/evalmetrics.py) — past the
driver's 50-slot window on purpose; the in-repo contract gate
oracle-checks them at sf0.01.

The eval layer of a quality-classifier curation loop: score docs with
a cheap model, then read keep/drop thresholds off exact AUC /
calibration / threshold-sweep tables, and sanity-check weak labelers
against each other with kappa.  The fixture stand-in: does an event's
``value`` discriminate purchases from clicks (events table), and how
far do two weak document-quality rules agree (documents table)?
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.evalmetrics import (
    auc,
    calibration_bins,
    cohens_kappa,
    confusion_at_thresholds,
)
from .registry import query

#: threshold sweep for the confusion query — raw value units
_THRESHOLDS = (50.0, 150.0, 300.0)

#: DuckDB mirror of the purchase-vs-click eval population
_BASE = """
    SELECT CAST(value AS DOUBLE) AS s,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
    FROM events
    WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
      AND isfinite(value)
"""


def _eval_population(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type").isin("click", "purchase"))


def _finite_value(ev: DataFrame):
    """NULL/NaN/Inf values carry no band: drop them before the
    floor→long cast (ANSI CAST_OVERFLOW on NaN; mirrors the oracles'
    ``isfinite(value)``)."""
    v = F.col("value").cast("double")
    return (
        v.isNotNull() & ~F.isnan(v) & (F.abs(v) != F.lit(float("inf")))
    )


@query(
    "event_value_auc",
    f"""
    WITH base AS ({_BASE}),
    g AS (
        SELECT CAST(ROUND(s * 100.0) AS BIGINT) AS sq,
               CAST(SUM(y) AS BIGINT) AS p,
               CAST(SUM(1 - y) AS BIGINT) AS q
        FROM base GROUP BY 1
    ),
    c AS (
        SELECT p, q,
               CAST(COALESCE(SUM(q) OVER (ORDER BY sq
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS qlt
        FROM g
    ),
    agg AS (
        SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
               CAST(SUM(q) AS BIGINT) AS n_neg,
               SUM(CAST(p AS HUGEINT) * CAST(qlt AS HUGEINT) * 2
                   + CAST(p AS HUGEINT) * CAST(q AS HUGEINT)) AS u2
        FROM c
    )
    SELECT n_pos, n_neg,
           CASE WHEN n_pos > 0 AND n_neg > 0 THEN
               ROUND(CAST(u2 AS DOUBLE)
                     / (2.0 * CAST(n_pos AS DOUBLE)
                        * CAST(n_neg AS DOUBLE)), 9)
           END AS auc
    FROM agg
    """,
)
def event_value_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-corrected rank AUC of event value as a
    purchase-vs-click classifier score (operators/evalmetrics.auc,
    Mann-Whitney U over distinct quantized scores).  2U accumulates in
    exact decimal/HUGEINT; AUC is one pinned IEEE division — value-
    exact in DuckDB."""
    base = _eval_population(spark, sf_dir)
    return auc(base, "value", F.col("event_type") == "purchase", scale=100)


@query(
    "event_value_calibration",
    f"""
    WITH base AS ({_BASE}),
    g AS (
        SELECT CAST(FLOOR(s / 50.0) AS BIGINT) AS bin_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               SUM(CAST(CAST(ROUND(s * 100.0) AS BIGINT) AS HUGEINT))
                   AS ssum
        FROM base GROUP BY 1
    )
    SELECT bin_id, n, n_pos,
           ROUND(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 9)
               AS pos_rate,
           ROUND(CAST(ssum AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 9)
               AS mean_score
    FROM g
    """,
)
def event_value_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the same score: per 50-unit value bin,
    observed purchase rate vs mean value
    (operators/evalmetrics.calibration_bins — exact counts, scaled-long
    score sums, two pinned divisions)."""
    base = _eval_population(spark, sf_dir)
    return calibration_bins(
        base, "value", F.col("event_type") == "purchase", 50.0, scale=100
    )


def _threshold_oracle() -> str:
    aggs, rows = [], []
    for i, t in enumerate(_THRESHOLDS):
        lit = repr(float(t))
        aggs += [
            f"CAST(SUM(CASE WHEN s >= {lit} AND y = 1 THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS tp{i}",
            f"CAST(SUM(CASE WHEN s >= {lit} AND y = 0 THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS fp{i}",
            f"CAST(SUM(CASE WHEN s < {lit} AND y = 1 THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS fn{i}",
            f"CAST(SUM(CASE WHEN s < {lit} AND y = 0 THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS tn{i}",
        ]
        rows.append(
            f"SELECT CAST({lit} AS DOUBLE) AS threshold, tp{i} AS tp,"
            f" fp{i} AS fp, fn{i} AS fn, tn{i} AS tn FROM w"
        )
    stacked = " UNION ALL ".join(rows)
    return f"""
    WITH base AS ({_BASE}),
    w AS (SELECT {', '.join(aggs)} FROM base),
    r AS ({stacked})
    SELECT threshold, tp, fp, fn, tn,
           CASE WHEN tp + fp > 0 THEN
               ROUND(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 9)
           END AS precision,
           CASE WHEN tp + fn > 0 THEN
               ROUND(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 9)
           END AS recall,
           CASE WHEN 2 * tp + fp + fn > 0 THEN
               ROUND((2.0 * CAST(tp AS DOUBLE))
                     / CAST(2 * tp + fp + fn AS DOUBLE), 9)
           END AS f1
    FROM r
    """


@query("event_value_threshold_metrics", _threshold_oracle())
def event_value_threshold_metrics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Threshold sweep over the same score: TP/FP/FN/TN +
    precision/recall/F1 at three literal cut points in ONE scan
    (operators/evalmetrics.confusion_at_thresholds — conditional
    aggregation, no row multiplication; F1 straight from counts)."""
    base = _eval_population(spark, sf_dir)
    return confusion_at_thresholds(
        base, "value", F.col("event_type") == "purchase", _THRESHOLDS
    )


@query(
    "doc_rule_agreement_kappa",
    """
    WITH base AS (
        SELECT CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS a,
               CASE WHEN length(text) - length(replace(text, ' ', ''))
                    >= 45 THEN 1 ELSE 0 END AS b
        FROM documents
        WHERE text IS NOT NULL AND n_chars IS NOT NULL
    ),
    g AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n11,
               CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n10,
               CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n01,
               CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n00
        FROM base
    )
    SELECT n, n11, n10, n01, n00,
           CASE WHEN n > 0 THEN
               ROUND(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE), 9)
           END AS po,
           CASE WHEN n > 0 THEN
               ROUND(CAST(CAST(n11 + n10 AS HUGEINT)
                          * CAST(n11 + n01 AS HUGEINT)
                          + CAST(n01 + n00 AS HUGEINT)
                          * CAST(n10 + n00 AS HUGEINT) AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 9)
           END AS pe,
           CASE WHEN CAST(n AS HUGEINT) * CAST(n AS HUGEINT)
                     - (CAST(n11 + n10 AS HUGEINT)
                        * CAST(n11 + n01 AS HUGEINT)
                        + CAST(n01 + n00 AS HUGEINT)
                        * CAST(n10 + n00 AS HUGEINT)) <> 0 THEN
               ROUND(CAST(CAST(n AS HUGEINT) * CAST(n11 + n00 AS HUGEINT)
                          - (CAST(n11 + n10 AS HUGEINT)
                             * CAST(n11 + n01 AS HUGEINT)
                             + CAST(n01 + n00 AS HUGEINT)
                             * CAST(n10 + n00 AS HUGEINT)) AS DOUBLE)
                     / CAST(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)
                            - (CAST(n11 + n10 AS HUGEINT)
                               * CAST(n11 + n01 AS HUGEINT)
                               + CAST(n01 + n00 AS HUGEINT)
                               * CAST(n10 + n00 AS HUGEINT)) AS DOUBLE),
                     9)
           END AS kappa
    FROM g
    """,
)
def doc_rule_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two weak document-quality raters
    (n_chars >= 250 vs space-count >= 45 — all four confusion cells
    populated at every fixture SF; operators/evalmetrics.cohens_kappa).
    kappa is the single division of exact decimal/HUGEINT terms."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    )
    spaces = F.length("text") - F.length(
        F.regexp_replace(F.col("text"), " ", "")
    )
    return cohens_kappa(docs, F.col("n_chars") >= 250, spaces >= 45)


@query(
    "qty_price_spearman",
    """
    WITH base AS (
        SELECT CAST(ROUND(CAST(l_quantity AS DOUBLE) * 100.0)
                    AS BIGINT) AS qx,
               CAST(ROUND(CAST(l_extendedprice AS DOUBLE) * 1.0)
                    AS BIGINT) AS qy
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND isfinite(l_quantity)
          AND l_extendedprice IS NOT NULL AND isfinite(l_extendedprice)
    ),
    gx AS (SELECT qx, COUNT(*) AS c FROM base GROUP BY 1),
    rx AS (
        SELECT qx,
               CAST(2 * COALESCE(SUM(c) OVER (ORDER BY qx
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) + c + 1 AS BIGINT) AS qxr
        FROM gx
    ),
    gy AS (SELECT qy, COUNT(*) AS c FROM base GROUP BY 1),
    ry AS (
        SELECT qy,
               CAST(2 * COALESCE(SUM(c) OVER (ORDER BY qy
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) + c + 1 AS BIGINT) AS qyr
        FROM gy
    ),
    j AS (
        SELECT qxr, qyr FROM base
        JOIN rx USING (qx) JOIN ry USING (qy)
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(qxr AS HUGEINT)) AS sx,
               SUM(CAST(qyr AS HUGEINT)) AS sy,
               SUM(CAST(qxr AS HUGEINT) * CAST(qyr AS HUGEINT)) AS sxy,
               SUM(CAST(qxr AS HUGEINT) * CAST(qxr AS HUGEINT)) AS sxx,
               SUM(CAST(qyr AS HUGEINT) * CAST(qyr AS HUGEINT)) AS syy
        FROM j
    )
    SELECT n,
           CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                 AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
           THEN ROUND(
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
               9)
           END AS rho
    FROM s
    """,
)
def qty_price_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Spearman rank correlation between lineitem quantity and
    extended price (operators/evalmetrics.spearman) — the scale-free
    monotonic companion to qty_price_correlation's Pearson.
    Tie-averaged ranks as 2x-scaled exact integers from distinct-value
    counts; rho is one pinned IEEE tree (correctly-rounded sqrt) over
    decimal-exact moment sums.  Price quantizes at scale 1 so the rank
    table stays bounded (the documented knob)."""
    li = load_table(spark, sf_dir, "lineitem")
    from ..operators.evalmetrics import spearman

    return spearman(
        li, "l_quantity", "l_extendedprice", scale_x=100, scale_y=1
    )


@query(
    "event_type_value_mi",
    """
    WITH base AS (
        SELECT event_type AS a,
               CAST(FLOOR(CAST(value AS DOUBLE) / 50.0) AS BIGINT) AS b
        FROM events
        WHERE event_type IS NOT NULL AND value IS NOT NULL
          AND isfinite(value)
    ),
    cells AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cab
        FROM base GROUP BY 1, 2
    ),
    staged AS (
        SELECT cab,
               CAST(SUM(cab) OVER (PARTITION BY a) AS BIGINT) AS ca,
               CAST(SUM(cab) OVER (PARTITION BY b) AS BIGINT) AS cb,
               CAST(SUM(cab) OVER () AS BIGINT) AS n,
               CAST(COUNT(*) OVER () AS BIGINT) AS ncells
        FROM cells
    ),
    t AS (
        SELECT n, ncells,
               CAST(ROUND((CAST(cab AS DOUBLE) / CAST(n AS DOUBLE))
                    * ln(CAST(CAST(n AS HUGEINT) * CAST(cab AS HUGEINT)
                              AS DOUBLE)
                         / CAST(CAST(ca AS HUGEINT) * CAST(cb AS HUGEINT)
                                AS DOUBLE))
                    * 1000000.0) AS BIGINT) AS term
        FROM staged
    )
    SELECT n, ncells AS n_cells,
           ROUND(CAST(SUM(term) AS DOUBLE) / 1000000.0, 6) AS mi
    FROM t GROUP BY 1, 2
    """,
)
def event_type_value_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and the 50-unit value
    band (operators/evalmetrics.mutual_information) — the
    feature-relevance / label-leakage screen.  Contingency counts are
    exact longs over <= |types|x|bands| cells; each cell term rounds
    to a 1e-6-scaled long before the exact sum (the psi ln
    discipline)."""
    ev = load_table(spark, sf_dir, "events")
    from ..operators.evalmetrics import mutual_information

    base = ev.filter(_finite_value(ev)).select(
        "event_type",
        F.floor(F.col("value").cast("double") / F.lit(50.0))
        .cast("long")
        .alias("value_band"),
    )
    return mutual_information(base, "event_type", "value_band")


@query(
    "event_type_value_chi2",
    """
    WITH base AS (
        SELECT event_type AS a,
               CAST(FLOOR(CAST(value AS DOUBLE) / 50.0) AS BIGINT) AS b
        FROM events
        WHERE event_type IS NOT NULL AND value IS NOT NULL
          AND isfinite(value)
    ),
    cells AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS o
        FROM base GROUP BY 1, 2
    ),
    staged AS (
        SELECT a, b, o,
               CAST(SUM(o) OVER (PARTITION BY a) AS BIGINT) AS ca,
               CAST(SUM(o) OVER (PARTITION BY b) AS BIGINT) AS cb,
               CAST(SUM(o) OVER () AS BIGINT) AS nn
        FROM cells
    ),
    t AS (
        SELECT o, a, b,
               CAST(ROUND(
                   CAST(CAST(o AS HUGEINT) * CAST(o AS HUGEINT)
                        * CAST(nn AS HUGEINT) AS DOUBLE)
                   / CAST(CAST(ca AS HUGEINT) * CAST(cb AS HUGEINT)
                          AS DOUBLE)
                   * 1000000.0) AS HUGEINT) AS term
        FROM staged
    ),
    agg AS (
        SELECT CAST(SUM(o) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT a) AS BIGINT) AS ka,
               CAST(COUNT(DISTINCT b) AS BIGINT) AS kb,
               SUM(term) AS ts
        FROM t
    )
    SELECT n,
           CAST((ka - 1) * (kb - 1) AS BIGINT) AS dof,
           CASE WHEN n > 0 AND (ka - 1) * (kb - 1) > 0 THEN
               ROUND(CAST(ts AS DOUBLE) / 1000000.0
                     - CAST(n AS DOUBLE), 6)
           END AS chi2,
           CASE WHEN n > 0 AND (ka - 1) * (kb - 1) > 0 THEN
               ROUND(sqrt(
                   greatest(CASE WHEN n > 0
                                  AND (ka - 1) * (kb - 1) > 0 THEN
                       ROUND(CAST(ts AS DOUBLE) / 1000000.0
                             - CAST(n AS DOUBLE), 6)
                   END, 0.0)
                   / (CAST(n AS DOUBLE)
                      * CAST(CAST(least(ka - 1, kb - 1) AS BIGINT)
                             AS DOUBLE))), 9)
           END AS cramers_v
    FROM agg
    """,
)
def event_type_value_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence test + Cramér's V between event type
    and the 50-unit value band (operators/evalmetrics.
    chi2_independence) — the count-based companion to
    event_type_value_mi on the same contingency table.  Observed cells
    only (the algebraic −n absorbs zero cells); per-cell terms as
    1e-6-scaled longs; chi2 and V one pinned tree each."""
    ev = load_table(spark, sf_dir, "events")
    from ..operators.evalmetrics import chi2_independence

    base = ev.filter(_finite_value(ev)).select(
        "event_type",
        F.floor(F.col("value").cast("double") / F.lit(50.0))
        .cast("long")
        .alias("value_band"),
    )
    return chi2_independence(base, "event_type", "value_band")


@query(
    "doc_length_lang_auc_by_source",
    """
    WITH base AS (
        SELECT source,
               CAST(ROUND(CAST(n_chars AS DOUBLE) * 1.0) AS BIGINT)
                   AS sq,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents
        WHERE n_chars IS NOT NULL AND isfinite(CAST(n_chars AS DOUBLE))
          AND lang IS NOT NULL AND source IS NOT NULL
    ),
    g AS (
        SELECT source, sq,
               CAST(SUM(y) AS BIGINT) AS p,
               CAST(SUM(1 - y) AS BIGINT) AS q
        FROM base GROUP BY 1, 2
    ),
    c AS (
        SELECT source, p, q,
               CAST(COALESCE(SUM(q) OVER (PARTITION BY source
                   ORDER BY sq ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS qlt
        FROM g
    ),
    agg AS (
        SELECT source,
               CAST(SUM(p) AS BIGINT) AS n_pos,
               CAST(SUM(q) AS BIGINT) AS n_neg,
               SUM(CAST(p AS HUGEINT) * CAST(qlt AS HUGEINT) * 2
                   + CAST(p AS HUGEINT) * CAST(q AS HUGEINT)) AS u2
        FROM c GROUP BY 1
    )
    SELECT source, n_pos, n_neg,
           CASE WHEN n_pos > 0 AND n_neg > 0 THEN
               ROUND(CAST(u2 AS DOUBLE)
                     / (2.0 * CAST(n_pos AS DOUBLE)
                        * CAST(n_neg AS DOUBLE)), 9)
           END AS auc
    FROM agg
    """,
)
def doc_length_lang_auc_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source AUC of document length as an is-English classifier —
    the grouped (per-domain) form of the eval layer: the running-sum
    window is PARTITIONED by source, so the plan has no
    single-partition stage at any corpus size (operators/
    evalmetrics.auc with group_cols)."""
    from ..operators.evalmetrics import auc

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull() & F.col("source").isNotNull()
    )
    return auc(
        docs, "n_chars", F.col("lang") == "en", scale=1,
        group_cols=("source",),
    )
