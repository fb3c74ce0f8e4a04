"""Corpus-statistics queries (round 5, cont.): distributional health
checks a training-data pipeline runs before committing a mixture —
Zipf-law fit per source (token frequency decay exponent) and the
vocabulary coverage curve (token mass captured by a top-k vocabulary,
the tokenizer-truncation/OOV analysis).

Registered after analytics_tpch — past the driver's 50-slot window;
the in-repo contract test is the oracle gate.

Cross-engine discipline (CLAUDE.md): ln() terms rounded to 6dp and
scaled to longs BEFORE any sum; regression sums decimal-exact with the
final slope arithmetic written textually identically in IEEE doubles;
rank windows carry total orders (count DESC, token ASC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

# ---------------------------------------------------------------------------
# Zipf slope per source
# ---------------------------------------------------------------------------

#: scaled-long regression inputs over the ranked frequency table:
#: x = ln(rank), y = ln(count), both rounded to 6dp and scaled so the
#: per-source sums are exact integer (decimal) sums.  The common 1e6
#: scale cancels in the slope.
_ZX = "CAST(ROUND(LN(CAST(r AS DOUBLE)) * 1000000, 0) AS BIGINT)"
_ZY = "CAST(ROUND(LN(CAST(c AS DOUBLE)) * 1000000, 0) AS BIGINT)"

#: least-squares slope from the exact sums, computed in doubles at the
#: END (each decimal→double cast and IEEE op is identical in both
#: engines; exactness until this point makes the 6dp round stable)
_SLOPE = (
    "CAST(ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS DOUBLE)"
)


@query(
    "source_zipf_slope",
    f"""
    WITH tc AS (
        SELECT source, tok, COUNT(*) AS c
        FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY source, tok
    ),
    ranked AS (
        SELECT source, c,
               row_number() OVER (
                   PARTITION BY source ORDER BY c DESC, tok ASC
               ) AS r
        FROM tc
    ),
    xy AS (
        SELECT source, {_ZX} AS x, {_ZY} AS y FROM ranked
    ),
    sums AS (
        SELECT source, COUNT(*) AS n,
               SUM(CAST(x AS DECIMAL(18,0))) AS sx,
               SUM(CAST(y AS DECIMAL(18,0))) AS sy,
               SUM(CAST(x AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0)))
                   AS sxy,
               SUM(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0)))
                   AS sxx
        FROM xy GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n_terms, {_SLOPE} AS zipf_slope
    FROM sums
    """,
)
def source_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law exponent per source: least-squares slope of
    ln(count) vs ln(rank) over the source's token frequency table.
    Natural text sits near −1; a slope far off flags templated or
    synthetic sources before they enter a mixture.  Two hash
    aggregates + one per-source rank window; the regression reduces
    to five exact sums, so no per-source collect and no float
    accumulation-order sensitivity."""
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("source").orderBy(
        F.col("c").desc(), F.col("tok").asc()
    )
    ranked = tc.withColumn("r", F.row_number().over(w))
    xy = ranked.select(
        "source", F.expr(_ZX).alias("x"), F.expr(_ZY).alias("y")
    )
    sums = xy.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(x AS DECIMAL(18,0))")).alias("sx"),
        F.sum(F.expr("CAST(y AS DECIMAL(18,0))")).alias("sy"),
        F.sum(
            F.expr("CAST(x AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0))")
        ).alias("sxy"),
        F.sum(
            F.expr("CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0))")
        ).alias("sxx"),
    )
    return sums.select(
        "source",
        F.col("n").cast("long").alias("n_terms"),
        F.expr(_SLOPE).alias("zipf_slope"),
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage curve
# ---------------------------------------------------------------------------

@query(
    "vocab_coverage_curve",
    """
    WITH tc AS (
        SELECT tok, COUNT(*) AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY tok
    ),
    ranked AS (
        SELECT tok, c,
               row_number() OVER (ORDER BY c DESC, tok ASC) AS r
        FROM tc
    )
    SELECT r AS vocab_size, tok, CAST(c AS BIGINT) AS tok_count,
           CAST(SUM(c) OVER (
               ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW
           ) AS DOUBLE) / CAST(SUM(c) OVER () AS DOUBLE) AS coverage
    FROM ranked
    """,
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mass coverage of a top-k vocabulary, for every k up to the
    corpus vocabulary size: row r is the fraction of all token
    occurrences captured if the vocabulary were truncated at the r
    most frequent tokens — the tokenizer-truncation / OOV-rate curve.
    The rank is a total order (count DESC, token ASC) so the running
    sum has an explicit ROWS frame and exact integer arithmetic until
    the final division (CLAUDE.md windowed-sum discipline).  The
    unpartitioned windows run over the aggregated VOCABULARY (bounded
    by distinct-token count, ≪ corpus size — the heavy corpus-wide
    work is the map-side-combined token count before them)."""
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wr = Window.orderBy(F.col("c").desc(), F.col("tok").asc())
    ranked = tc.withColumn("r", F.row_number().over(wr))
    wcum = (
        Window.orderBy("r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy()
    return ranked.select(
        F.col("r").cast("long").alias("vocab_size"),
        "tok",
        F.col("c").cast("long").alias("tok_count"),
        (
            F.sum("c").over(wcum).cast("double")
            / F.sum("c").over(wall).cast("double")
        ).alias("coverage"),
    )
