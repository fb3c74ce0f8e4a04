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
from ..functions import text as T
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


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence between source token distributions
# ---------------------------------------------------------------------------

#: per-common-token JS term, p = ca/na and q = cb/nb written out so
#: both engines evaluate the identical double expression, rounded to
#: 6dp and scaled to a long before the per-pair sum:
#: 0.5·p·ln(2p/(p+q)) + 0.5·q·ln(2q/(p+q))
_JS_COMMON = (
    "CAST(ROUND(("
    "0.5 * (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))"
    " * LN(2.0 * (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))"
    " / (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)"
    " + CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)))"
    " + 0.5 * (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))"
    " * LN(2.0 * (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))"
    " / (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)"
    " + CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)))"
    ") * 1000000, 0) AS BIGINT)"
)

#: disjoint-mass closure: a token present only in one side contributes
#: 0.5·ln2·p (summing to 0.5·ln2·(1 − common mass) per side), so the
#: whole divergence needs ONLY the inner join on tokens — the exact
#: integer common-mass sums close the formula without an outer join
_JS_DISJOINT = (
    "CAST(ROUND(0.5 * LN(2.0)"
    " * (1.0 - CAST(cca AS DOUBLE) / CAST(na AS DOUBLE)) * 1000000, 0)"
    " AS BIGINT)"
    " + CAST(ROUND(0.5 * LN(2.0)"
    " * (1.0 - CAST(ccb AS DOUBLE) / CAST(nb AS DOUBLE)) * 1000000, 0)"
    " AS BIGINT)"
)


@query(
    "source_js_divergence",
    f"""
    WITH tc AS (
        SELECT source, tok, COUNT(*) AS c
        FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY source, tok
    ),
    tn AS (
        SELECT source, tok, c,
               SUM(c) OVER (PARTITION BY source) AS n
        FROM tc
    ),
    common AS (
        SELECT a.source AS source_a, b.source AS source_b,
               a.c AS ca, b.c AS cb, a.n AS na, b.n AS nb
        FROM tn a JOIN tn b
          ON a.tok = b.tok AND a.source < b.source
    ),
    sums AS (
        SELECT source_a, source_b,
               COUNT(*) AS n_common,
               MAX(na) AS na, MAX(nb) AS nb,
               CAST(SUM(ca) AS BIGINT) AS cca,
               CAST(SUM(cb) AS BIGINT) AS ccb,
               CAST(SUM({_JS_COMMON}) AS BIGINT) AS s_common
        FROM common
        GROUP BY source_a, source_b
    )
    SELECT source_a, source_b, n_common,
           CAST(ROUND((CAST(s_common + {_JS_DISJOINT} AS DOUBLE))
                      / 1000000.0, 6) AS DOUBLE) AS js_divergence
    FROM sums
    """,
)
def source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between every pair of source unigram
    distributions — the mass-weighted complement to the set-based
    q:source_ngram_overlap matrix, used to pick mixture temperatures
    for distributionally distant domains.

    Only COMMON tokens ever join: a token present in one side only
    contributes 0.5·ln2·p, so the disjoint mass closes from the exact
    integer common-count sums (no outer join, no per-pair vocabulary
    materialization).  Corollary: a source pair with FULLY disjoint
    vocabularies emits no row — absence means the maximal distance
    ln 2, exactly as a non-colliding pair means similarity 0 in the
    LSH family.  Per-token terms are 6dp-scaled longs before the
    per-pair sum (ln() ulp discipline); output rows are bounded at
    |sources|²/2."""
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tn = tc.withColumn(
        "n", F.sum("c").over(Window.partitionBy("source"))
    )
    a, b = tn.alias("a"), tn.alias("b")
    common = a.join(
        b,
        (F.col("a.tok") == F.col("b.tok"))
        & (F.col("a.source") < F.col("b.source")),
    ).select(
        F.col("a.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
        F.col("a.c").alias("ca"),
        F.col("b.c").alias("cb"),
        F.col("a.n").alias("na"),
        F.col("b.n").alias("nb"),
    )
    sums = common.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_common"),
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.sum("ca").cast("long").alias("cca"),
        F.sum("cb").cast("long").alias("ccb"),
        F.sum(F.expr(_JS_COMMON)).cast("long").alias("s_common"),
    )
    return sums.select(
        "source_a",
        "source_b",
        "n_common",
        F.expr(
            f"CAST(ROUND((CAST(s_common + {_JS_DISJOINT} AS DOUBLE))"
            " / 1000000.0, 6) AS DOUBLE)"
        ).alias("js_divergence"),
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity buckets (head / middle / tail per source)
# ---------------------------------------------------------------------------

@query(
    "doc_perplexity_buckets",
    """
    WITH toks AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n_total FROM toks),
    lm AS (
        SELECT tok,
               CAST(ROUND(
                   -ln(CAST(COUNT(*) AS DOUBLE)
                       / (SELECT n_total FROM tot)) * 1000000.0
               ) AS BIGINT) AS s_scaled
        FROM toks GROUP BY tok
    ),
    per_doc AS (
        SELECT t.doc_id, t.source,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(lm.s_scaled) AS BIGINT) AS sum_scaled
        FROM toks t JOIN lm ON lm.tok = t.tok
        GROUP BY t.doc_id, t.source
    )
    SELECT doc_id, source, n_tokens,
           CAST(ROUND(CAST(sum_scaled AS DOUBLE) / n_tokens / 1000000.0,
                      6) AS DOUBLE) AS mean_surprisal,
           CAST(ntile(3) OVER (
               PARTITION BY source
               ORDER BY CAST(sum_scaled AS DOUBLE)
                            / CAST(n_tokens AS DOUBLE) ASC,
                        doc_id ASC
           ) AS BIGINT) AS ppl_bucket
    FROM per_doc
    """,
)
def doc_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail split (Wenzek et al. 2020 §4.3): rank
    every document by its perplexity proxy (mean unigram surprisal,
    the q:doc_unigram_surprisal signal) WITHIN its source and cut into
    terciles — bucket 1 = most-fluent head, 3 = tail.  Real pipelines
    keep head+middle or reweight by bucket.

    The ntile order is a total order (exact-rational mean computed
    identically in both engines, doc_id tiebreak), so bucket
    assignment is cross-engine deterministic.  Shape: the surprisal
    LM broadcast + one per-doc aggregate, then a per-source window
    over DOC-level rows (corpus-scale rows never enter a window)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    tot = toks.agg(F.count(F.lit(1)).alias("n_total"))
    lm = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(tot))
        .select(
            "tok",
            F.expr(
                "CAST(ROUND(-LN(CAST(c AS DOUBLE)"
                " / CAST(n_total AS DOUBLE)) * 1000000.0, 0) AS BIGINT)"
            ).alias("s_scaled"),
        )
    )
    per_doc = (
        toks.join(F.broadcast(lm), "tok")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("s_scaled").cast("long").alias("sum_scaled"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        (
            F.col("sum_scaled").cast("double")
            / F.col("n_tokens").cast("double")
        ).asc(),
        F.col("doc_id").asc(),
    )
    return per_doc.select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr(
            "CAST(ROUND(CAST(sum_scaled AS DOUBLE) / n_tokens"
            " / 1000000.0, 6) AS DOUBLE)"
        ).alias("mean_surprisal"),
        F.ntile(3).over(w).cast("long").alias("ppl_bucket"),
    )


# ---------------------------------------------------------------------------
# Per-source data card (the datasheet summary)
# ---------------------------------------------------------------------------

#: DuckDB per-doc gopher-pass flag (mirrors q:doc_gopher_rules)
_GOPHER_PASS_SQL = """
    SELECT doc_id, source,
           (n_words BETWEEN 20 AND 1000)
             AND wchars >= 3 * n_words AND wchars <= 10 * n_words
             AND stop_cnt >= 2
             AND alpha_cnt * 5 >= n_words * 4
             AND stop_cnt * 10 <= n_words * 3 AS pass_gopher
    FROM (
        SELECT doc_id, source,
               len(string_split(text, ' ')) AS n_words,
               length(text) - (len(string_split(text, ' ')) - 1) AS wchars,
               len(list_filter(string_split(text, ' '),
                   x -> x IN ('the','a','of','and','to'))) AS stop_cnt,
               len(list_filter(string_split(text, ' '),
                   x -> regexp_full_match(x, '[A-Za-z]+'))) AS alpha_cnt
        FROM documents
    )
"""


@query(
    "source_data_card",
    f"""
    WITH toks AS (
        SELECT source, doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ),
    tstats AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(DISTINCT tok) AS BIGINT) AS vocab_size
        FROM toks GROUP BY source
    ),
    gp AS ({_GOPHER_PASS_SQL}),
    dstats AS (
        SELECT d.source,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN gp.pass_gopher THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_gopher_pass,
               CAST(COUNT(DISTINCT md5(lower(trim(d.text))))
                    AS BIGINT) AS n_distinct_texts
        FROM documents d JOIN gp USING (doc_id)
        GROUP BY d.source
    )
    SELECT d.source, d.n_docs, t.n_tokens, t.vocab_size,
           CAST(ROUND(CAST(t.n_tokens AS DOUBLE)
                      / CAST(d.n_docs AS DOUBLE), 6) AS DOUBLE)
               AS mean_doc_tokens,
           CAST(ROUND(CAST(d.n_gopher_pass AS DOUBLE)
                      / CAST(d.n_docs AS DOUBLE), 6) AS DOUBLE)
               AS gopher_pass_rate,
           CAST(ROUND(1.0 - CAST(d.n_distinct_texts AS DOUBLE)
                      / CAST(d.n_docs AS DOUBLE), 6) AS DOUBLE)
               AS exact_dup_rate
    FROM dstats d JOIN tstats t USING (source)
    """,
)
def source_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source datasheet (Gebru et al., "Datasheets for
    Datasets" — the summary a data team publishes with a corpus):
    document and token counts, vocabulary size, mean document length,
    Gopher quality pass rate, and exact-duplicate rate, one row per
    source.

    Three corpus-scale aggregates (token counts, per-doc gopher flags,
    fingerprint distincts), all map-side combined to |sources| rows;
    ratios computed in identical IEEE doubles at the end."""
    from .analytics_ext import gopher_rule_flags

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    tstats = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct("tok").alias("vocab_size"),
    )
    gp = gopher_rule_flags(docs).select("doc_id", "pass_gopher")
    dstats = (
        docs.join(gp, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("pass_gopher").cast("int"))
            .cast("long")
            .alias("n_gopher_pass"),
            F.count_distinct(T.fingerprint(F.col("text")))
            .alias("n_distinct_texts"),
        )
    )
    return dstats.join(tstats, "source").select(
        "source",
        "n_docs",
        "n_tokens",
        "vocab_size",
        F.round(
            F.col("n_tokens").cast("double") / F.col("n_docs").cast("double"),
            6,
        ).cast("double").alias("mean_doc_tokens"),
        F.round(
            F.col("n_gopher_pass").cast("double")
            / F.col("n_docs").cast("double"),
            6,
        ).cast("double").alias("gopher_pass_rate"),
        F.round(
            1.0
            - F.col("n_distinct_texts").cast("double")
            / F.col("n_docs").cast("double"),
            6,
        ).cast("double").alias("exact_dup_rate"),
    )


# ---------------------------------------------------------------------------
# Deterministic contrastive negative sampling
# ---------------------------------------------------------------------------

@query(
    "doc_contrastive_negatives",
    """
    WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
    cand AS (
        SELECT d.doc_id, j.j,
               ((d.doc_id % (SELECT n_docs FROM n)) * 40503
                + j.j * 1009) % (SELECT n_docs FROM n) AS neg_id
        FROM documents d
        CROSS JOIN (SELECT unnest(range(1, 4)) AS j) j
    )
    SELECT c.doc_id, CAST(c.j AS INT) AS j, c.neg_id
    FROM cand c
    WHERE c.neg_id <> c.doc_id
      AND NOT EXISTS (
          SELECT 1 FROM (
              WITH base AS (
                  SELECT doc_id AS id, source,
                         list_distinct(list_transform(
                             range(1, greatest(len(string_split(text,' '))
                                               - 2, 1) + 1),
                             i -> string_split(text,' ')[i] || ' ' ||
                                  string_split(text,' ')[i+1] || ' ' ||
                                  string_split(text,' ')[i+2]
                         )) AS sh
                  FROM documents
              ),
              ex0 AS (SELECT id, source, unnest(sh) AS shingle FROM base),
              exf AS (
                  SELECT id, source, shingle
                  FROM (SELECT id, source, shingle,
                               COUNT(*) OVER (PARTITION BY source, shingle)
                                   AS df
                        FROM ex0)
                  WHERE df <= 1000
              ),
              ex AS (
                  SELECT id, source, shingle,
                         COUNT(*) OVER (PARTITION BY id) AS n_sh
                  FROM exf
              ),
              inter AS (
                  SELECT a.id AS id_a, b.id AS id_b,
                         a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS n_inter
                  FROM ex a JOIN ex b
                    ON a.shingle = b.shingle AND a.source = b.source
                       AND a.id < b.id
                  GROUP BY a.id, b.id, a.n_sh, b.n_sh
              )
              SELECT id_a, id_b FROM inter
              WHERE CAST(n_inter AS DOUBLE)
                    / CAST(n_a + n_b - n_inter AS DOUBLE) >= 0.1
          ) p
          WHERE (p.id_a = c.doc_id AND p.id_b = c.neg_id)
             OR (p.id_a = c.neg_id AND p.id_b = c.doc_id)
      )
    """,
)
def doc_contrastive_negatives(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic random-negative sampling for contrastive training:
    each document draws 3 pseudo-random partners (integer hash
    arithmetic over the dense id space — rerun/layout-independent and
    DuckDB-reproducible), then drops self-pairs and any partner that is
    a near-duplicate (exact 3-gram Jaccard ≥ 0.1 — a near-dup is a
    false negative that would poison the contrastive loss).

    Scale shape: the candidate fan-out is a per-row map (k rows/doc);
    the near-dup exclusion is one anti-join against the pair table the
    dedup pipeline already produces.  NOT EXISTS in the oracle, a
    symmetric-key anti-join in the plan."""
    from ..operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    cand = (
        docs.select("doc_id")
        .select(
            "doc_id",
            F.explode(F.expr("sequence(1, 3)")).alias("j"),
        )
        .select(
            "doc_id",
            F.col("j").cast("int").alias("j"),
            # overflow-safe under ANSI: (id % n) < n keeps the 16-bit
            # multiplier product under 2^63 for any plausible corpus
            # (n < 2.2e14), unlike the raw Knuth-constant multiply
            (
                (
                    (F.col("doc_id") % F.lit(int(n_docs)))
                    * F.lit(40503)
                    + F.col("j") * F.lit(1009)
                )
                % F.lit(int(n_docs))
            ).alias("neg_id"),
        )
        .filter(F.col("neg_id") != F.col("doc_id"))
    )
    pairs = D.shingle_pairs_jaccard(
        docs, block_cols=["source"], k=3, threshold=0.1
    ).select(
        F.least("id_a", "id_b").alias("lo"),
        F.greatest("id_a", "id_b").alias("hi"),
    )
    keyed = cand.withColumn(
        "lo", F.least(F.col("doc_id"), F.col("neg_id"))
    ).withColumn("hi", F.greatest(F.col("doc_id"), F.col("neg_id")))
    # no broadcast hint: the near-dup pair table is sparse but
    # corpus-scale — the equi anti-join on (lo, hi) shuffles both
    # sides; AQE may still broadcast when the pair side is small
    return keyed.join(pairs, ["lo", "hi"], "left_anti").select(
        "doc_id", "j", "neg_id"
    )
