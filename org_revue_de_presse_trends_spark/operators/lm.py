"""N-gram language-model scoring with Stupid Backoff — the held-out
perplexity filter shape CCNet-style pipelines use for quality
selection (Wenzek et al. 2020 score against a wikipedia KenLM; here
the model is trained on one split of the corpus and scores another).

Stupid Backoff (Brants et al., "Large Language Models in Machine
Translation", EMNLP'07 — public algorithm) replaces discounted
smoothing with a fixed backoff multiplier, which is what makes it the
standard web-scale choice: counts are the model, no normalization
pass, trivially mergeable.

    S(w3 | w1 w2) = c(w1 w2 w3) / c(w1 w2)        if c(w1 w2 w3) > 0
                  = α · c(w2 w3) / c(w2)           elif c(w2 w3) > 0
                  = α² · max(c(w3), 1) / N         otherwise

(the OOV floor max(c(w3), 1) keeps log-scores finite for tokens the
training split never saw — pinned identically in the DuckDB oracle).

Cross-engine determinism: each trigram's log10-score is rounded to 6
decimals and scaled to an integer BEFORE the per-document sum (longs
add associatively in any engine — the ``doc_unigram_surprisal``
discipline), then the mean is rounded once after the divide.  The α
arms are written with identical literal/operation order in both
engines so the doubles are bit-equal.

Scale shape (100 TB): three count aggregations over the train split
(map-side combined, vocab-bounded output) broadcast back onto the
scoring split's exploded trigram stream, then one per-document
aggregation.  No self-joins, no windows over the corpus; the LM tables
are the only state and they are |vocab|-, |bigrams|-, |trigrams|-sized
— at trillion-token scale the trigram table itself gets pruned by a
count floor (``min_count``), the published Stupid-Backoff deployment
shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def trigram_stream(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, lead "w1 w2", trail "w2 w3", w2, w3, tri "w1 w2 w3") — one
    row per trigram occurrence WITH multiplicity (unlike
    ``text.with_shingles``, which deduplicates for set semantics).

    Built from zip_with over shifted slices of a staged token array —
    never a per-element lambda over the source array — with each HOF
    level staged behind a projection boundary (interpreted HOFs
    re-evaluate a subtree once per reference)."""
    d1 = df.select(
        F.col(id_col).alias("__id"),
        F.expr(f"split(`{text_col}`, ' ')").alias("__t"),
    )
    d2 = d1.select(
        "__id",
        F.expr("slice(__t, 1, greatest(size(__t) - 2, 0))").alias("__s1"),
        F.expr("slice(__t, 2, greatest(size(__t) - 2, 0))").alias("__s2"),
        F.expr("slice(__t, 3, greatest(size(__t) - 2, 0))").alias("__s3"),
    )
    d3 = d2.select(
        "__id",
        F.expr(
            "zip_with(__s1, __s2, (a, b) -> concat(a, ' ', b))"
        ).alias("__lead"),
        F.expr(
            "zip_with(__s2, __s3, (a, b) -> concat(a, ' ', b))"
        ).alias("__trail"),
        "__s2",
        "__s3",
    )
    ex = d3.select(
        "__id",
        F.explode(
            F.arrays_zip("__lead", "__trail", "__s2", "__s3")
        ).alias("g"),
    )
    return ex.select(
        F.col("__id").alias(id_col),
        F.col("g.__lead").alias("lead"),
        F.col("g.__trail").alias("trail"),
        F.col("g.__s2").alias("w2"),
        F.col("g.__s3").alias("w3"),
        F.concat(F.col("g.__lead"), F.lit(" "), F.col("g.__s3")).alias(
            "tri"
        ),
    )


def bigram_stream(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, bg "w1 w2") — one row per bigram occurrence with
    multiplicity."""
    d1 = df.select(
        F.col(id_col).alias("__id"),
        F.expr(f"split(`{text_col}`, ' ')").alias("__t"),
    )
    d2 = d1.select(
        "__id",
        F.expr(
            "zip_with(slice(__t, 1, greatest(size(__t) - 1, 0)), "
            "slice(__t, 2, greatest(size(__t) - 1, 0)), "
            "(a, b) -> concat(a, ' ', b))"
        ).alias("__bg"),
    )
    return d2.select(
        F.col("__id").alias(id_col), F.explode("__bg").alias("bg")
    )


def stupid_backoff_doc_scores(
    train: DataFrame,
    score: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    min_count: int = 1,
) -> DataFrame:
    """(id_col, n_trigrams, mean_log10_score) — per-document mean
    log10 Stupid-Backoff trigram score of every ``score`` document
    under the LM counted from ``train``.  Documents with fewer than 3
    tokens have no trigrams and are absent from the output (pinned in
    the oracle by the same >= 3 filter).

    ``min_count`` > 1 prunes the trigram table to counts >= min_count
    — the web-scale deployment knob (pruned trigrams fall through to
    the bigram arm)."""
    tri_c = (
        trigram_stream(train, text_col, id_col)
        .groupBy("tri")
        .agg(F.count(F.lit(1)).alias("c123"))
    )
    if int(min_count) > 1:
        tri_c = tri_c.filter(F.col("c123") >= int(min_count))
    bi_c = (
        bigram_stream(train, text_col, id_col)
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    toks = train.select(
        F.explode(F.expr(f"split(`{text_col}`, ' ')")).alias("tok")
    )
    uni_c = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cu"))
    n_total = toks.agg(F.count(F.lit(1)).alias("n_total"))

    st = trigram_stream(score, text_col, id_col)
    j = (
        st.join(F.broadcast(tri_c), "tri", "left")
        .join(
            F.broadcast(
                bi_c.select(F.col("bg").alias("lead"), F.col("cb").alias("c12"))
            ),
            "lead",
            "left",
        )
        .join(
            F.broadcast(
                bi_c.select(F.col("bg").alias("trail"), F.col("cb").alias("c23"))
            ),
            "trail",
            "left",
        )
        .join(
            F.broadcast(
                uni_c.select(F.col("tok").alias("w2"), F.col("cu").alias("c2"))
            ),
            "w2",
            "left",
        )
        .join(
            F.broadcast(
                uni_c.select(F.col("tok").alias("w3"), F.col("cu").alias("c3"))
            ),
            "w3",
            "left",
        )
        .crossJoin(F.broadcast(n_total))
    )
    a = F.lit(float(alpha))
    s = (
        F.when(
            F.col("c123").isNotNull(),
            F.col("c123").cast("double") / F.col("c12").cast("double"),
        )
        .when(
            F.col("c23").isNotNull(),
            a * F.col("c23").cast("double") / F.col("c2").cast("double"),
        )
        .otherwise(
            a
            * a
            * F.greatest(F.coalesce(F.col("c3"), F.lit(0)), F.lit(1)).cast(
                "double"
            )
            / F.col("n_total").cast("double")
        )
    )
    scaled = F.round(F.log10(s) * F.lit(1000000.0)).cast("long")
    return (
        j.select(F.col(id_col), scaled.alias("__s"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_trigrams"),
            F.round(
                F.sum("__s").cast("double")
                / F.count(F.lit(1))
                / F.lit(1000000.0),
                6,
            ).alias("mean_log10_score"),
        )
    )


def kneser_ney_doc_scores(
    train: DataFrame,
    score: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, n_bigrams, mean_log10_kn) — per-document mean log10
    interpolated Kneser-Ney bigram probability of every ``score``
    document under the model counted from ``train`` (Kneser & Ney
    1995; absolute-discounting formulation of Chen & Goodman 1998):

        P(w2|w1) = (max(c(w1 w2) − D, 0)
                    + D · N1+(w1 ·) · P_cont(w2)) / c(w1 ·)
        P_cont(w2) = max(N1+(· w2), 1) / N1+(· ·)
        D = n1 / (n1 + 2 · n2)

    with c(w1 ·) the bigram-table marginal (so probabilities normalize
    over the observed event space), N1+ the distinct-continuation type
    counts, and n1/n2 the bigram types seen exactly once/twice.
    Pinned conventions (mirrored in the DuckDB oracle): unseen w1
    falls back to P_cont alone; the max(…, 1) floor keeps unseen-w2
    continuation mass finite (the stupid-backoff OOV-floor
    discipline).  Documents with < 2 tokens have no bigrams and are
    absent.

    Every model component is an exact integer aggregate; D and each
    probability are single pinned IEEE expression trees over them, and
    per-bigram log10 scores are rounded to 6 decimals and scaled to
    longs BEFORE the per-document sum (the house cross-engine rule) —
    so scores reproduce value-exactly in any engine.

    Scale shape: two count aggregations + three type-count
    aggregations over the train split (map-side combined,
    vocab/bigram-bounded), broadcast onto the scoring split's bigram
    stream, one per-document aggregate.  Same deployment shape as
    stupid_backoff_doc_scores; KN trades its extra type-count tables
    for properly normalized held-out probabilities."""
    bg = bigram_stream(train, text_col, id_col).select(
        F.expr("split(bg, ' ')[0]").alias("w1"),
        F.expr("split(bg, ' ')[1]").alias("w2"),
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # bigram-table marginals + distinct-continuation type counts
    head = c12.groupBy("w1").agg(
        F.sum("c12").alias("cw1"),
        F.count(F.lit(1)).alias("n1p_w1"),
    )
    cont = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_w2"))
    glob = c12.agg(
        F.count(F.lit(1)).alias("n1p_all"),
        F.sum((F.col("c12") == 1).cast("long")).alias("n_once"),
        F.sum((F.col("c12") == 2).cast("long")).alias("n_twice"),
    )
    sb = bigram_stream(score, text_col, id_col).select(
        F.col(id_col),
        F.expr("split(bg, ' ')[0]").alias("w1"),
        F.expr("split(bg, ' ')[1]").alias("w2"),
    )
    j = (
        sb.join(F.broadcast(c12), ["w1", "w2"], "left")
        .join(F.broadcast(head), "w1", "left")
        .join(F.broadcast(cont), "w2", "left")
        .crossJoin(F.broadcast(glob))
    )
    # pinned convention: a corpus with NO once- or twice-seen bigrams
    # (tiny vocab at scale — every bigram count >= 3) has an undefined
    # Ney discount; fall back to D = 0.5 instead of an ANSI 0/0
    # (surfaced by the sf0.1 fixtures: 31-word vocab, n1 = n2 = 0)
    d = F.when(
        F.col("n_once") + F.lit(2) * F.col("n_twice") > 0,
        F.col("n_once").cast("double")
        / (
            F.col("n_once").cast("double")
            + F.lit(2.0) * F.col("n_twice").cast("double")
        ),
    ).otherwise(F.lit(0.5))
    pcont = F.greatest(
        F.coalesce(F.col("n1p_w2"), F.lit(0)), F.lit(1)
    ).cast("double") / F.col("n1p_all").cast("double")
    p_seen_head = (
        F.greatest(
            F.coalesce(F.col("c12"), F.lit(0)).cast("double") - d,
            F.lit(0.0),
        )
        + d * F.col("n1p_w1").cast("double") * pcont
    ) / F.col("cw1").cast("double")
    p = F.when(F.col("cw1").isNotNull(), p_seen_head).otherwise(pcont)
    scaled = F.round(F.log10(p) * F.lit(1000000.0)).cast("long")
    return (
        j.select(F.col(id_col), scaled.alias("__s"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.sum("__s").cast("double")
                / F.count(F.lit(1))
                / F.lit(1000000.0),
                6,
            ).alias("mean_log10_kn"),
        )
    )
