"""Late-registering sketch/LM queries (past the driver's 50-slot
window on purpose; the in-repo contract gate oracle-checks them):
count-min-sketch heavy hitters (operators/cms.py) and held-out
Stupid-Backoff LM scoring (operators/lm.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.cms import cms_estimates, cms_table
from ..operators.lm import stupid_backoff_doc_scores
from ..operators.splits import assign_split, split_case_sql
from .registry import query

#: CMS geometry for the driver query — 150 users into 64 buckets
#: forces real collisions (the estimator's min-over-rows is exercised,
#: not vacuous); 4×64 = 256 counter rows.
_CMS_DEPTH = 4
_CMS_WIDTH = 64


def _md5_48_sql(expr: str) -> str:
    """DuckDB SQL for the 48-bit md5-prefix hash of ``expr`` — the
    ``operators.cms.cms_bucket`` mirror (strpos hex-decode arithmetic,
    the kmv/dsir discipline)."""
    return f"""list_aggregate(list_transform(range(1, 13),
        i -> (strpos('0123456789abcdef',
                     substr(md5({expr}), CAST(i AS INTEGER), 1)) - 1)
             * CAST(16 ** (12 - i) AS BIGINT)), 'sum')"""


@query(
    "user_heavy_hitters_cms",
    f"""
    WITH c AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_count
        FROM events GROUP BY user_id
    ),
    tot AS (
        SELECT SUM(exact_count) AS n_total,
               COUNT(*) AS n_users
        FROM c
    ),
    hh AS (
        SELECT user_id, exact_count FROM c
        WHERE exact_count * 10 * (SELECT n_users FROM tot)
              >= 12 * (SELECT n_total FROM tot)
    ),
    tb AS (
        SELECT r AS row,
               ({_md5_48_sql("r || '|' || CAST(user_id AS VARCHAR)")})
                   % {_CMS_WIDTH} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events, UNNEST(range(0, {_CMS_DEPTH})) AS u(r)
        GROUP BY 1, 2
    ),
    fan AS (
        SELECT hh.user_id, hh.exact_count, u.r AS row,
               ({_md5_48_sql("u.r || '|' || CAST(hh.user_id AS VARCHAR)")})
                   % {_CMS_WIDTH} AS bucket
        FROM hh, UNNEST(range(0, {_CMS_DEPTH})) AS u(r)
    )
    SELECT fan.user_id,
           fan.exact_count,
           CAST(MIN(COALESCE(tb.cnt, 0)) AS BIGINT) AS est_count
    FROM fan
    LEFT JOIN tb ON tb.row = fan.row AND tb.bucket = fan.bucket
    GROUP BY fan.user_id, fan.exact_count
    """,
)
def user_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters (users with ≥1.2× the average event count —
    integer-exact threshold: 10·n·|users| ≥ 12·total) with their
    count-min-sketch frequency estimate beside the exact count.  The
    CMS estimate is deterministic (md5-prefix row hashes) and
    reproduced value-exactly by the DuckDB oracle; est ≥ exact always
    (CMS never under-counts).

    Scale: the exact aggregation here is the VALIDATOR — at 100 TB on
    an unbounded key space (tokens, URLs) only the depth×width counter
    table and the candidate probe survive; see operators/cms.py."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    tot = c.agg(
        F.sum("exact_count").alias("n_total"),
        F.count(F.lit(1)).alias("n_users"),
    )
    hh = (
        c.crossJoin(F.broadcast(tot))
        .filter(
            F.col("exact_count") * 10 * F.col("n_users")
            >= 12 * F.col("n_total")
        )
        .select("user_id", "exact_count")
    )
    tbl = cms_table(ev, "user_id", depth=_CMS_DEPTH, width=_CMS_WIDTH)
    est = cms_estimates(
        tbl, hh, "user_id", depth=_CMS_DEPTH, width=_CMS_WIDTH
    )
    return hh.join(est, "user_id").select(
        "user_id", "exact_count", F.col("est").alias("est_count")
    )


#: held-out LM split: train the trigram counts on 90%, score the rest
#: (self-trained LMs never back off — every n-gram is its own
#: training data; the held-out shape exercises all three arms)
_LM_WEIGHTS = {"train": 0.9, "val": 0.1}
_LM_SEED = 7


@query(
    "doc_lm_stupid_backoff",
    f"""
    WITH d AS (
        SELECT doc_id, text,
               {split_case_sql(_LM_WEIGHTS, "doc_id", seed=_LM_SEED)} AS split
        FROM documents
    ),
    tr AS (SELECT string_split(text, ' ') AS t FROM d WHERE split = 'train'),
    tri_c AS (
        SELECT g AS tri, COUNT(*) AS c123 FROM (
            SELECT unnest(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
            FROM tr
        ) GROUP BY g
    ),
    bi_c AS (
        SELECT g AS bg, COUNT(*) AS cb FROM (
            SELECT unnest(list_transform(range(1, len(t)),
                i -> t[i] || ' ' || t[i+1])) AS g
            FROM tr
        ) GROUP BY g
    ),
    uni_c AS (
        SELECT tok, COUNT(*) AS cu FROM (
            SELECT unnest(t) AS tok FROM tr
        ) GROUP BY tok
    ),
    tot AS (SELECT COUNT(*) AS n_total FROM (SELECT unnest(t) FROM tr)),
    sc AS (
        SELECT doc_id, string_split(text, ' ') AS t
        FROM d WHERE split = 'val'
    ),
    st AS (
        SELECT doc_id,
               t[u.i] || ' ' || t[u.i+1] AS lead,
               t[u.i+1] || ' ' || t[u.i+2] AS trail,
               t[u.i+1] AS w2, t[u.i+2] AS w3,
               t[u.i] || ' ' || t[u.i+1] || ' ' || t[u.i+2] AS tri
        FROM sc, UNNEST(range(1, len(t) - 1)) AS u(i)
    ),
    scored AS (
        SELECT st.doc_id,
               CAST(ROUND(log10(
                   CASE WHEN tc.c123 IS NOT NULL THEN
                            CAST(tc.c123 AS DOUBLE) / CAST(bl.cb AS DOUBLE)
                        WHEN bt.cb IS NOT NULL THEN
                            0.4 * CAST(bt.cb AS DOUBLE)
                                / CAST(u2.cu AS DOUBLE)
                        ELSE
                            0.4 * 0.4
                            * CAST(GREATEST(COALESCE(u3.cu, 0), 1) AS DOUBLE)
                            / CAST((SELECT n_total FROM tot) AS DOUBLE)
                   END) * 1000000.0) AS BIGINT) AS s
        FROM st
        LEFT JOIN tri_c tc ON tc.tri = st.tri
        LEFT JOIN bi_c bl ON bl.bg = st.lead
        LEFT JOIN bi_c bt ON bt.bg = st.trail
        LEFT JOIN uni_c u2 ON u2.tok = st.w2
        LEFT JOIN uni_c u3 ON u3.tok = st.w3
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           CAST(ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
                AS DOUBLE) AS mean_log10_score
    FROM scored GROUP BY doc_id
    """,
)
def doc_lm_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out Stupid-Backoff trigram LM scores (operators/lm.py):
    counts from the hash-assigned 90% train split, every val document
    scored by mean log10 S(w3|w1 w2).  ~43% of val trigrams are unseen
    in train at sf0.01 — the backoff arms carry real weight, unlike a
    self-trained LM where the first arm always hits.

    Cross-engine: per-trigram log-scores rounded to scaled longs
    before the per-doc sum (the doc_unigram_surprisal discipline);
    split assignment is the assign_split hash coin, mirrored by
    split_case_sql."""
    docs = load_table(spark, sf_dir, "documents")
    d = assign_split(docs, _LM_WEIGHTS, id_col="doc_id", seed=_LM_SEED)
    train = d.filter(F.col("split") == "train")
    val = d.filter(F.col("split") == "val")
    return stupid_backoff_doc_scores(
        train, val, text_col="text", id_col="doc_id"
    )
