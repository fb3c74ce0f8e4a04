"""LLM-data-pipeline driver queries over documents/embeddings fixtures:
deduplication, similarity search, text analysis (task brief: first-class
components alongside SURVEY §2).

Oracle policy: everything SQL-expressible carries a DuckDB oracle;
minhash/simhash/winnowing use Spark-side xxhash64 (no DuckDB
equivalent) so the fast variants register without an oracle (driver
records rows-only check; golden-pinned + property tests) — and each
family ALSO registers a value-exact md5-hashed sibling
(dedup_minhash_md5 / dedup_simhash_md5 / doc_winnow_fingerprints_md5)
whose DuckDB oracle reproduces the hash values themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import text as T
from ..functions import vectors as V
from ..operators import dedup as D
from ..operators import semdedup as SD
from ..operators import similarity as S
from .registry import query

# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

@query(
    "doc_token_stats",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS token_count,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+')) AS word_count,
           length(text) AS char_count,
           md5(lower(trim(text))) AS fingerprint
    FROM documents
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + regex tokenizer) + md5 document
    fingerprint.  Pure per-row JVM expressions — zero shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(T.tokens(F.col("text"))).cast("long").alias("token_count"),
        F.size(T.word_tokens_regex(F.col("text"))).cast("long").alias("word_count"),
        F.length("text").cast("long").alias("char_count"),
        T.fingerprint(F.col("text")).alias("fingerprint"),
    )


@query(
    "doc_quality_scores",
    """
    SELECT doc_id,
           (
             least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
             + least(((CAST(length(text) AS DOUBLE)
                       - (CAST(len(string_split(text, ' ')) AS DOUBLE) - 1.0))
                      / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8.0, 1.0)
             + least((CAST(len(list_filter(string_split(text, ' '),
                                           x -> x IN ('the','a','of','and','to')))
                           AS DOUBLE)
                      / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 5.0, 1.0)
           ) / 3.0 AS quality
    FROM documents
    """,
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality heuristic (length / token-length / stopword
    components) — same arithmetic expression in both engines."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", T.quality_score(F.col("text")).alias("quality"))


def _lang_hits_sql(words: tuple[str, ...]) -> str:
    inlist = ",".join(f"'{w}'" for w in words)
    return (
        f"len(list_filter(string_split(text, ' '), x -> x IN ({inlist})))"
    )


_LANG_CASE = f"""
    CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
         WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
         WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
         WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
         ELSE 'fr'
    END
"""


@query(
    "doc_lang_id",
    f"""
    SELECT doc_id, lang, {_LANG_CASE} AS lang_guess
    FROM (
        SELECT doc_id, lang,
               {_lang_hits_sql(T.LANG_MARKERS['de'])} AS h_de,
               {_lang_hits_sql(T.LANG_MARKERS['en'])} AS h_en,
               {_lang_hits_sql(T.LANG_MARKERS['es'])} AS h_es,
               {_lang_hits_sql(T.LANG_MARKERS['fr'])} AS h_fr
        FROM documents
    )
    """,
)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID (ties → lexicographically smallest
    language code, no hits → 'und').  `spread_for_cpu`: four
    interpreted stopword-filter HOFs per row ran in the scan stage's
    single split (r6 A/B best-of-3 at sf0.1: 0.79 → 0.41 s)."""
    from ..operators.skew import spread_for_cpu

    d = spread_for_cpu(load_table(spark, sf_dir, "documents"))
    return d.select("doc_id", "lang", T.lang_id(F.col("text")).alias("lang_guess"))


@query(
    "doc_chunks",
    """
    SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
           array_to_string(list_slice(toks, chunk_id * 40 + 1,
                                      chunk_id * 40 + 50), ' ') AS chunk,
           CAST(least(len(toks) - chunk_id * 40, 50) AS INTEGER)
             AS n_tokens
    FROM (
        SELECT doc_id, string_split(text, ' ') AS toks,
               unnest(range(0, greatest(CAST(ceil(
                   CAST(len(string_split(text,' ')) - 10 AS DOUBLE) / 40.0
               ) AS INTEGER), 1))) AS chunk_id
        FROM documents
    )
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking for LLM training: 50-token windows with
    10-token overlap (step 40), one output row per chunk.  The token
    array is materialized once per row before the window transform
    (inline expressions inside the lambda would re-tokenize per
    chunk)."""
    from ..functions.text import chunks_from_tokens

    d = load_table(spark, sf_dir, "documents").withColumn(
        "__toks", T.tokens(F.col("text"))
    )
    return d.select(
        "doc_id",
        F.explode(
            chunks_from_tokens(F.col("__toks"), size=50, overlap=10)
        ).alias("c"),
    ).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.chunk").alias("chunk"),
        F.col("c.n_tokens").alias("n_tokens"),
    )


@query(
    "vocab_top_tokens",
    """
    SELECT token, COUNT(*) AS n_occurrences,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    )
    GROUP BY token
    ORDER BY n_occurrences DESC, token
    LIMIT 50
    """,
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: top-50 tokens by occurrence
    (deterministic tiebreak), with document frequency."""
    d = load_table(spark, sf_dir, "documents")
    ex = d.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("token"))
    agg = ex.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return agg.orderBy(F.desc("n_occurrences"), F.asc("token")).limit(50)


@query(
    "doc_top_tfidf_terms",
    """
    WITH ex AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM ex GROUP BY doc_id, token
    ),
    df AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df FROM ex GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token,
               CAST(tf.tf AS DOUBLE)
                 * ln((CAST(n.n_docs AS DOUBLE) + 1.0)
                      / (CAST(df.df AS DOUBLE) + 1.0)) AS tfidf
        FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
    )
    SELECT doc_id, token, tfidf
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, token
        ) AS rn
        FROM scored
    )
    WHERE rn <= 3
    """,
)
def doc_top_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms: tf joined with broadcast
    document frequencies, smoothed idf = ln((N+1)/(df+1)).  Both
    engines compute the identical double (ln is correctly rounded).

    N rides in the SAME job as a broadcast 1-row aggregate crossJoin
    (not a separate d.count() action): one fewer scan + one fewer job,
    measured ~1.3 s → ~1.0 s warm at sf0.1, value-identical."""
    d = load_table(spark, sf_dir, "documents")
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    ex = d.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("token"))
    tf = ex.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = ex.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            (
                F.col("tf").cast("double")
                * F.log(
                    (F.col("n_docs").cast("double") + 1.0)
                    / (F.col("df").cast("double") + 1.0)
                )
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", "tfidf")
    )


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

# Shared oracle CTE block mirroring operators.dedup.shingle_pairs_jaccard
# (block=source, k=3, max_shingle_df=1000): distinct 3-shingles, drop
# stop-shingles above the per-block document-frequency cap, set sizes
# over the FILTERED sets, then pair intersection counts.
_SHINGLE_PAIRS_CTES = """base AS (
        SELECT doc_id AS id, source,
               list_distinct(list_transform(
                   range(1, greatest(len(string_split(text,' ')) - 2, 1) + 1),
                   i -> string_split(text,' ')[i] || ' ' ||
                        string_split(text,' ')[i+1] || ' ' ||
                        string_split(text,' ')[i+2]
               )) AS sh
        FROM documents
    ),
    ex0 AS (
        SELECT id, source, unnest(sh) AS shingle FROM base
    ),
    exf AS (
        SELECT id, source, shingle
        FROM (SELECT id, source, shingle,
                     COUNT(*) OVER (PARTITION BY source, shingle) AS df
              FROM ex0)
        WHERE df <= 1000
    ),
    ex AS (
        SELECT id, source, shingle,
               COUNT(*) OVER (PARTITION BY id) AS n_sh
        FROM exf
    ),
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
               COUNT(*) AS n_inter
        FROM ex a JOIN ex b
          ON a.shingle = b.shingle AND a.source = b.source AND a.id < b.id
        GROUP BY a.id, b.id, a.n_sh, b.n_sh
    )"""

@query(
    "dedup_exact_docs",
    """
    SELECT md5(lower(trim(text))) AS fp,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS dup_count
    FROM documents
    GROUP BY fp
    """,
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one hash-aggregate shuffle on the md5 fingerprint."""
    return D.dedup_exact(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_ngram_jaccard",
    f"""
    WITH {_SHINGLE_PAIRS_CTES}
    SELECT id_a, id_b,
           CAST(n_inter AS DOUBLE)
             / CAST(n_a + n_b - n_inter AS DOUBLE) AS jaccard
    FROM inter
    WHERE CAST(n_inter AS DOUBLE) / CAST(n_a + n_b - n_inter AS DOUBLE) >= 0.1
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs blocked by source (at 100 TB
    the block key becomes an LSH band — same equi-join shape)."""
    return D.shingle_pairs_jaccard(
        load_table(spark, sf_dir, "documents"),
        block_cols=["source"],
        k=3,
        threshold=0.1,
    )


@query(
    "dedup_clusters",
    f"""
    WITH RECURSIVE {_SHINGLE_PAIRS_CTES},
    pairs AS (
        SELECT id_a, id_b FROM inter
        WHERE CAST(n_inter AS DOUBLE)
              / CAST(n_a + n_b - n_inter AS DOUBLE) >= 0.1
    ),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    cc AS (
        SELECT doc_id AS id, doc_id AS lbl FROM documents
        UNION
        SELECT e.b AS id, cc.lbl FROM cc JOIN edges e ON e.a = cc.id
    )
    SELECT id, MIN(lbl) AS cluster, MIN(lbl) = id AS keep
    FROM cc GROUP BY id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dedup verdict: ngram-Jaccard near-dup pairs → connected
    components (iterative min-label propagation) → per-doc
    (cluster, keep).  The DuckDB oracle computes the same fixpoint via
    a recursive CTE — an exact cross-engine check of an iterative
    algorithm."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.shingle_pairs_jaccard(
        docs, block_cols=["source"], k=3, threshold=0.1
    )
    return D.dedup_assignments(docs, pairs)


@query("dedup_minhash_lsh")  # xxhash64-based: no DuckDB oracle (rows-only)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64 perms) + LSH(16 bands × 4 rows) candidate pairs.
    Verified against exact Jaccard by property tests in
    tests/test_dedup.py."""
    return D.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.35
    )


@query("dedup_simhash")  # xxhash64-based: no DuckDB oracle (rows-only)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup pairs within hamming distance 3 via 16-bit
    chunk blocking (pigeonhole-complete for d<=3)."""
    return D.simhash_pairs(load_table(spark, sf_dir, "documents"), max_hamming=3)


def _md5_simhash_oracle() -> str:
    from ..operators.urls import md5_bucket_sql

    md5d = md5_bucket_sql("duckdb", "t", 15)
    return f"""
    WITH tok AS (
        SELECT CAST(doc_id AS BIGINT) AS id,
               unnest(string_split(text, ' ')) AS t
        FROM documents
    ),
    h AS (SELECT id, {md5d} AS h FROM tok),
    bits AS (
        SELECT id, j, SUM(((h >> j) & 1) * 2 - 1) AS c
        FROM h CROSS JOIN (SELECT unnest(range(60)) AS j) grid
        GROUP BY id, j
    ),
    fp AS (
        SELECT id,
               CAST(SUM(CASE WHEN c > 0
                             THEN (CAST(1 AS BIGINT) << j)
                             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sh
        FROM bits GROUP BY id
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
    FROM fp a JOIN fp b ON a.id < b.id
    WHERE bit_count(xor(a.sh, b.sh)) <= 3
    """


@query("dedup_simhash_md5", _md5_simhash_oracle())
def dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VALUE-EXACT cross-engine sibling of q:dedup_simhash: same
    SimHash algorithm and the same blocked ``hamming_pairs`` join, but
    the per-token hash is the md5-prefix 60-bit hash both engines
    compute identically (operators/urls.md5_bucket_sql — the bloom/
    dsir recipe), so the DuckDB oracle reproduces the FINGERPRINTS and
    the pair set bit-for-bit (13 pairs at sf0.01, verified r9).  The
    60-bit hash rides in a 64-bit long with the top nibble zero, so
    the 4x16-bit pigeonhole blocking and hamming<=3 guarantee carry
    over unchanged; the oracle uses the brute-force O(n²) pair join —
    legitimate BECAUSE the blocked join is pigeonhole-exact, which is
    precisely the property this oracle pins.  The xxhash64 headline
    variant stays golden-pinned (md5 per token is ~2x the hash cost —
    the fast path keeps xxhash64, the evidence path pays md5)."""
    from ..operators.urls import md5_bucket_sql

    # no spread_for_cpu here: interleaved A/B at sf0.1 (r10) measured
    # 1.34 vs 1.30 best-of-4 — a wash; the 60-sum groupBy shuffle
    # already parallelizes the heavy part, unlike the pure-map winnow
    # sibling where spread won 3.5x
    docs = load_table(spark, sf_dir, "documents")
    md5s = md5_bucket_sql("spark", "t", 15)
    tok = docs.select(
        F.col("doc_id").cast("long").alias("id"),
        F.explode(T.tokens(F.col("text"))).alias("t"),
    ).selectExpr("id", f"{md5s} AS h")
    counts = tok.groupBy("id").agg(
        *[
            F.expr(f"sum((shiftright(h, {j}) & 1) * 2 - 1)").alias(f"c{j}")
            for j in range(60)
        ]
    )
    packed = " | ".join(
        f"(CASE WHEN c{j} > 0 THEN shiftleft(CAST(1 AS BIGINT), {j}) "
        f"ELSE CAST(0 AS BIGINT) END)"
        for j in range(60)
    )
    hashed = counts.select("id", F.expr(packed).alias("sh"))
    return D.hamming_pairs(hashed, max_hamming=3)


#: dedup_minhash_md5 parameters: 16 permutations in 4 bands x 4 rows
#: (the md5-per-shingle base hash bounds the sibling's cost; the
#: S-curve still crosses ~0.5 near J~0.5)
_MH_NP, _MH_NB, _MH_NR, _MH_K, _MH_THR = 16, 4, 4, 3, 0.35
_M47, _M43 = (1 << 47) - 1, (1 << 43) - 1


def _mh_perm_keys() -> list[int]:
    import hashlib

    return [
        int(hashlib.md5(f"minhash-perm-{j}".encode()).hexdigest()[:15], 16)
        for j in range(_MH_NP)
    ]


def _mh_mix(engine: str, h: str, kj: int) -> str:
    """Cross-engine 60-bit permutation mix: xor with a plan-time
    md5-derived constant + xorshift (shifts/xor ONLY — no
    multiplication under ANSI; the & masks keep every left shift
    inside 60 bits so DuckDB's checked << cannot overflow).  Exact in
    both engines by construction."""
    if engine == "spark":
        x0 = f"({h} ^ {kj})"
        x1 = f"({x0} ^ shiftleft({x0} & {_M47}, 13))"
        x2 = f"({x1} ^ shiftright({x1}, 7))"
        return f"({x2} ^ shiftleft({x2} & {_M43}, 17))"
    x0 = f"xor({h}, {kj})"
    x1 = f"xor({x0}, (({x0} & {_M47}) << 13))"
    x2 = f"xor({x1}, ({x1} >> 7))"
    return f"xor({x2}, (({x2} & {_M43}) << 17))"


def _md5_minhash_oracle() -> str:
    from ..operators.urls import md5_bucket_sql

    np_, nb, nr, k, thr = _MH_NP, _MH_NB, _MH_NR, _MH_K, _MH_THR
    md5s = md5_bucket_sql("duckdb", "s", 15)
    minterms = ", ".join(
        f"MIN({_mh_mix('duckdb', 'h', kj)}) AS m{j}"
        for j, kj in enumerate(_mh_perm_keys())
    )
    siglist = "[" + ", ".join(f"m{j}" for j in range(np_)) + "]"
    return f"""
    WITH base AS (
        SELECT CAST(doc_id AS BIGINT) AS id, string_split(text, ' ') AS tk,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    shl AS (
        SELECT id, CASE WHEN n < {k} THEN [array_to_string(tk, ' ')]
             ELSE list_distinct(list_transform(range(1, n - {k} + 2),
                  i -> array_to_string(list_slice(tk, i, i + {k - 1}), ' ')))
             END AS shl
        FROM base
    ),
    sh AS (SELECT id, {md5s} AS h
           FROM (SELECT id, unnest(shl) AS s FROM shl)),
    sig AS (SELECT id, {siglist} AS sig
            FROM (SELECT id, {minterms} FROM sh GROUP BY id)),
    bands AS (
        SELECT id, b,
               md5(array_to_string(
                   list_slice(sig, b*{nr}+1, b*{nr}+{nr}), ',')) AS key
        FROM sig CROSS JOIN (SELECT unnest(range({nb})) AS b)
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b2.id AS id_b
        FROM bands a JOIN bands b2
          ON a.b = b2.b AND a.key = b2.key AND a.id < b2.id
    ),
    scored AS (
        SELECT c.id_a, c.id_b,
               CAST(list_sum(list_transform(range(1, {np_} + 1),
                    i -> CASE WHEN sa.sig[i] = sb.sig[i]
                              THEN 1 ELSE 0 END)) AS DOUBLE) / {float(np_)}
               AS est_jaccard
        FROM cand c JOIN sig sa ON sa.id = c.id_a
                    JOIN sig sb ON sb.id = c.id_b
    )
    SELECT id_a, id_b, est_jaccard FROM scored
    WHERE est_jaccard >= {thr}
    """


@query("dedup_minhash_md5", _md5_minhash_oracle())
def dedup_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VALUE-EXACT cross-engine sibling of q:dedup_minhash_lsh:
    the same signature -> repartition barrier -> band explode ->
    self-equi-join -> slot-agreement estimate pipeline, but every hash
    both engines can compute — shingles hashed ONCE with the
    md5-prefix 60-bit hash, permutations via ``_mh_mix`` (xor-shift
    over plan-time constants; shifts/xor only), band keys the md5 hex
    of the comma-joined band rows.  The DuckDB oracle reproduces
    signatures, candidate buckets, and estimates bit-for-bit (25 pairs
    at sf0.01, verified r9).  16 perms / 4x4 bands bound the md5 base
    cost; the xxhash64 64-perm original stays the golden-pinned
    headline path."""
    from ..operators.skew import spread_for_cpu
    from ..operators.urls import md5_bucket_sql

    np_, nb, nr, k, thr = _MH_NP, _MH_NB, _MH_NR, _MH_K, _MH_THR
    docs = load_table(spark, sf_dir, "documents")
    md5s = md5_bucket_sql("spark", "s", 15)
    win = f"greatest(size(__toks) - {k - 1}, 1)"
    g = f"slice(__toks, 1, {win})"
    for j in range(1, k):
        g = (
            f"zip_with({g}, slice(__toks, {j + 1}, {win}),"
            f" (a, b) -> concat_ws(' ', a, b))"
        )
    sig_terms = ", ".join(
        f"array_min(transform(__sh, h -> {_mh_mix('spark', 'h', kj)}))"
        for kj in _mh_perm_keys()
    )
    band_terms = ", ".join(
        f"struct({b} AS band, md5(concat_ws(',',"
        f" slice(__sig, {b * nr + 1}, {nr}))) AS key)"
        for b in range(nb)
    )
    base = (
        spread_for_cpu(docs)
        .selectExpr("CAST(doc_id AS LONG) AS id", "split(text, ' ') AS __toks")
        .selectExpr(
            "id",
            f"CASE WHEN size(__toks) < {k}"
            f" THEN array(concat_ws(' ', __toks))"
            f" ELSE array_distinct({g}) END AS __shl",
        )
        .selectExpr("id", f"transform(__shl, s -> {md5s}) AS __sh")
        .selectExpr("id", f"array({sig_terms}) AS __sig")
        .repartition(F.col("id"))
    )
    banded = base.selectExpr(
        "id", f"explode(array({band_terms})) AS bk"
    ).selectExpr("id", "bk.band AS band", "bk.key AS key")
    a, b2 = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .join(base.selectExpr("id AS id_a", "__sig AS sa"), "id_a")
        .join(base.selectExpr("id AS id_b", "__sig AS sb"), "id_b")
    )
    est = F.expr(
        f"CAST(size(filter(zip_with(sa, sb, (x, y) -> x = y), e -> e))"
        f" AS DOUBLE) / {float(np_)}"
    )
    return cand.select("id_a", "id_b", est.alias("est_jaccard")).filter(
        F.col("est_jaccard") >= thr
    )


_DOT = (
    "list_aggregate(list_transform(range(1, 65), "
    "i -> CAST(ROUND(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
    "* 1000000.0, 0) AS BIGINT)), 'sum')"
)


@query(
    "embedding_near_dup",
    f"""
    WITH pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CAST({_DOT.format(a='a.embedding', b='b.embedding')} AS DOUBLE)
                 / sqrt(CAST({_DOT.format(a='a.embedding', b='a.embedding')} AS DOUBLE))
                 / sqrt(CAST({_DOT.format(a='b.embedding', b='b.embedding')} AS DOUBLE))
               AS cos
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cos FROM pairs WHERE cos >= 0.2
    """,
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs blocked by label (the IVF-cell
    stand-in), decimal-exact dot products for cross-engine equality.

    r6: runs through ``dedup.blocked_exact_cosine_pairs`` — a
    per-label BLAS matmul prefilter plus exact scaled-long rescore of
    the survivors — instead of the label equi-join whose interpreted
    per-pair HOF fold ground ~200k candidates in 2 tasks (13.3 s →
    ~1 s at sf0.1).  Emitted values are computed by the same Spark
    expressions in the same order, so the DuckDB oracle hash is
    unchanged (verified old-vs-new bit-identical at sf0.01/sf0.1)."""
    e = load_table(spark, sf_dir, "embeddings")
    return D.blocked_exact_cosine_pairs(
        e, block_col="label", vec_col="embedding", id_col="vec_id",
        threshold=0.2,
    )


_QUALITY_EXPR = """
    (
      least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
      + least(((CAST(length(text) AS DOUBLE)
                - (CAST(len(string_split(text, ' ')) AS DOUBLE) - 1.0))
               / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8.0, 1.0)
      + least((CAST(len(list_filter(string_split(text, ' '),
                                    x -> x IN ('the','a','of','and','to')))
                    AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 5.0, 1.0)
    ) / 3.0
"""


@query(
    "corpus_selection",
    f"""
    WITH RECURSIVE {_SHINGLE_PAIRS_CTES},
    pairs AS (
        SELECT id_a, id_b FROM inter
        WHERE CAST(n_inter AS DOUBLE)
              / CAST(n_a + n_b - n_inter AS DOUBLE) >= 0.1
    ),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs
    ),
    cc AS (
        SELECT doc_id AS id, doc_id AS lbl FROM documents
        UNION
        SELECT e.b AS id, cc.lbl FROM cc JOIN edges e ON e.a = cc.id
    ),
    keep_ids AS (
        SELECT id FROM cc GROUP BY id HAVING MIN(lbl) = id
    )
    SELECT d.doc_id, d.lang, d.n_chars,
           {_QUALITY_EXPR} AS quality
    FROM documents d
    JOIN keep_ids k ON d.doc_id = k.id
    WHERE {_QUALITY_EXPR} >= 0.5
      AND len(string_split(d.text, ' ')) >= 20
    """,
)
def corpus_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-corpus selection pipeline — the composite
    the LLM-data operators exist for: near-dup dedup (keep canonical
    doc per cluster) ∘ quality filter ∘ length filter, returning the
    surviving documents with their scores.  Each stage is an operator
    tested on its own; this query checks the composition against a
    single-statement DuckDB oracle."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.shingle_pairs_jaccard(
        docs, block_cols=["source"], k=3, threshold=0.1
    )
    keep = D.dedup_assignments(docs, pairs).filter(F.col("keep"))
    return (
        docs.join(keep, docs.doc_id == keep.id, "left_semi")
        .withColumn("quality", T.quality_score(F.col("text")))
        .filter(
            (F.col("quality") >= 0.5)
            & (F.size(T.tokens(F.col("text"))) >= 20)
        )
        .select("doc_id", "lang", "n_chars", "quality")
    )


@query(
    "doc_embedding_join",
    f"""
    SELECT e.label,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(d.n_chars AS DECIMAL(18,2))) AS DOUBLE)
             AS total_chars,
           MIN(d.lang) AS min_lang,
           CAST(AVG(CAST(({_QUALITY_EXPR.replace('text', 'd.text')})
                         >= 0.5 AS INTEGER)) AS DOUBLE) AS high_quality_frac
    FROM documents d
    JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY e.label
    """,
)
def doc_embedding_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal join: text documents ⋈ their embedding rows
    (doc_id = vec_id), aggregated per embedding-cluster label — the
    shape of 'summarize corpus quality per semantic cluster'."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    return (
        d.join(e, d.doc_id == e.vec_id)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.expr("CAST(n_chars AS DECIMAL(18,2))"))
            .cast("double")
            .alias("total_chars"),
            F.min("lang").alias("min_lang"),
            F.avg(
                (T.quality_score(F.col("text")) >= 0.5).cast("int")
            ).cast("double").alias("high_quality_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Similarity search (ANN)
# ---------------------------------------------------------------------------

@query(
    "ann_cosine_topk",
    f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST({_DOT.format(a='q.embedding', b='c.embedding')} AS DOUBLE)
                 / sqrt(CAST({_DOT.format(a='q.embedding', b='q.embedding')} AS DOUBLE))
                 / sqrt(CAST({_DOT.format(a='c.embedding', b='c.embedding')} AS DOUBLE))
               AS cos
        FROM embeddings c JOIN q ON q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, cos, rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos DESC, neighbor_id
        ) AS rank
        FROM scored
    )
    WHERE rank <= 10
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-10 for 5 query vectors (the ANN
    correctness baseline; the IVF scale path is ``operators.similarity.
    ivf_topk``, verified against this in tests)."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.brute_force_topk(
        e, e.filter(F.col("vec_id") < 5), k=10, exact=True
    )


@query("doc_winnow_fingerprints")  # xxhash64-based: no DuckDB oracle
def doc_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling-hash) document fingerprints, k=5-gram hashes
    winnowed with w=4 windows — the document-fingerprinting surface of
    the text-analysis suite.  Scalar summary per doc (the fingerprint
    array itself is an internal blocking key): count + extremes.
    Guarantee and density are property-tested in
    tests/test_operators.py; golden-hashed at sf0.01."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    staged = T.with_winnow_fingerprints(docs, "text", "fps", k=5, w=4)
    return staged.select(
        "doc_id",
        F.size("fps").cast("long").alias("n_fps"),
        F.array_min("fps").alias("min_fp"),
        F.array_max("fps").alias("max_fp"),
    )


_WINNOW_K, _WINNOW_W = 5, 4


def _md5_winnow_oracle() -> str:
    from ..operators.urls import md5_bucket_sql

    k, w = _WINNOW_K, _WINNOW_W
    md5g = md5_bucket_sql("duckdb", "g", 15)
    md5whole = md5_bucket_sql("duckdb", "array_to_string(tk, ' ')", 15)
    return f"""
    WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS tk,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    gram AS (
        SELECT doc_id, p,
               array_to_string(list_slice(tk, p, p + {k - 1}), ' ') AS g
        FROM base
        CROSS JOIN LATERAL (SELECT unnest(range(1, n - {k} + 2)) AS p) _
        WHERE n >= {k}
    ),
    gh AS (SELECT doc_id, p, {md5g} AS h FROM gram),
    mins AS (
        SELECT doc_id, p, n_h,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY p
                            ROWS BETWEEN CURRENT ROW
                            AND {w - 1} FOLLOWING) AS m
        FROM (SELECT doc_id, p, h,
                     COUNT(*) OVER (PARTITION BY doc_id) AS n_h FROM gh)
    ),
    sel AS (
        SELECT DISTINCT doc_id, m FROM mins
        WHERE p <= greatest(n_h - {w - 1}, 1)
    ),
    longdocs AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fps,
               MIN(m) AS min_fp, MAX(m) AS max_fp
        FROM sel GROUP BY doc_id
    ),
    shortdocs AS (
        SELECT doc_id, CAST(1 AS BIGINT) AS n_fps,
               {md5whole} AS min_fp, {md5whole} AS max_fp
        FROM base WHERE n < {k}
    )
    SELECT * FROM longdocs UNION ALL SELECT * FROM shortdocs
    """


@query("doc_winnow_fingerprints_md5", _md5_winnow_oracle())
def doc_winnow_fingerprints_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VALUE-EXACT cross-engine sibling of
    q:doc_winnow_fingerprints: same winnowing selection (per-window
    minimum over w consecutive k-gram hashes, distinct survivors —
    Schleimer et al. 2003), but the gram hash is the md5-prefix 60-bit
    hash of the LITERAL k-gram string, identical in both engines, so
    the fingerprint VALUES (not just counts) are oracle-verified.  The
    Spark side mirrors functions/text.with_winnow_fingerprints
    stage-for-stage (staged zip_with fans behind projection
    boundaries, each level a column attribute — the interpreted-HOF
    rule); the DuckDB side winnows with a ROWS window (min over
    [p, p+w-1], windows limited to p <= max(n_h-w+1, 1) — exactly the
    null-padded zip_with semantics).  Short docs (< k tokens) hash the
    whole rejoined token string in both engines.  500/500 rows
    bit-identical at sf0.01 (verified r9)."""
    from ..operators.skew import spread_for_cpu
    from ..operators.urls import md5_bucket_sql

    k, w = _WINNOW_K, _WINNOW_W
    # spread: the whole query is ONE map stage (shingle fan + per-gram
    # md5 + winnow mins, no exchange anywhere) and inherits the
    # documents scan's single split — it measured as tasks=1
    docs = spread_for_cpu(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    md5g = md5_bucket_sql("spark", "g", 15)
    md5whole = md5_bucket_sql("spark", "concat_ws(' ', __toks)", 15)
    win = f"greatest(size(__toks) - {k - 1}, 1)"
    g = f"slice(__toks, 1, {win})"
    for j in range(1, k):
        g = (
            f"zip_with({g}, slice(__toks, {j + 1}, {win}),"
            f" (a, b) -> concat_ws(' ', a, b))"
        )
    minw = f"greatest(size(__gh) - {w - 1}, 1)"
    m = f"slice(__gh, 1, {minw})"
    for j in range(1, w):
        m = (
            f"zip_with({m}, slice(__gh, {j + 1}, {minw}),"
            f" (a, b) -> least(a, b))"
        )
    return (
        docs.selectExpr("doc_id", "split(text, ' ') AS __toks")
        .selectExpr("doc_id", "__toks", f"{g} AS __grams")
        .selectExpr(
            "doc_id", "__toks",
            f"transform(__grams, g -> {md5g}) AS __gh",
        )
        .selectExpr("doc_id", "__toks", f"{m} AS __mins")
        .selectExpr(
            "doc_id",
            f"CASE WHEN size(__toks) < {k} THEN array({md5whole}) "
            f"ELSE array_distinct(__mins) END AS fps",
        )
        .selectExpr(
            "doc_id",
            "CAST(size(fps) AS BIGINT) AS n_fps",
            "array_min(fps) AS min_fp",
            "array_max(fps) AS max_fp",
        )
    )


@query("embedding_lsh_near_dup")  # SRP buckets: rows-only (golden-hashed)
def embedding_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH bucketed embedding near-dup — the no-external-blocking
    scale path (vs embedding_near_dup's label blocking): sign-random-
    projection band keys, self-equi-join on (band, key), exact-cosine
    verification.  The synthetic fixture has no high-cosine dups, so
    the toy parameters (16 bits / 8 bands, threshold 0.4) target its
    similarity range; recall against planted dups and the brute-force
    subset property are pinned in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    return D.embedding_lsh_pairs(
        emb, threshold=0.4, n_bits=16, bands=8
    )


@query("packed_sequences")  # procedural bin packing: no SQL oracle
def packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing over the chunked corpus: the
    training-data step after chunking — best-fit-decreasing within
    deterministic hash bins (operators/packing.py), budget 128.
    Invariants (exactly-once chunk assignment, budget ceiling, packing
    efficiency, determinism) are property-tested; golden-hashed at
    sf0.01."""
    from ..operators.packing import pack_sequences

    # dead end (r10): spread_for_cpu on the scan LOST (0.64 vs 0.80
    # interleaved best-of-4 at sf0.1) — the chunk fan is array slices,
    # and the hash-bin groupBy already parallelizes the BFD stage
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "__toks", T.tokens(F.col("text"))
    )
    chunks = docs.select(
        "doc_id",
        F.explode(
            T.chunks_from_tokens(F.col("__toks"), size=50, overlap=10)
        ).alias("c"),
    ).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.n_tokens").alias("n_tokens"),
    )
    return pack_sequences(chunks, budget=128)


@query("corpus_selection_lsh")  # MinHash candidates: rows-only
def corpus_selection_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-selection composite on its 100 TB candidate path:
    near-dup pairs from MinHash-LSH banding instead of the exact
    shingle self-join, then the same clustering / quality / length
    stages as q:corpus_selection.

    Unlike the blocked exact pipeline (which only compares docs within
    one source), LSH banding is global — at sf0.01 it recovers 24
    cross-source duplicate pairs the source-blocked path cannot see,
    while every LSH pair is verified to sit inside the UNBLOCKED
    exact-Jaccard pair set.  Pinned invariants: LSH selection ⊇ the
    unblocked-exact selection + sf0.01 golden hash."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, threshold=0.35)
    keep = D.dedup_assignments(docs, pairs).filter(F.col("keep"))
    return (
        docs.join(keep, docs.doc_id == keep.id, "left_semi")
        .withColumn("quality", T.quality_score(F.col("text")))
        .filter(
            (F.col("quality") >= 0.5)
            & (F.size(T.tokens(F.col("text"))) >= 20)
        )
        .select("doc_id", "lang", "n_chars", "quality")
    )


_DECON_ORACLE = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    pos AS (
      SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS p FROM toks
    ),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(t[p-12:p], ' ') AS g
      FROM pos WHERE p >= 13
      UNION ALL
      SELECT doc_id, array_to_string(t, ' ') AS g
      FROM toks WHERE len(t) < 13
    ),
    bg AS (
      SELECT doc_id AS bid, g FROM grams WHERE doc_id % 50 = 0
    ),
    hits AS (
      SELECT grams.doc_id AS id,
             COUNT(DISTINCT grams.g) AS n_hits,
             COUNT(DISTINCT bg.bid) AS n_benchmarks
      FROM grams JOIN bg USING (g)
      GROUP BY 1
    )
    SELECT d.doc_id,
           COALESCE(h.n_hits, 0) AS n_hits,
           COALESCE(h.n_benchmarks, 0) AS n_benchmarks,
           COALESCE(h.n_hits, 0) >= 1 AS contaminated
    FROM documents d LEFT JOIN hits h ON h.id = d.doc_id
"""


@query("doc_decontamination", _DECON_ORACLE)
def doc_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination verdict (GPT-3 appendix-C procedure:
    13-gram collision): every 50th document plays the role of an eval
    benchmark; those docs must flag themselves, and their near-dups
    surface as collateral hits.  Broadcast benchmark side — the corpus
    scan never shuffles (operators/decontaminate.py).

    Oracled since r8: Spark counts DISTINCT rolled 13-gram
    fingerprints (xor-rotate, operators/decontaminate._ngram_hashes),
    the oracle counts DISTINCT literal 13-grams — identical n_hits /
    n_benchmarks unless the 64-bit fingerprint collides (≪ 2^-40 at
    fixture gram counts; the doc_exact_substring_dedup precedent).
    Short docs contribute their whole-text gram in both engines."""
    from ..operators.decontaminate import contamination_hits

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return contamination_hits(docs, bench, n=13)


_SPAN_DECON_ORACLE = """
    WITH toks AS (
      SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
    ),
    pos AS (
      SELECT doc_id, t, unnest(range(1, len(t)+1)) AS p FROM toks
    ),
    grams AS (
      SELECT doc_id, p AS e, array_to_string(t[p-12:p], ' ') AS g
      FROM pos WHERE p >= 13
      UNION ALL
      SELECT doc_id, len(t) AS e, array_to_string(t, ' ') AS g
      FROM toks WHERE len(t) < 13
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
    marked AS (SELECT DISTINCT doc_id, e FROM grams JOIN bench USING (g)),
    flags AS (
      SELECT pos.doc_id, pos.p, t[CAST(pos.p AS INT)] AS tok,
             CASE WHEN m.e IS NULL THEN 0 ELSE 1 END AS f
      FROM pos LEFT JOIN marked m
        ON pos.doc_id = m.doc_id AND pos.p = m.e
    ),
    cov AS (
      SELECT doc_id, p, tok,
             max(f) OVER (PARTITION BY doc_id ORDER BY p
                          ROWS BETWEEN CURRENT ROW
                          AND 12 FOLLOWING) AS kill
      FROM flags
    ),
    agg AS (
      SELECT doc_id,
             coalesce(string_agg(tok, ' ' ORDER BY p)
                      FILTER (WHERE kill = 0), '') AS text_clean,
             count(*) AS n_tokens,
             CAST(sum(kill) AS BIGINT) AS n_removed
      FROM cov GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
           coalesce(a.n_removed, 0) AS n_removed,
           md5(CASE WHEN coalesce(a.n_removed, 0) = 0 THEN d.text
                    ELSE a.text_clean END) AS clean_md5
    FROM documents d LEFT JOIN agg a USING (doc_id)
"""


@query("doc_span_decontaminated", _SPAN_DECON_ORACLE)
def doc_span_decontaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surgical decontamination (the removal step after the
    q:doc_decontamination verdict): matched benchmark 13-gram windows
    are cut out token-exactly and the remainder stitched back
    (operators/decontaminate.remove_contaminated_spans).  Same
    every-50th-doc benchmark as the verdict query, so those docs wipe
    themselves to empty text and clean docs pass through byte-equal.
    Emits md5(text_clean), not the text — rows stay scalar and small
    for the driver's canonicalizer.

    Oracled since r8 (literal grams vs rolled fingerprints — the
    doc_decontamination argument; both sides mark gram END positions,
    the kill flag is the same forward-looking window max, and clean
    docs hash the ORIGINAL text so whitespace normalization can never
    fake a pass).  The Spark side's token positions are 0-based, the
    oracle's 1-based — both shifted consistently, same kill set."""
    from ..operators.decontaminate import remove_contaminated_spans

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    out = remove_contaminated_spans(docs, bench, n=13)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        F.md5(F.col("text_clean")).alias("clean_md5"),
    )


@query("doc_bpe_token_stats")  # iterative BPE training: rows-only (golden)
def doc_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer trained on the corpus (operators/bpe.py, Sennrich
    et al. 2016), then every document encoded with it: per-doc
    whitespace-token vs BPE-token counts — the fertility statistic
    tokenizer work optimizes.  20 merges on the fixture vocabulary
    leave partial subword splits, so the ratio is non-degenerate.
    Training is deterministic (lexicographic tie-breaks), pinned by
    the sf0.01 golden + closed-form tests in tests/test_bpe.py."""
    from ..operators.bpe import bpe_encode, train_bpe

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(docs, n_merges=20)
    enc = bpe_encode(docs, merges)
    return enc.select("doc_id", "n_bpe_tokens").join(
        docs.select(
            "doc_id",
            F.size(F.split(F.col("text"), " ")).cast("long").alias(
                "n_words"
            ),
        ),
        "doc_id",
    )


@query("doc_compression_signals")  # stdlib zlib: rows-only (golden)
def doc_compression_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document zlib compression ratio (operators/quality.py —
    the RedPajama-v2 boilerplate/junk signal): Arrow-batched stdlib
    deflate at pinned level 6, so the value is a pure function of the
    text.  No DuckDB zlib — pinned by the sf0.01 golden + planted
    monotonicity tests in tests/test_quality.py."""
    from ..operators.quality import compression_signals

    return compression_signals(load_table(spark, sf_dir, "documents"))


_REPETITION_ORACLE = """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS tk,
             list_filter(string_split(text, chr(10)),
                         x -> trim(x) <> '') AS rl
      FROM documents
    ),
    base AS (
      SELECT doc_id,
         CASE WHEN len(rl) > 0
              THEN CAST(len(rl) - len(list_distinct(rl)) AS DOUBLE)
                   / len(rl)
              ELSE 0.0 END AS dup_line_frac,
         CASE WHEN len(tk) >= 2
              THEN list_transform(range(1, len(tk)),
                                  i -> tk[i] || ' ' || tk[i+1])
              ELSE CAST([] AS VARCHAR[]) END AS grams
      FROM t
    ),
    occ AS (SELECT doc_id, unnest(grams) AS g FROM base),
    pg AS (SELECT doc_id, g, COUNT(*) AS c FROM occ GROUP BY 1, 2),
    st AS (SELECT doc_id, SUM(c) AS tot, COUNT(*) AS dis, MAX(c) AS mx
           FROM pg GROUP BY 1)
    SELECT b.doc_id, b.dup_line_frac,
      CASE WHEN st.tot > 0
           THEN CAST(st.tot - st.dis AS DOUBLE) / st.tot ELSE 0.0 END
          AS dup_ngram_frac,
      CASE WHEN st.tot > 0
           THEN CAST(st.mx AS DOUBLE) / st.tot ELSE 0.0 END
          AS top_ngram_frac
    FROM base b LEFT JOIN st USING (doc_id)
"""


@query("doc_repetition_signals", _REPETITION_ORACLE)
def doc_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document (Rae et al.
    2021 §A1.1): duplicate-line fraction, duplicate-2-gram occurrence
    fraction, top-2-gram share.  One explode + two-level aggregation
    for the n-gram multiset (functions/text.with_repetition_signals).

    Oracled since r8: the Spark side counts xxhash64 2-gram
    FINGERPRINTS while the oracle counts literal 2-grams — identical
    distinct/max/total statistics unless xxhash64 collides within one
    document (≪ 2^-40 at fixture gram counts; the
    doc_exact_substring_dedup literal-vs-rolled precedent).  All three
    fractions are single IEEE divisions of exact integer counts."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = T.with_repetition_signals(docs, n=2)
    return out.select(
        "doc_id", "dup_line_frac", "dup_ngram_frac", "top_ngram_frac"
    )


@query("doc_domain_mixture")  # xxhash sampling coin: rows-only (golden)
def doc_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing audit table (mT5 §3.1 temperature sampling,
    α=0.5): per-source natural token mass, target weight, realized
    down-sampling keep-rate, and the deterministic sample's size
    (operators/mixing.py).  Sources are a bounded set, so weight math
    is driver-side by design; sampling is a per-row hash coin."""
    from ..operators.mixing import mixture_plan

    docs = load_table(spark, sf_dir, "documents")
    return mixture_plan(docs, alpha=0.5)


@query("dedup_incremental_lsh")  # xxhash64 signatures: rows-only (golden)
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingest dedup (operators/dedup.minhash_index +
    minhash_lsh_pairs_incremental): even doc_ids play the persisted
    signature index, odd doc_ids the incoming batch.  Emits exactly
    the full-batch pairs touching >=1 new doc — pinned against the
    batch path in tests/test_operators.py — while the expensive
    text→signature stage runs only over the new batch.  At 100 TB the
    index side reads 512 B/doc of signatures instead of re-shingling
    the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    index = D.minhash_index(docs.filter(F.col("doc_id") % 2 == 0))
    return D.minhash_lsh_pairs_incremental(
        docs.filter(F.col("doc_id") % 2 == 1), index, threshold=0.35
    )


@query("doc_semantic_dedup")  # kmeans centroids: rows-only (golden)
def doc_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup (operators/semdedup.py, Abbas et al.
    2023): k-means cells → intra-cell cosine pairs → keep the
    least-centroid-similar member per duplicate cluster.  Iterative
    k-means has no DuckDB oracle; pinned by the sf0.01 golden hash +
    planted/property tests in tests/test_semdedup.py.  cent_cos is
    rounded to 6dp so the golden hash is robust to last-ulp float
    aggregation noise in the centroid means."""
    e = load_table(spark, sf_dir, "embeddings")
    out = SD.semantic_dedup(e, n_cells=8, threshold=0.4)
    return out.select(
        "id", "cell", "cluster",
        F.round(F.col("cent_cos"), 6).alias("cent_cos"), "keep",
    )


def _leakage_oracle_sql() -> str:
    from ..operators.splits import split_case_sql

    case = split_case_sql({"train": 0.8, "val": 0.1, "test": 0.1},
                          "doc_id", seed=7)
    return f"""
    WITH {_SHINGLE_PAIRS_CTES},
    pairs AS (
        SELECT id_a, id_b FROM inter
        WHERE CAST(n_inter AS DOUBLE)
              / CAST(n_a + n_b - n_inter AS DOUBLE) >= 0.1
    ),
    sp AS (SELECT doc_id AS id, {case} AS split FROM documents)
    SELECT least(sa.split, sb.split) AS split_lo,
           greatest(sa.split, sb.split) AS split_hi,
           least(sa.split, sb.split) <> greatest(sa.split, sb.split)
             AS is_leak,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs
    JOIN sp sa ON sa.id = pairs.id_a
    JOIN sp sb ON sb.id = pairs.id_b
    GROUP BY 1, 2, 3
    """


@query("split_leakage_counts", _leakage_oracle_sql())
def split_leakage_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test LEAKAGE AUDIT: near-duplicate document pairs
    (3-gram Jaccard ≥ 0.1, the oracled dedup_ngram_jaccard candidate
    set) bucketed by the split pair they straddle under the production
    80/10/10 hash split (doc_split_counts' exact assignment, seed 7).
    Rows with is_leak=true are evaluation contamination — the check a
    pipeline must run BEFORE shipping a split (deduplicate-then-split,
    or re-assign by near-dup cluster rather than by document).

    Scale: the pair set is the capped shingle equi-join (already
    linear by the stop-shingle df cap); split assignment is a per-row
    hash coin, a PURE FUNCTION of the id — so it is evaluated directly
    on the pair rows (r6: the previous two re-attach joins against an
    assigned documents table shuffled the pair set twice for values a
    projection computes for free; every pair id exists in documents by
    construction, so the inner joins were semantically the identity).
    Output is bounded at |splits|² rows."""
    from ..operators.splits import assign_split

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.shingle_pairs_jaccard(
        docs, block_cols=["source"], k=3, threshold=0.1
    ).select("id_a", "id_b")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    joined = assign_split(
        assign_split(pairs, w, id_col="id_a", seed=7, out_col="sa"),
        w, id_col="id_b", seed=7, out_col="sb",
    )
    lo = F.least(F.col("sa"), F.col("sb"))
    hi = F.greatest(F.col("sa"), F.col("sb"))
    return (
        joined.select(lo.alias("split_lo"), hi.alias("split_hi"))
        .groupBy("split_lo", "split_hi")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "split_lo",
            "split_hi",
            (F.col("split_lo") != F.col("split_hi")).alias("is_leak"),
            "n_pairs",
        )
    )


@query("image_near_dup_from_docs")  # synthesized PNGs: rows-only (golden)
def image_near_dup_from_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal dedup END-TO-END on the driver fixtures: synthesize a
    deterministic 16×16 grayscale PNG per document — pixel bytes are a
    sha256 stretch of the text's md5 fingerprint (the exact-dedup
    normalization, ``functions.text.fingerprint``), so byte-identical
    normalized texts yield byte-identical images and unrelated texts
    yield independent pseudo-random ones — then run the REAL image
    pipeline: stdlib PNG encode → decode → DCT pHash → chunk-blocked
    hamming join (``multimodal.image_near_dup_pairs``).

    Every 20th doc additionally emits a PERTURBED copy (two pixel
    bytes bit-flipped, id offset by 10^9) so the near-dup radius — not
    just hamming-0 identity — is exercised: the planted copy's pHash
    lands within the join radius while unrelated pseudo-random images
    pair within hamming 3 with probability ~4e4/2^64 (the fixtures
    hold no exact-duplicate texts at small SF, so without planting the
    result would be trivially empty).  Pinned by the sf0.01 golden
    hash; rows-only.  Scale shape: one Arrow-batched map per doc
    (payload synthesis + hash), then the shared capped hamming join —
    no shuffle carries image bytes, only 64-bit hashes.
    `spread_for_cpu`: the PNG-synthesis/decode/pHash map runs in the
    scan stage, and a small corpus arrives as one split (r6 A/B
    best-of-4 at sf0.1: 1.28 → 0.95 s)."""
    from ..operators.skew import spread_for_cpu

    docs = spread_for_cpu(
        load_table(spark, sf_dir, "documents")
    ).select("doc_id", "text")

    def gen(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        from ..functions.codecs import encode_png

        for pdf in batches:
            ids, payloads = [], []
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                fp = hashlib.md5(
                    (t or "").lower().strip().encode()
                ).digest()
                raw = b"".join(
                    hashlib.sha256(fp + bytes([j])).digest()
                    for j in range(8)
                )
                img = np.frombuffer(raw, dtype=np.uint8).reshape(16, 16)
                ids.append(int(i))
                payloads.append(encode_png(img))
                if int(i) % 20 == 0:  # planted near-dup copy
                    noisy = bytearray(raw)
                    noisy[0] ^= 1
                    noisy[100] ^= 2
                    ids.append(int(i) + 1_000_000_000)
                    payloads.append(
                        encode_png(
                            np.frombuffer(
                                bytes(noisy), dtype=np.uint8
                            ).reshape(16, 16)
                        )
                    )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    from ..operators.multimodal import image_near_dup_pairs

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    return image_near_dup_pairs(media, decoder="auto", max_hamming=3)


@query("audio_near_dup_from_docs")  # synthesized WAVs: rows-only (golden)
def audio_near_dup_from_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio dedup END-TO-END on the driver fixtures: synthesize a
    deterministic 2048-sample mono clip per document (samples are a
    sha256 stretch of the text's md5 fingerprint, mapped to [-1, 1] —
    a pure function of the text), WAV-encode it, then run the REAL
    audio pipeline: stdlib WAV decode → framed-FFT energy-delta
    fingerprint → chunk-blocked hamming join with the degenerate-value
    guard (``multimodal.audio_near_dup_pairs``).

    Every 20th doc emits a perturbed copy (a few samples nudged, id
    offset 10^9) so the near-dup radius is exercised; unrelated
    pseudo-random clips pair within hamming 3 with probability
    ~4e4/2^64.  Rows-only, pinned by the sf0.01 golden hash."""
    from ..operators.multimodal import audio_near_dup_pairs
    from ..operators.skew import spread_for_cpu

    docs = spread_for_cpu(
        load_table(spark, sf_dir, "documents")
    ).select("doc_id", "text")

    def gen(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        from ..functions.codecs import encode_wav

        for pdf in batches:
            ids, payloads = [], []
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                fp = hashlib.md5(
                    (t or "").lower().strip().encode()
                ).digest()
                raw = b"".join(
                    hashlib.sha256(fp + bytes([j])).digest()
                    for j in range(64)
                )
                samples = (
                    np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
                    - 128.0
                ) / 128.0
                ids.append(int(i))
                payloads.append(encode_wav(samples, 8000))
                if int(i) % 20 == 0:  # planted near-dup copy
                    noisy = samples.copy()
                    noisy[::512] *= 0.9
                    ids.append(int(i) + 1_000_000_000)
                    payloads.append(encode_wav(noisy, 8000))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    return audio_near_dup_pairs(media, decoder="auto", max_hamming=3)


@query("video_near_dup_from_docs")  # fake-decoder path: rows-only (golden)
def video_near_dup_from_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video dedup END-TO-END on the driver fixtures: synthesize a
    deterministic 1024-byte payload per document (sha256 stretch of
    the text fingerprint; 8 frames at 1000 ms), every 20th doc adding
    a CLIPPED copy (front 768 bytes, 6000 ms → identical slice
    boundaries, id offset 10^9), then the frame-set overlap join with
    the ubiquitous-frame guard (``multimodal.video_near_dup_pairs``,
    ``max_frame_df``).  The decode step is the documented fake-decoder
    boundary (frame hashes of byte slices); the Spark-side pipeline —
    schema, distinct frame sets, capped equi-join, overlap scoring —
    is fully real.  Emits (id_a, id_b, n_shared, overlap); rows-only,
    pinned by the sf0.01 golden hash."""
    from ..operators.multimodal import video_near_dup_pairs
    from ..operators.skew import spread_for_cpu

    docs = spread_for_cpu(
        load_table(spark, sf_dir, "documents")
    ).select("doc_id", "text")

    def gen(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, kinds, payloads, metas = [], [], [], []
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                fp = hashlib.md5(
                    (t or "").lower().strip().encode()
                ).digest()
                raw = b"".join(
                    hashlib.sha256(fp + bytes([j])).digest()
                    for j in range(32)
                )
                ids.append(int(i))
                kinds.append("video")
                payloads.append(raw)
                metas.append({"mime": None, "width": None,
                              "height": None, "duration_ms": 8000})
                if int(i) % 20 == 0:  # planted clipped copy
                    ids.append(int(i) + 1_000_000_000)
                    kinds.append("video")
                    payloads.append(raw[:768])
                    metas.append({"mime": None, "width": None,
                                  "height": None, "duration_ms": 6000})
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads,
                 "meta": metas}
            )

    media = docs.mapInPandas(
        gen,
        "media_id long, kind string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:int>",
    )
    return video_near_dup_pairs(
        media, every_ms=1000, threshold=0.5, decoder="fake"
    )


@query("video_real_webm_frames")  # real VP8-in-WebM: rows-only (golden)
def video_real_webm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-codec video pipeline end-to-end on the driver fixtures: a
    1-in-97 document sample (the native VP8 encode costs ~3.6 ms per
    16x16 frame, so sampling bounds the synthesis at every SF: 6 docs
    at the 500-doc fixtures, 52 at sf0.1) each
    becomes a genuine WebM video — three deterministic 16x16 frames
    derived from the text fingerprint, encoded by the repo's own
    minimal VP8 intra encoder (``codec_vp8_enc``, libwebp-verified)
    and muxed by ``container_webm`` — then flows through the REAL
    ``sample_video_frames`` path: EBML demux, seek-to-latest-keyframe,
    native VP8 decode, PNG re-encode, md5 frame hash.  Every 4th
    sampled doc additionally emits a CLIPPED copy (first two frames,
    id offset 10^9), visible in the output as identical frame hashes
    under two media ids — the signal video dedup keys on.

    Rows-only (media_id, frame_ts_ms, frame_hash — scalar columns),
    pinned by the sf0.01 golden hash.  Scale shape: one Arrow-batched
    map per sampled doc (encode+mux), one more for demux+decode; only
    ~KB payloads and 32-char hashes move, and the 1/97 sample keeps
    the python-worker CPU bounded (~0.7 s of spread CPU at sf0.1)."""
    from ..operators.multimodal import sample_video_frames
    from ..operators.skew import spread_for_cpu

    docs = (
        spread_for_cpu(load_table(spark, sf_dir, "documents"))
        .filter(F.col("doc_id") % 97 == 0)
        .select("doc_id", "text")
    )

    def gen(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        from ..functions.codec_vp8_enc import encode_vp8
        from ..functions.container_webm import mux_webm_vp8

        def frames_for(fp: bytes) -> list:
            out = []
            for j in range(3):
                raw = b"".join(
                    hashlib.sha256(fp + bytes([j, k])).digest()
                    for k in range(8)
                )
                y = np.frombuffer(raw, dtype=np.uint8).reshape(16, 16)
                u = np.frombuffer(
                    hashlib.sha256(fp + bytes([j, 64])).digest()
                    + hashlib.sha256(fp + bytes([j, 65])).digest(),
                    dtype=np.uint8,
                ).reshape(8, 8)
                v = np.frombuffer(
                    hashlib.sha256(fp + bytes([j, 66])).digest()
                    + hashlib.sha256(fp + bytes([j, 67])).digest(),
                    dtype=np.uint8,
                ).reshape(8, 8)
                out.append(encode_vp8(y, u, v, qi=20))
            return out

        for pdf in batches:
            ids, kinds, payloads, metas = [], [], [], []
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                fp = hashlib.md5(
                    (t or "").lower().strip().encode()
                ).digest()
                vf = frames_for(fp)
                ids.append(int(i))
                kinds.append("video")
                payloads.append(
                    mux_webm_vp8(vf, 16, 16, frame_duration_ms=100)
                )
                metas.append({"mime": "video/webm", "width": 16,
                              "height": 16, "duration_ms": 300})
                if (int(i) // 97) % 4 == 0:    # planted clipped copy
                    ids.append(int(i) + 1_000_000_000)
                    kinds.append("video")
                    payloads.append(
                        mux_webm_vp8(vf[:2], 16, 16,
                                     frame_duration_ms=100)
                    )
                    metas.append({"mime": "video/webm", "width": 16,
                                  "height": 16, "duration_ms": 200})
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads,
                 "meta": metas}
            )

    media = docs.mapInPandas(
        gen,
        "media_id long, kind string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:int>",
    )
    return sample_video_frames(media, every_ms=100, decoder="auto")
