"""URL/domain curation queries (C4 / RefinedWeb-style web-corpus
hygiene; operators/urls.py) — late-registering, past the driver's
50-slot window on purpose (in-repo contract gate still oracle-checks
them; tests/test_driver_contract.py overflow pin).

The fixtures carry no URL column, so each query synthesizes a raw URL
per document as a PURE function of (doc_id, source) — the same move
the media queries use for payloads — with md5-derived noise (case,
``www.``, default ports, slash runs, trailing slashes, tracking
params, param order, fragments) that canonicalization must remove.
Spark expressions and DuckDB oracles render from ONE template
(operators/urls.py), so the pair cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import urls as U
from .registry import query

#: per-registrable-domain document cap for domain_doc_caps
_CAP = 5


def _canon_docs(spark: SparkSession, sf_dir: str, *cols: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", *cols)
    return U.with_canonical_url(
        docs.withColumn("raw_url", U.synth_url("spark")), "raw_url"
    )


def _canon_cte(*cols: str) -> str:
    sel = ", ".join(("doc_id",) + cols)
    return U.canonical_cte_sql(
        f"(SELECT {sel} FROM documents)", U.synth_url_sql("duckdb")
    )


_DEDUP_ORACLE = f"""
    WITH {_canon_cte('source')}
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS keep_id
    FROM canon
    GROUP BY canonical_url
    HAVING COUNT(*) > 1
"""


@query("url_canonical_dedup", _DEDUP_ORACLE)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact URL-level dedup AFTER canonicalization: raw URLs that
    differ only in crawler noise (tracking params, case, ``www.``,
    default ports, slash runs, param order, fragments) collapse to one
    canonical form; groups with >1 document are re-crawls of the same
    page, kept once (min doc_id).

    Scale shape (100 TB): one per-row projection chain (all string
    ops, codegen'd) and one map-side-combinable groupBy on the
    canonical string — the same shape as dedup_exact_docs, whose key
    is a text fingerprint instead.  No joins, no windows."""
    c = _canon_docs(spark, sf_dir, "source")
    return (
        c.groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


_CAPS_ORACLE = f"""
    WITH {_canon_cte('source', 'n_chars')},
    r AS (
        SELECT registrable_domain, n_chars,
               row_number() OVER (
                   PARTITION BY registrable_domain
                   ORDER BY n_chars DESC, doc_id
               ) AS rn
        FROM canon
    )
    SELECT registrable_domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rn <= {_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rn <= {_CAP} THEN n_chars ELSE 0 END)
                AS BIGINT) AS kept_chars
    FROM r
    GROUP BY registrable_domain
"""


@query("domain_doc_caps", _CAPS_ORACLE)
def domain_doc_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-site document caps (RefinedWeb §3.1 / C4 keep-N-per-domain):
    rank each registrable domain's documents by length (n_chars DESC,
    doc_id tiebreak — the unique-id rule for cross-engine total
    order), keep the top {_CAP}, report per-domain kept/dropped mass.

    Scale shape: the window partitions by registrable domain, so one
    mega-site (a single domain can hold billions of pages at 100 TB)
    serializes its partition — the production form is a salted
    two-phase top-K (local top-{_CAP} per partition, then the window
    over ≤ {_CAP}·n_partitions survivors, the operators/topk.py
    discipline); at fixture scale domains hold ~10 docs and the
    direct window is the clearer, oracle-exact form."""
    c = _canon_docs(spark, sf_dir, "source", "n_chars")
    w = Window.partitionBy("registrable_domain").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    kept = F.col("rn") <= _CAP
    return (
        c.withColumn("rn", F.row_number().over(w))
        .groupBy("registrable_domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum(
                F.when(kept, F.col("n_chars")).otherwise(F.lit(0))
            ).alias("kept_chars"),
        )
    )


_BLOCK_ORACLE = f"""
    WITH {_canon_cte('source')}
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN {U.blocked_domain_sql('duckdb',
                                                    'registrable_domain')}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
           CAST(SUM(CASE WHEN {U.blocked_domain_sql('duckdb',
                                                    'registrable_domain')}
                    THEN 0 ELSE 1 END) AS BIGINT) AS n_kept
    FROM canon
    GROUP BY source
"""


_DOM_B6 = U.md5_bucket_sql("duckdb", "dom")

_ROBOTS_ORACLE = f"""
    WITH {_canon_cte('source')},
    doms AS MATERIALIZED (
        SELECT DISTINCT registrable_domain AS dom FROM canon
    ),
    rules AS (
        SELECT dom, '/' AS prefix, true AS allow, 0 AS rid FROM doms
        UNION ALL
        SELECT dom, '/articles', false, 1 FROM doms
        WHERE {_DOM_B6} % 3 = 1
        UNION ALL
        SELECT dom, '/articles/2', true, 2 FROM doms
        WHERE {_DOM_B6} % 3 = 1
        UNION ALL
        SELECT dom, '/articles/7', false, 3 FROM doms
        WHERE {_DOM_B6} % 3 = 0
    ),
    m AS (
        -- LEFT join + default-allow mirrors operators/urls.
        -- robots_verdicts exactly (RFC 9309: a URL matched by NO rule
        -- is allowed): an inner join would silently DROP rows whose
        -- canonical_path matches nothing (e.g. a pathless URL whose
        -- canonical_path is '' — not even the universal '/' rule
        -- matches) while Spark counts them allowed.
        SELECT c.doc_id, c.source, r.allow,
               row_number() OVER (
                   PARTITION BY c.doc_id
                   ORDER BY length(r.prefix) DESC, r.allow DESC,
                            r.rid DESC
               ) AS rn
        FROM canon c
        LEFT JOIN rules r
          ON r.dom = c.registrable_domain
         AND starts_with(c.canonical_path, r.prefix)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(SUM(CASE WHEN COALESCE(allow, true) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_allowed,
           CAST(SUM(CASE WHEN COALESCE(allow, true) THEN 0 ELSE 1 END)
                AS BIGINT) AS n_denied
    FROM m WHERE rn = 1
    GROUP BY source
"""


@query("url_robots_audit", _ROBOTS_ORACLE)
def url_robots_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt-style longest-prefix path filtering audit (RFC 9309
    §2.2.2 precedence: most specific rule wins, allow winning ties):
    per source, how many documents a synthetic per-domain rule set
    (deny ``/articles`` with a carve-out allow ``/articles/2`` on one
    third of domains; deny ``/articles/7`` on another third; plus the
    universal default-allow ``/``) admits to the crawl.

    Scale shape (operators/urls.robots_verdicts): rules broadcast,
    candidates a broadcast-hash join on the registrable domain,
    longest-match argmax one map-side-combinable struct-MAX per URL."""
    c = _canon_docs(spark, sf_dir, "source")
    # The narrow canonical-URL table is MATERIALIZED before the join —
    # an optimizer barrier, not an optimization: joining or filtering
    # directly on canon-derived columns makes Catalyst push inferred
    # predicates (isnotnull on the equi-join key, the md5-bucket rule
    # filters) through all 14 canonicalization Projects, and the
    # substitution multiplies the expression tree by the product of
    # per-stage reference counts (_hp ×7 in the port strip, _lbl ×8 in
    # the domain CASE, the md5 bucket ×15 in the synth ≈ 2500 copies)
    # — plan OPTIMIZATION then hangs for minutes and OOMs a 1 GB
    # driver.  At 100 TB this materialization is the canonical-URL
    # silver table every curation stage shares (canonicalize once,
    # write to the lake, reuse for dedup/caps/blocklist/robots); at
    # fixture scale a localCheckpoint stands in for it.
    urls = c.select(
        "doc_id", "source", "registrable_domain", "canonical_path"
    ).localCheckpoint()
    doms = urls.select(
        F.col("registrable_domain").alias("dom")
    ).distinct()
    rules = U.synthetic_robots_rules(doms)
    v = U.robots_verdicts(urls, rules, id_cols=["doc_id", "source"])
    allowed = F.col("allowed").cast("long")
    return v.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum(allowed).alias("n_allowed"),
        F.sum(F.lit(1) - allowed).alias("n_denied"),
    )


@query("domain_blocklist_audit", _BLOCK_ORACLE)
def domain_blocklist_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-blocklist filtering audit: per source, how many documents
    a registrable-domain blocklist removes.  The blocklist is the
    deterministic md5-bucket stand-in (operators/urls.blocked_domain_
    sql) for a real list; keying on the REGISTRABLE domain makes
    subdomains inherit the block for free — the rule C4's badwords
    filtering and every ads/malware domain list apply.

    Scale shape: at 100 TB the real list (~1M domains) broadcasts and
    the membership test is a broadcast-hash semi-join on the same
    registrable-domain key; the audit aggregation is unchanged.  Here:
    per-row projection + one bounded groupBy(source)."""
    c = _canon_docs(spark, sf_dir, "source")
    blocked = F.expr(
        U.blocked_domain_sql("spark", "registrable_domain")
    ).cast("long")
    return c.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(blocked).alias("n_blocked"),
        F.sum(F.lit(1) - blocked).alias("n_kept"),
    )


_STALENESS_ORACLE = f"""
    WITH {_canon_cte('source', 'text')}
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT md5(lower(trim(text)))) AS BIGINT)
               AS n_variants,
           MIN(doc_id) AS first_id
    FROM canon
    GROUP BY canonical_url
    HAVING COUNT(DISTINCT md5(lower(trim(text)))) > 1
"""


@query("url_content_staleness", _STALENESS_ORACLE)
def url_content_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-crawl divergence audit: canonical URLs whose documents carry
    MORE THAN ONE distinct normalized-text fingerprint — the pages a
    crawler fetched twice and got different content for (cache-busting
    params the canonicalizer correctly ignored, genuine edits, or
    A/B-served content).  The complement of url_canonical_dedup's
    assumption that one canonical URL is one document: a dedup
    pipeline must pick a canonical SNAPSHOT (min doc_id here) for
    these instead of treating members as interchangeable.

    Fingerprint = md5(lower(trim(text))) — the exact-dedup
    normalization (functions/text.fingerprint), identical in DuckDB.
    Scale shape: one projection + one map-side-combinable groupBy on
    the canonical string; COUNT(DISTINCT fp) shuffles one row per
    (url, fp), bounded by the corpus."""
    c = _canon_docs(spark, sf_dir, "source", "text")
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    return (
        c.groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(fp).alias("n_variants"),
            F.min("doc_id").alias("first_id"),
        )
        .filter(F.col("n_variants") > 1)
    )
