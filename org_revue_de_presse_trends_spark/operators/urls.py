"""URL canonicalization and domain curation (C4 / RefinedWeb-style
web-corpus hygiene — Raffel et al. 2020 §2.2, Penedo et al. 2023 §3.1;
public recipes).

Three primitives a web-scale curation pipeline needs before any
text-level dedup:

- **canonicalize_url** — fragment strip, scheme+host lowercase,
  ``www.`` strip, default-port strip (``:443``/``:80`` matched to the
  scheme; non-default ports KEPT), slash-run collapse, trailing-slash
  strip, tracking-parameter removal (``utm_*``/``fbclid``/``gclid``/
  ``ref``) and deterministic (lexicographic) ordering of the surviving
  query parameters.  Two raw URLs that differ only in noise a crawler
  introduces map to one canonical form; scheme and non-default ports
  are deliberately NOT unified (http and https may serve different
  content).
- **registrable_domain** — the label group a blocklist or per-site cap
  keys on, extracted with the FULL vendored public-suffix list
  (``operators/psl.py``: 9.5k rules incl. wildcard and exception
  semantics, rendered as one engine-independent CASE/IN ladder over
  staged label tails — measured faster than the broadcast-join
  alternative and identical text in both engines).  Hosts that are
  themselves public suffixes fall back to the host so the column
  stays total.
- **synthesized raw URLs** — the driver fixtures carry no URL column,
  so the queries synthesize one per document as a PURE function of
  (doc_id, source): md5-derived noise bits toggle case, ``www.``,
  default ports, slash runs, trailing slashes, tracking params, param
  order and fragments, while the canonical identity rides on small
  doc_id residues so canonical collisions actually occur at test SFs.

Every builder renders BOTH engines (Spark SQL and DuckDB SQL) from one
template, so each registered query and its oracle cannot drift: the
engine differences are confined to the ``_ENG`` table (cast name,
array function names, regexp_replace replace-all flag, list indexing,
regex-vs-literal split).

Scale shape (100 TB): everything here is a per-row projection followed
by bounded groupBys (canonical key / registrable domain / source) —
map-side combinable, no joins, no windows except the per-domain cap's
row_number over (domain), whose partitions are bounded by the per-site
cap target itself.  All expressions are single parsed ``F.expr``
strings (the plan-build py4j tax lesson, CLAUDE.md).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import psl

#: query parameters dropped by canonicalization: exact names, plus the
#: ``utm_`` prefix family
TRACKING_EXACT = ("fbclid", "gclid", "ref")


def _eng(engine: str) -> dict:
    """Engine-specific SQL fragments.  Spark's split() takes a REGEX
    (the dot must be escaped); DuckDB's string_split is literal.
    DuckDB's regexp_replace replaces the first match unless the 'g'
    flag is passed; Spark always replaces all."""
    if engine == "spark":
        return {
            "str": "STRING",
            "split_dot": lambda s: f"split({s}, '\\\\.')",
            "split_amp": lambda s: f"split({s}, '&')",
            "arr_n": lambda a: f"size({a})",
            "re_all": lambda s, p, r: f"regexp_replace({s}, '{p}', '{r}')",
            "filter_sort_join": lambda a, cond: (
                f"array_join(array_sort(filter({a}, p -> {cond})), '&')"
            ),
            # last-k-labels tail, NULL when the host is shorter
            "tail_join": lambda a, k: (
                f"CASE WHEN _ln >= {k}"
                f" THEN array_join(slice({a}, -{k}, {k}), '.') END"
            ),
        }
    if engine == "duckdb":
        return {
            "str": "VARCHAR",
            "split_dot": lambda s: f"string_split({s}, '.')",
            "split_amp": lambda s: f"string_split({s}, '&')",
            "arr_n": lambda a: f"len({a})",
            "re_all": lambda s, p, r: (
                f"regexp_replace({s}, '{p}', '{r}', 'g')"
            ),
            # DuckDB's array_to_string([]) is NULL where Spark's
            # array_join([]) is '' — coalesce pins the Spark semantics
            "filter_sort_join": lambda a, cond: (
                f"coalesce(array_to_string(list_sort(list_filter({a}, "
                f"p -> {cond})), '&'), '')"
            ),
            "tail_join": lambda a, k: (
                f"CASE WHEN _ln >= {k} THEN array_to_string("
                f"list_slice({a}, _ln - {k} + 1, _ln), '.') END"
            ),
        }
    raise ValueError(f"unknown engine: {engine}")


def md5_bucket_sql(engine: str, expr: str, hex_chars: int = 6) -> str:
    """Base-16 value of the first ``hex_chars`` md5 hex chars of
    ``expr`` — the repo's cross-engine string hash (operators/dsir.
    bucket_of recipe; DuckDB has no conv())."""
    if engine == "spark":
        return (
            f"CAST(conv(substring(md5({expr}), 1, {hex_chars}), 16, 10)"
            " AS BIGINT)"
        )
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({expr}), {i}, 1)) - 1)"
        f" * CAST({16 ** (hex_chars - i)} AS BIGINT)"
        for i in range(1, hex_chars + 1)
    )
    return f"({terms})"


def synth_url_sql(engine: str) -> str:
    """Deterministic raw URL per documents row (pure function of
    doc_id + source).  Canonical identity = (source, doc_id residues
    mod 3/5/10/2); every other component is md5-derived noise that
    canonicalization must remove."""
    e = _eng(engine)
    b6 = md5_bucket_sql(engine, f"CAST(doc_id AS {e['str']})")
    s = e["str"]
    return f"""
    CASE WHEN {b6} % 11 = 0 THEN 'HTTPS' ELSE 'https' END || '://' ||
    CASE WHEN {b6} % 7 = 0
         THEN upper(
           CASE WHEN {b6} % 5 = 0 THEN 'www.' ELSE '' END ||
           CASE WHEN doc_id % 5 = 0 THEN 'news.' ELSE '' END ||
           lower(source) || '.' ||
           CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                ELSE 'co.uk' END)
         ELSE
           CASE WHEN {b6} % 5 = 0 THEN 'www.' ELSE '' END ||
           CASE WHEN doc_id % 5 = 0 THEN 'news.' ELSE '' END ||
           lower(source) || '.' ||
           CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                ELSE 'co.uk' END
    END ||
    CASE WHEN {b6} % 9 = 0 THEN ':443' ELSE '' END ||
    '/articles' ||
    CASE WHEN {b6} % 17 = 0 THEN '//' ELSE '/' END ||
    CAST(doc_id % 10 AS {s}) ||
    CASE WHEN {b6} % 6 = 0 THEN '/' ELSE '' END ||
    CASE WHEN {b6} % 2 = 0 THEN
      CASE WHEN {b6} % 3 = 0
           THEN '?id=' || CAST(doc_id % 2 AS {s}) ||
                '&utm_source=' || lower(source) || '&utm_campaign=trends'
           ELSE '?utm_source=' || lower(source) ||
                '&utm_campaign=trends&id=' || CAST(doc_id % 2 AS {s})
      END
      ELSE '?id=' || CAST(doc_id % 2 AS {s})
    END ||
    CASE WHEN {b6} % 8 = 0 THEN '#s' || CAST({b6} % 3 AS {s})
         ELSE '' END
    """


def canonical_url_stages(engine: str, url_col: str) -> list[tuple[str, str]]:
    """The canonicalization as (name, sql) stages over ``url_col``,
    each referencing only earlier stages — Spark materializes them as
    withColumn projection boundaries, DuckDB as chained CTE columns.
    Final stage is named ``canonical_url``."""
    e = _eng(engine)
    # a parameter is dropped when its NAME is utm_* or an exact
    # tracking name; p is 'name=value'
    name = "split_part(p, '=', 1)"
    drop = (
        f"substr({name}, 1, 4) = 'utm_' OR "
        + " OR ".join(f"{name} = '{t}'" for t in TRACKING_EXACT)
    )
    keep = f"p <> '' AND NOT ({drop})"
    # the registrable domain ignores any KEPT (non-default) port
    labels = e["split_dot"]("split_part(_host, ':', 1)")
    n = e["arr_n"]("_lbl")
    return [
        ("_nofrag", f"split_part({url_col}, '#', 1)"),
        ("_base", "split_part(_nofrag, '?', 1)"),
        ("_q", "split_part(_nofrag, '?', 2)"),
        ("_scheme", "lower(split_part(_base, '://', 1))"),
        ("_rest", "split_part(_base, '://', 2)"),
        ("_hp", "lower(split_part(_rest, '/', 1))"),
        ("_path0", "substr(_rest, length(split_part(_rest, '/', 1)) + 1)"),
        (
            "_hostp",
            "CASE WHEN _scheme = 'https' AND _hp LIKE '%:443'"
            "       THEN substr(_hp, 1, length(_hp) - 4)"
            "     WHEN _scheme = 'http' AND _hp LIKE '%:80'"
            "       THEN substr(_hp, 1, length(_hp) - 3)"
            "     ELSE _hp END",
        ),
        (
            "_host",
            "CASE WHEN substr(_hostp, 1, 4) = 'www.'"
            " THEN substr(_hostp, 5) ELSE _hostp END",
        ),
        (
            "_path",
            "CASE WHEN {c} <> '/' AND {c} LIKE '%/'"
            " THEN substr({c}, 1, length({c}) - 1) ELSE {c} END".format(
                c=e["re_all"]("_path0", "/{2,}", "/")
            ),
        ),
        (
            "_qc",
            e["filter_sort_join"](e["split_amp"]("_q"), keep),
        ),
        ("_lbl", labels),
        ("_ln", n),
        # k-label tails feeding the public-suffix ladder (NULL when
        # the host is shorter than k; a NULL tail fails its IN test)
        *[
            (f"_s{k}", e["tail_join"]("_lbl", k))
            for k in range(1, psl.MAX_TAIL + 1)
        ],
        # public-suffix label count via the full vendored PSL —
        # exceptions, wildcards, and 2-5-label plain rules; the ladder
        # text is engine-independent (CASE/IN only)
        ("_psl", psl.public_suffix_labels_sql()),
        (
            "registrable_domain",
            psl.registrable_sql("split_part(_host, ':', 1)"),
        ),
        # canonical path survives as an output column (robots-style
        # path rules match on it)
        ("canonical_path", "_path"),
        (
            "canonical_url",
            "_scheme || '://' || _host || canonical_path ||"
            " CASE WHEN _qc = '' THEN '' ELSE '?' || _qc END",
        ),
    ]


def with_canonical_url(df, url_col: str):
    """Spark side: stage the canonicalization as withColumn projection
    boundaries; adds ``canonical_url`` and ``registrable_domain``,
    drops the intermediates."""
    out = df
    inter = []
    for name, sql in canonical_url_stages("spark", url_col):
        out = out.withColumn(name, F.expr(sql))
        if name.startswith("_"):
            inter.append(name)
    return out.drop(*inter)


def canonical_cte_sql(from_sql: str, url_sql: str) -> str:
    """DuckDB side: one chained-CTE prefix computing canonical_url and
    registrable_domain over ``from_sql`` rows (which must expose the
    raw URL as ``{url_sql}``); ends with a CTE named ``canon``
    selecting the source row plus both derived columns."""
    stages = canonical_url_stages("duckdb", "raw_url")
    ctes = [f"u0 AS (SELECT *, {url_sql} AS raw_url FROM {from_sql})"]
    prev = "u0"
    for i, (name, sql) in enumerate(stages):
        cur = f"u{i + 1}"
        ctes.append(f"{cur} AS (SELECT *, {sql} AS {name} FROM {prev})")
        prev = cur
    # canon is MATERIALIZED: DuckDB otherwise inlines the whole
    # 14-stage chain into every reference, and an oracle that consumes
    # canon more than once (the robots rule derivation references the
    # domain list four times) multiplies the expression tree until the
    # planner hangs — the DuckDB mirror of the Catalyst
    # pushdown-inlining blowup documented in plans/url_curation.py.
    ctes.append(f"canon AS MATERIALIZED (SELECT * FROM {prev})")
    return ",\n".join(ctes)


def blocked_domain_sql(engine: str, domain_expr: str, modulus: int = 7) -> str:
    """Deterministic synthetic blocklist membership: a registrable
    domain is blocked when its md5 bucket ≡ 0 (mod ``modulus``) —
    the cross-engine stand-in for a real blocklist broadcast join.
    Subdomains inherit automatically because the predicate keys on
    the REGISTRABLE domain."""
    return f"{md5_bucket_sql(engine, domain_expr)} % {modulus} = 0"


def synthetic_robots_rules(doms):
    """The deterministic synthetic per-domain rule set shared by
    `url_robots_audit`, its DuckDB oracle (the SQL twin in
    plans/url_curation._ROBOTS_ORACLE — keep both in sync), and the
    600k-row scale smoke: universal default-allow ``/``; md5-bucket
    %3==1 domains deny ``/articles`` with an ``/articles/2`` allow
    carve-out; bucket %3==0 domains deny ``/articles/7``.

    ``doms`` must have one ``dom`` column (distinct registrable
    domains); returns (dom, prefix, allow, rid) ready for
    `robots_verdicts`."""
    b = md5_bucket_sql("spark", "dom")

    def rule(filt, prefix, allow, rid):
        d = doms.filter(F.expr(filt)) if filt else doms
        return d.select(
            "dom",
            F.lit(prefix).alias("prefix"),
            F.lit(allow).alias("allow"),
            F.lit(rid).alias("rid"),
        )

    return (
        rule(None, "/", True, 0)
        .unionByName(rule(f"{b} % 3 = 1", "/articles", False, 1))
        .unionByName(rule(f"{b} % 3 = 1", "/articles/2", True, 2))
        .unionByName(rule(f"{b} % 3 = 0", "/articles/7", False, 3))
    )


def robots_verdicts(
    urls_df,
    rules_df,
    id_cols: list[str],
    domain_col: str = "registrable_domain",
    path_col: str = "canonical_path",
):
    """Longest-prefix robots.txt-style verdict per URL row (the
    crawl-politeness filter C4's Common Crawl input already had
    applied; REP semantics per RFC 9309 §2.2.2: the most specific —
    longest — matching rule wins, allow winning ties).

    ``rules_df`` must have (dom, prefix, allow, rid) with ``rid`` a
    unique tiebreak id.  Rows with no matching rule are allowed (the
    RFC default).  Returns ``urls_df``'s id_cols + ``allowed``.

    Scale shape: a real robots rule set is ~10-100 rules × ~1M
    domains — comfortably a broadcast; candidates are then a
    broadcast-hash join on the domain key, the prefix filter runs
    map-side, and the longest-match argmax is one map-side-combinable
    struct-MAX per URL.  No shuffle carries more than one surviving
    row per URL × matching rule."""
    j = urls_df.join(
        F.broadcast(rules_df),
        (urls_df[domain_col] == rules_df["dom"])
        & F.expr(f"startswith({path_col}, prefix)"),
        "left",
    )
    best = j.groupBy(*id_cols).agg(
        F.max(
            F.struct(
                F.length("prefix").alias("l"),
                F.col("allow"),
                F.col("rid"),
            )
        ).alias("_b")
    )
    return best.select(
        *id_cols,
        F.coalesce(F.col("_b.allow"), F.lit(True)).alias("allowed"),
    )


def synth_url(engine: str = "spark") -> Column | str:
    """The raw-URL synthesis as a Spark Column (engine='spark') or a
    DuckDB SQL string."""
    sql = synth_url_sql(engine)
    return F.expr(sql) if engine == "spark" else sql
