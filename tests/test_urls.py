"""URL canonicalization / domain curation (operators/urls.py,
plans/url_curation.py)."""
from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from org_revue_de_presse_trends_spark.operators import urls as U

#: handcrafted raw URLs exercising every canonicalization rule, plus
#: the registrable-domain edge cases
CASES = [
    # (raw, canonical, registrable_domain)
    (
        "HTTPS://WWW.News.Src1.ORG:443/articles//7/"
        "?utm_source=src1&utm_campaign=trends&id=0#s2",
        "https://news.src1.org/articles/7?id=0",
        "src1.org",
    ),
    ("https://a.b.co.uk/x?b=2&a=1", "https://a.b.co.uk/x?a=1&b=2",
     "b.co.uk"),
    ("http://host.com:80/p", "http://host.com/p", "host.com"),
    # non-default port KEPT; scheme-mismatched default port KEPT
    ("http://host.com:8080/p", "http://host.com:8080/p", "host.com"),
    ("http://host.com:443/p", "http://host.com:443/p", "host.com"),
    # utm-only query drops the '?' entirely
    ("https://h.org/a?utm_source=x&fbclid=9", "https://h.org/a",
     "h.org"),
    # no query, trailing slash, slash runs
    ("https://h.org/a/b///c/", "https://h.org/a/b/c", "h.org"),
    # root path '/' is preserved, fragment stripped
    ("https://h.org/#top", "https://h.org/", "h.org"),
    # single-label host and bare two-label host
    ("https://localhost/x", "https://localhost/x", "localhost"),
    ("https://www.example.com/", "https://example.com/", "example.com"),
    # param whose NAME merely contains (not starts with) utm_ stays;
    # value containing 'utm_' stays
    ("https://h.org/a?xutm_k=1&id=utm_z", "https://h.org/a?id=utm_z&xutm_k=1",
     "h.org"),
]


@pytest.fixture(scope="module")
def canon_df(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"raw_url": [c[0] for c in CASES]})
    )
    rows = (
        U.with_canonical_url(df, "raw_url")
        .select("raw_url", "canonical_url", "registrable_domain")
        .collect()
    )
    return {r["raw_url"]: r for r in rows}


def test_canonicalization_cases_spark(canon_df):
    for raw, want_canon, want_dom in CASES:
        got = canon_df[raw]
        assert got["canonical_url"] == want_canon, raw
        assert got["registrable_domain"] == want_dom, raw


def test_canonicalization_cross_engine(duck):
    """The DuckDB rendering of the SAME stages must produce identical
    canonical forms and registrable domains on every edge case — this
    is what makes the oracled queries trustworthy."""
    duck.execute("CREATE OR REPLACE TEMP TABLE _urls(raw_url VARCHAR)")
    duck.executemany(
        "INSERT INTO _urls VALUES (?)", [(c[0],) for c in CASES]
    )
    cte = U.canonical_cte_sql("_urls", "raw_url")
    got = duck.execute(
        f"WITH {cte} SELECT raw_url, canonical_url, registrable_domain "
        "FROM canon"
    ).fetchall()
    by_raw = {r[0]: r for r in got}
    for raw, want_canon, want_dom in CASES:
        assert by_raw[raw][1] == want_canon, raw
        assert by_raw[raw][2] == want_dom, raw
    duck.execute("DROP TABLE _urls")


def test_canonicalization_idempotent(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) — a canonical
    form must be a fixed point (no '?'-less fragment resurrection, no
    double-strip of ports)."""
    df = spark.createDataFrame(
        pd.DataFrame({"raw_url": [c[0] for c in CASES]})
    )
    once = U.with_canonical_url(df, "raw_url").select(
        F.col("canonical_url").alias("u1")
    )
    twice = U.with_canonical_url(once, "u1").select(
        "u1", F.col("canonical_url").alias("u2")
    )
    for r in twice.collect():
        assert r["u1"] == r["u2"], r["u1"]


def test_synth_url_cross_engine(spark, duck):
    """The synthesized raw URL is bit-identical between engines for
    every document (it feeds three oracled queries)."""
    sf = "/root/testdata/sf0.001"
    from org_revue_de_presse_trends_spark.catalog import load_table

    got_s = {
        r["doc_id"]: r["u"]
        for r in load_table(spark, sf, "documents")
        .select("doc_id", U.synth_url("spark").alias("u"))
        .collect()
    }
    got_d = dict(
        duck.execute(
            f"SELECT doc_id, {U.synth_url_sql('duckdb')} AS u "
            f"FROM '{sf}/documents.parquet'"
        ).fetchall()
    )
    assert got_s == got_d


def test_planted_variants_collapse(spark):
    """Two raw spellings of one logical URL collapse to one canonical
    form while a genuinely different page stays distinct."""
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "raw_url": [
                    "https://www.site.com/a?id=1&utm_source=feed",
                    "HTTPS://site.com:443/a/?id=1#frag",
                    "https://site.com/a?id=2",
                ]
            }
        )
    )
    out = (
        U.with_canonical_url(df, "raw_url")
        .groupBy("canonical_url")
        .count()
        .collect()
    )
    counts = {r["canonical_url"]: r["count"] for r in out}
    assert counts == {
        "https://site.com/a?id=1": 2,
        "https://site.com/a?id=2": 1,
    }


def test_blocklist_inherits_to_subdomains(spark):
    """blocked_domain_sql keys on the registrable domain: a blocked
    domain's subdomain rows carry the same verdict."""
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "raw_url": [
                    "https://evil.com/x",
                    "https://cdn.static.evil.com/y",
                ]
            }
        )
    )
    out = (
        U.with_canonical_url(df, "raw_url")
        .select(
            F.expr(
                U.blocked_domain_sql("spark", "registrable_domain", 1)
            ).alias("b")
        )
        .collect()
    )
    # modulus 1 blocks everything — both rows agree; the real point is
    # both rows derive the SAME registrable domain
    assert [r["b"] for r in out] == [True, True]
    doms = (
        U.with_canonical_url(df, "raw_url")
        .select("registrable_domain")
        .collect()
    )
    assert {r["registrable_domain"] for r in doms} == {"evil.com"}


def test_robots_longest_prefix_semantics(spark):
    """RFC 9309 §2.2.2: most specific (longest) rule wins; allow wins
    length ties; URLs with no matching rule default to allowed."""
    import pandas as pd
    from pyspark.sql import functions as F

    urls = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "registrable_domain": [
                    "a.com", "a.com", "a.com", "b.com", "a.com",
                ],
                "canonical_path": ["/x/y", "/x/z", "/q", "/x/y", ""],
            }
        )
    )
    rules = spark.createDataFrame(
        pd.DataFrame(
            {
                "dom": ["a.com", "a.com", "a.com", "a.com"],
                "prefix": ["/x", "/x/y", "/q", "/q"],
                "allow": [False, True, False, True],
                "rid": [0, 1, 2, 3],
            }
        )
    )
    got = {
        r["doc_id"]: r["allowed"]
        for r in U.robots_verdicts(urls, rules, ["doc_id"]).collect()
    }
    assert got == {
        1: True,   # /x/y: longest match '/x/y' allow beats '/x' deny
        2: False,  # /x/z: only '/x' deny matches
        3: True,   # /q: equal-length deny+allow -> allow wins the tie
        4: True,   # b.com has no rules -> RFC default allow
        5: True,   # pathless URL ('' matches NO prefix, not even '/')
                   # -> RFC default allow; the audit ORACLE must mirror
                   # this with LEFT JOIN + COALESCE, never INNER
    }
