"""Public-suffix-list registrable domains (operators/psl.py) — the
official publicsuffix.org checkPublicSuffix vectors against the Python
reference, and Spark↔DuckDB↔Python three-way equality of the rendered
ladder (the r8 verdict item 5 'pinned in both engines' gate)."""
from __future__ import annotations

import pytest

from org_revue_de_presse_trends_spark.operators import psl, urls as U

#: the publicsuffix.org test_psl.txt battery (public domain, Rob
#: Stradling / Comodo), lowercase ASCII subset — punycode/IDN vectors
#: are out of scope (hosts reach the ladder lowercase-unicode, see the
#: module docstring).  (host, registrable-or-None).
OFFICIAL_VECTORS = [
    # unlisted TLD: implicit * rule
    ("example", None),
    ("example.example", "example.example"),
    ("b.example.example", "example.example"),
    ("a.b.example.example", "example.example"),
    # TLD with only one rule
    ("biz", None),
    ("domain.biz", "domain.biz"),
    ("b.domain.biz", "domain.biz"),
    ("a.b.domain.biz", "domain.biz"),
    # TLD with some two-level rules
    ("com", None),
    ("example.com", "example.com"),
    ("b.example.com", "example.com"),
    ("a.b.example.com", "example.com"),
    ("uk.com", None),  # private-section rule
    ("example.uk.com", "example.uk.com"),
    ("b.example.uk.com", "example.uk.com"),
    ("a.b.example.uk.com", "example.uk.com"),
    ("test.ac", "test.ac"),
    # TLD with only one wildcard rule (*.ck, !www.ck)
    ("ck", None),
    ("test.ck", None),
    ("b.test.ck", "b.test.ck"),
    ("a.b.test.ck", "b.test.ck"),
    ("www.ck", "www.ck"),
    ("www.www.ck", "www.ck"),
    # jp: plain two-level, three-level, wildcard + exception
    ("jp", None),
    ("test.jp", "test.jp"),
    ("www.test.jp", "test.jp"),
    ("ac.jp", None),
    ("test.ac.jp", "test.ac.jp"),
    ("www.test.ac.jp", "test.ac.jp"),
    ("kyoto.jp", None),
    ("test.kyoto.jp", "test.kyoto.jp"),
    ("ide.kyoto.jp", None),
    ("b.ide.kyoto.jp", "b.ide.kyoto.jp"),
    ("a.b.ide.kyoto.jp", "b.ide.kyoto.jp"),
    ("c.kobe.jp", None),
    ("b.c.kobe.jp", "b.c.kobe.jp"),
    ("a.b.c.kobe.jp", "b.c.kobe.jp"),
    ("city.kobe.jp", "city.kobe.jp"),
    ("www.city.kobe.jp", "city.kobe.jp"),
    # us: three-level k12 rules
    ("us", None),
    ("test.us", "test.us"),
    ("www.test.us", "test.us"),
    ("ak.us", None),
    ("test.ak.us", "test.ak.us"),
    ("www.test.ak.us", "test.ak.us"),
    ("k12.ak.us", None),
    ("test.k12.ak.us", "test.k12.ak.us"),
    ("www.test.k12.ak.us", "test.k12.ak.us"),
    # the r8 verdict's named cases
    ("foo.gov.uk", "foo.gov.uk"),
    ("www.foo.gov.uk", "foo.gov.uk"),
    ("foo.com.au", "foo.com.au"),
    ("shop.foo.com.au", "foo.com.au"),
]


def test_official_vectors_python_reference():
    for host, want in OFFICIAL_VECTORS:
        got = psl.registrable_domain_py(host, strict=True)
        assert got == want, f"{host}: got {got!r}, want {want!r}"


def test_total_fallback_mirrors_strict():
    """The SQL column is total: strict-None hosts fall back to the
    host itself, everything else is identical."""
    for host, want in OFFICIAL_VECTORS:
        got = psl.registrable_domain_py(host)
        assert got == (want if want is not None else host), host


def test_rule_parse_sanity():
    plain, wildtails, exceptions = psl.load_rules()
    assert sum(len(v) for v in plain.values()) > 7000
    assert 2 in plain and 3 in plain and 5 in plain
    assert sum(len(v) for v in wildtails.values()) > 80
    assert ("www.ck", 2) in exceptions
    assert len(exceptions) >= 8
    # 1-label plain rules fold into the implicit default
    assert 1 not in plain
    # the ladder only stages tails up to MAX_TAIL
    assert max(plain) + 1 <= psl.MAX_TAIL
    assert max(wildtails) + 2 <= psl.MAX_TAIL


@pytest.fixture(scope="module")
def host_battery():
    return [h for h, _ in OFFICIAL_VECTORS]


def test_three_way_engine_equality(spark, duck, host_battery):
    """Spark ladder == DuckDB ladder == Python reference on every
    official vector, rendered through the REAL canonicalization stages
    (each host wrapped as an https URL so the whole template runs).
    The canonicalizer strips a leading ``www.`` BEFORE the ladder (C4
    convention, deliberate), so the expectation is the reference over
    the stripped host — the unstripped exception-rule vectors are
    covered by the raw-host test below."""
    urls_ = [f"https://{h}/p" for h in host_battery]
    sdf = spark.createDataFrame([(u,) for u in urls_], "raw_url string")
    got_spark = {
        r["raw_url"]: r["registrable_domain"]
        for r in U.with_canonical_url(sdf, "raw_url")
        .select("raw_url", "registrable_domain")
        .collect()
    }
    duck.execute("CREATE OR REPLACE TEMP TABLE _psl_urls(raw_url VARCHAR)")
    duck.executemany(
        "INSERT INTO _psl_urls VALUES (?)", [(u,) for u in urls_]
    )
    cte = U.canonical_cte_sql("_psl_urls", "raw_url")
    got_duck = dict(
        duck.execute(
            f"WITH {cte} SELECT raw_url, registrable_domain FROM canon"
        ).fetchall()
    )
    duck.execute("DROP TABLE _psl_urls")
    for h in host_battery:
        u = f"https://{h}/p"
        want = psl.registrable_domain_py(
            h[4:] if h.startswith("www.") else h
        )
        assert got_spark[u] == want, f"spark {h}: {got_spark[u]!r} != {want!r}"
        assert got_duck[u] == want, f"duck {h}: {got_duck[u]!r} != {want!r}"


def test_raw_host_ladder_cross_engine(spark, duck, host_battery):
    """The ladder itself (no URL canonicalization, no www-strip) on
    every official vector: Spark == DuckDB == Python reference,
    including the exception-rule hosts the canonicalizer's www-strip
    hides from the previous test."""
    ladder = psl.public_suffix_labels_sql()
    reg = psl.registrable_sql("h")
    spark_stages = [
        f"CASE WHEN _ln >= {k}"
        f" THEN array_join(slice(_lbl, -{k}, {k}), '.') END AS _s{k}"
        for k in range(1, psl.MAX_TAIL + 1)
    ]
    sdf = spark.createDataFrame([(h,) for h in host_battery], "h string")
    got_spark = dict(
        sdf.selectExpr("h", "split(h, '\\\\.') AS _lbl")
        .selectExpr("h", "_lbl", "size(_lbl) AS _ln")
        .selectExpr("h", "_ln", *spark_stages)
        .selectExpr("*", f"({ladder}) AS _psl")
        .selectExpr("h", f"{reg} AS rd")
        .collect()
    )
    duck_stage = ", ".join(
        f"CASE WHEN _ln >= {k} THEN array_to_string("
        f"list_slice(_lbl, _ln - {k} + 1, _ln), '.') END AS _s{k}"
        for k in range(1, psl.MAX_TAIL + 1)
    )
    hv = ", ".join(f"('{h}')" for h in host_battery)
    got_duck = dict(
        duck.execute(
            f"WITH h0 AS (SELECT h, string_split(h, '.') AS _lbl "
            f"FROM (VALUES {hv}) t(h)), "
            f"h1 AS (SELECT h, _lbl, len(_lbl) AS _ln FROM h0), "
            f"h2 AS (SELECT h, _ln, {duck_stage} FROM h1), "
            f"h3 AS (SELECT h, ({ladder}) AS _psl, * EXCLUDE (h) FROM h2) "
            f"SELECT h, {reg} FROM h3"
        ).fetchall()
    )
    for h in host_battery:
        want = psl.registrable_domain_py(h)
        assert got_spark[h] == want, f"spark {h}: {got_spark[h]!r}"
        assert got_duck[h] == want, f"duck {h}: {got_duck[h]!r}"


def test_ladder_covers_wildcards_deeper_than_all_plain(monkeypatch):
    """Review-caught r9: the ladder's depth must cover the deepest
    rule of EITHER kind — a snapshot refresh where the deepest
    wildcard has more labels than every plain rule must not be
    silently skipped (the current snapshot has max plain 5 > max
    wildcard tail 4, so only a synthetic rule set exercises this)."""
    synth = (
        {2: frozenset({"co.xx"})},          # plain rules max out at k=2
        {3: frozenset({"a.b.zz"})},         # *.a.b.zz → k=4 > max(plain)
        (("www.ck", 2),),
    )
    monkeypatch.setattr(psl, "load_rules", lambda path=None: synth)
    psl.public_suffix_labels_sql.cache_clear()
    try:
        sql = psl.public_suffix_labels_sql()
        assert "_s3 IN ('a.b.zz') AND _ln >= 4) THEN 4" in sql
        # python reference takes the same bound: q.a.b.zz IS the
        # public suffix (ps=4), one more label is registrable, a
        # deeper subdomain resolves back to it
        assert psl.registrable_domain_py("q.a.b.zz", strict=True) is None
        assert (
            psl.registrable_domain_py("p.q.a.b.zz", strict=True)
            == "p.q.a.b.zz"
        )
        assert (
            psl.registrable_domain_py("x.p.q.a.b.zz", strict=True)
            == "p.q.a.b.zz"
        )
    finally:
        psl.public_suffix_labels_sql.cache_clear()


def test_overlapping_exceptions_resolve_by_label_count(monkeypatch):
    """Review-caught r9: among matching exception rules the
    MOST-LABELS one prevails (the ladder emits them k-desc; the Python
    reference must not resolve in file order)."""
    synth = (
        {},
        {1: frozenset({"ck"})},
        (("www.ck", 2), ("x.www.ck", 3)),  # file order: shallow first
    )
    monkeypatch.setattr(psl, "load_rules", lambda path=None: synth)
    psl.public_suffix_labels_sql.cache_clear()
    try:
        # host a.x.www.ck matches BOTH; k=3 must win → ps=2 →
        # registrable = x.www.ck (file order would give www.ck)
        assert (
            psl.registrable_domain_py("a.x.www.ck", strict=True)
            == "x.www.ck"
        )
        sql = psl.public_suffix_labels_sql()
        assert sql.index("x.www.ck") < sql.index("'www.ck'")
    finally:
        psl.public_suffix_labels_sql.cache_clear()


def test_ladder_is_engine_independent_text():
    """The ladder must stay renderable verbatim in both engines: only
    CASE/WHEN/IN/AND/OR/THEN/ELSE/END over _s1.._s5 and _ln."""
    import re

    sql = psl.public_suffix_labels_sql()
    stripped = re.sub(r"'[^']*'", "", sql)  # drop the rule literals
    tokens = set(re.findall(r"[A-Za-z_][A-Za-z_0-9]*", stripped))
    allowed = {"CASE", "WHEN", "IN", "AND", "OR", "THEN", "ELSE", "END",
               "_ln"} | {f"_s{k}" for k in range(1, psl.MAX_TAIL + 1)}
    assert tokens <= allowed, tokens - allowed


def test_snapshot_with_sql_unsafe_rule_fails_loudly(tmp_path):
    """ADVICE r9: PSL rules are interpolated verbatim into SQL string
    literals — a snapshot refresh introducing a quote (or backslash)
    must fail at load_rules time with a named rule, never generate a
    malformed 130 KB ladder in both engines."""
    import pytest as _pytest

    bad = tmp_path / "psl.dat"
    bad.write_text("// header\ncom\nfoo.bar\no'brien.example\n")
    with _pytest.raises(ValueError, match="o'brien.example"):
        psl.load_rules(str(bad))
    bad2 = tmp_path / "psl2.dat"
    bad2.write_text("back\\slash.example\n")
    with _pytest.raises(ValueError, match="slash.example"):
        psl.load_rules(str(bad2))
    # the vendored snapshot itself parses clean (guard is load-time)
    assert psl.load_rules() is not None
