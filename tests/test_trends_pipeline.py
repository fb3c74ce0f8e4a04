"""Golden tests for the three trends variants (SURVEY §5.2 item 2):
the Spark pipeline vs an independent DuckDB transliteration of the
reference SQL (trends.go:274-412) over generated domain fixtures.

Oracle notes:
- json access is guarded with json_valid() to model the engine's
  get_json_object null-on-invalid semantics (the reference's ::json
  cast would ERROR on invalid documents — SURVEY §7 documents this as
  a reference fragility we do not replicate);
- the deleted-member NOT IN on the distinct path is written null-safe
  (uid IS NULL OR uid NOT IN ...) to match the engine's corrected
  semantics (Postgres's null-aware NOT IN would drop rows with
  unparseable user ids whenever the exclusion set is non-empty);
- ORDER BY carries the id tiebreaker both sides (the reference's bare
  ORDER BY retweets is nondeterministic).
"""

from __future__ import annotations

import pytest

from conftest import canon
from fixtures.gen import DEPRECATED_LIST, TARGET_LIST, generate

from org_revue_de_presse_trends_spark.plans.trends import (
    TrendsParams,
    TrendsPipeline,
    TrendsTables,
)

DAY = "2024-03-02"

CIVIL = "CAST({c} - INTERVAL 1 HOUR AS DATE)"
IN_LIST = f"('{TARGET_LIST}', '{DEPRECATED_LIST}')"
DELETED_MEMBERS = """
    SELECT m.usr_id
    FROM weaving_user m, publishers_list dl
    WHERE dl.deleted_at IS NOT NULL
      AND m.usr_twitter_username = dl.screen_name
      AND dl.screen_name IS NOT NULL
"""
DELETED_TWITTER_IDS = """
    SELECT CAST(m.usr_twitter_id AS BIGINT)
    FROM weaving_user m, publishers_list dl
    WHERE dl.deleted_at IS NOT NULL
      AND m.usr_twitter_username = dl.screen_name
      AND dl.screen_name IS NOT NULL
"""
JSON_INT = (
    "CASE WHEN json_valid({d}) THEN "
    "TRY_CAST(json_extract_string({d}, '$.{f}') AS INTEGER) END"
)
JSON_USER_ID = (
    "CASE WHEN json_valid(s.ust_api_document) THEN "
    "TRY_CAST(json_extract_string(s.ust_api_document, '$.user.id_str') "
    "AS BIGINT) END"
)
IS_RT_DERIVED = (
    "COALESCE(h.is_retweet, CASE WHEN json_valid(s.ust_api_document) THEN "
    "json_extract_string(s.ust_api_document, '$.retweeted_status_result') "
    "IS NOT NULL END, false)"
)


def curated_oracle(day: str, limit: int = 10) -> str:
    sday = CIVIL.format(c="s.ust_created_at")
    hday = CIVIL.format(c="h.publication_date_time")
    pday = CIVIL.format(c="p.checked_at")
    return f"""
    SELECT
      s.ust_id AS id,
      s.ust_status_id AS twitterId,
      s.ust_full_name AS username,
      s.ust_text AS text,
      'https://twitter.com/' || s.ust_full_name || '/status/'
        || s.ust_status_id AS url,
      s.ust_api_document AS json,
      strftime(s.ust_created_at, '%Y-%m-%d %H:%M:%S') AS publishedAt,
      strftime(s.ust_created_at, '%Y-%m-%d %H:%M:%S') AS checkedAt,
      COALESCE(h.is_retweet, false) AS isRetweet,
      CAST(MAX(COALESCE(p.total_retweets, h.total_retweets)) AS INTEGER)
        AS totalRetweets,
      CAST(MAX(COALESCE(p.total_favorites, h.total_favorites)) AS INTEGER)
        AS totalFavorites
    FROM highlight h
    JOIN weaving_status s ON s.ust_id = h.status_id
      AND {sday} = {hday}
      AND {sday} = DATE '{day}'
      AND h.is_retweet = false
    JOIN publishers_list pl ON h.aggregate_id = pl.id
      AND pl.public_id IN {IN_LIST}
    LEFT JOIN status_popularity p ON p.status_id = h.status_id
      AND {pday} = {hday}
    WHERE {hday} = DATE '{day}'
      AND h.is_retweet = false
      AND h.member_id NOT IN ({DELETED_MEMBERS})
    GROUP BY h.status_id, s.ust_status_id, s.ust_full_name, s.ust_text,
             s.ust_created_at, s.ust_api_document, s.ust_id, h.is_retweet
    ORDER BY totalRetweets DESC NULLS LAST, id ASC
    LIMIT {limit}
    """


def distinct_oracle(day: str, include_retweets: bool, limit: int = 10) -> str:
    sday = CIVIL.format(c="s.ust_created_at")
    hday = CIVIL.format(c="h.publication_date_time")
    pday = CIVIL.format(c="p.checked_at")
    kind = "true" if include_retweets else "false"
    on_rt = "" if include_retweets else "AND h.is_retweet = false"
    rt_json = JSON_INT.format(d="s.ust_api_document", f="retweet_count")
    fav_json = JSON_INT.format(d="s.ust_api_document", f="favorite_count")
    cascade = f"COALESCE(p.total_retweets, h.total_retweets, {rt_json})"
    fav_cascade = f"COALESCE(p.total_favorites, h.total_favorites, {fav_json})"
    return f"""
    WITH rows_ AS (
      SELECT
        s.ust_id, s.ust_status_id, s.ust_full_name, s.ust_text,
        s.ust_created_at, s.ust_api_document,
        {IS_RT_DERIVED} AS is_rt,
        {cascade} AS rt_cascade,
        {fav_cascade} AS fav_cascade
      FROM weaving_status s
      LEFT JOIN highlight h ON s.ust_id = h.status_id
        AND {sday} = {hday}
        AND {sday} = DATE '{day}'
        {on_rt}
      JOIN publishers_list pl ON (
          h.aggregate_id = pl.id
          OR (s.ust_full_name = pl.screen_name
              AND pl.screen_name IS NOT NULL)
        ) AND pl.public_id IN {IN_LIST}
      LEFT JOIN status_popularity p ON p.status_id = h.status_id
        AND {pday} = {hday}
      WHERE {sday} = DATE '{day}'
        AND {IS_RT_DERIVED} = {kind}
        AND ({JSON_USER_ID} IS NULL
             OR {JSON_USER_ID} NOT IN ({DELETED_TWITTER_IDS}))
    ),
    ranked AS (
      SELECT *,
        row_number() OVER (
          PARTITION BY ust_full_name
          ORDER BY rt_cascade DESC NULLS LAST, ust_id DESC
        ) AS rn,
        MAX(rt_cascade) OVER (PARTITION BY ust_full_name) AS max_rt,
        MAX(fav_cascade) OVER (PARTITION BY ust_full_name) AS max_fav
      FROM rows_
    )
    SELECT
      ust_id AS id,
      ust_status_id AS twitterId,
      ust_full_name AS username,
      ust_text AS text,
      'https://twitter.com/' || ust_full_name || '/status/'
        || ust_status_id AS url,
      ust_api_document AS json,
      strftime(ust_created_at, '%Y-%m-%d %H:%M:%S') AS publishedAt,
      strftime(ust_created_at, '%Y-%m-%d %H:%M:%S') AS checkedAt,
      is_rt AS isRetweet,
      CAST(max_rt AS INTEGER) AS totalRetweets,
      CAST(max_fav AS INTEGER) AS totalFavorites
    FROM ranked WHERE rn = 1
    ORDER BY totalRetweets DESC NULLS LAST, id ASC
    LIMIT {limit}
    """


@pytest.fixture(scope="session")
def domain_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("trends_domain")
    generate(str(out))
    return str(out)


@pytest.fixture(scope="session")
def domain_tables(spark, domain_dir):
    load = lambda n: spark.read.parquet(f"{domain_dir}/{n}.parquet")
    return TrendsTables(
        highlight=load("highlight"),
        weaving_status=load("weaving_status"),
        publishers_list=load("publishers_list"),
        status_popularity=load("status_popularity"),
        weaving_user=load("weaving_user"),
    )


@pytest.fixture(scope="session")
def domain_duck(duck, domain_dir):
    for n in ("highlight", "weaving_status", "publishers_list",
              "status_popularity", "weaving_user"):
        duck.execute(
            f"CREATE OR REPLACE VIEW {n} AS "
            f"SELECT * FROM '{domain_dir}/{n}.parquet'"
        )
    return duck


def _params(**kw) -> TrendsParams:
    defaults = dict(
        list_public_ids=(TARGET_LIST, DEPRECATED_LIST),
        since_date=DAY,
        limit=10,
    )
    defaults.update(kw)
    return TrendsParams(**defaults)


def _compare(df, duck, sql, min_rows=1):
    spark_rows = [tuple(r) for r in df.collect()]
    res = duck.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(df.columns) == sorted(duck_cols)
    s, d = canon(spark_rows, df.columns), canon(duck_rows, duck_cols)
    assert len(s) == len(d), f"rows: spark={len(s)} duck={len(d)}"
    for i, (a, b) in enumerate(zip(s, d)):
        assert a == b, f"row {i}: spark={a}\nduck={b}"
    assert len(s) >= min_rows


from fixtures.gen import DAYS


@pytest.mark.parametrize("day", DAYS)
def test_status_variant(spark, domain_tables, domain_duck, day):
    pipe = TrendsPipeline(domain_tables, _params(since_date=day))
    _compare(pipe.variant("status"), domain_duck, curated_oracle(day))


@pytest.mark.parametrize("day", DAYS)
def test_status_from_distinct_sources(spark, domain_tables, domain_duck, day):
    pipe = TrendsPipeline(domain_tables, _params(since_date=day))
    _compare(
        pipe.variant("statusFromDistinctSources"),
        domain_duck,
        distinct_oracle(day, include_retweets=False),
    )


@pytest.mark.parametrize("day", DAYS)
def test_retweet_from_distinct_sources(spark, domain_tables, domain_duck, day):
    pipe = TrendsPipeline(domain_tables, _params(since_date=day))
    _compare(
        pipe.variant("retweetFromDistinctSources"),
        domain_duck,
        distinct_oracle(day, include_retweets=True),
    )


def test_all_variants_union(spark, domain_tables, domain_duck):
    pipe = TrendsPipeline(domain_tables, _params())
    df = pipe.all_variants(
        ("status", "statusFromDistinctSources", "retweetFromDistinctSources")
    )
    rows = df.collect()
    assert set(r["statusType"] for r in rows) == {
        "status", "statusFromDistinctSources", "retweetFromDistinctSources"
    }
    assert df.columns[-1] == "statusType"


def test_pagination(spark, domain_tables, domain_duck):
    """Page 1 = rows 11-20 of the page-0-with-limit-20 ordering."""
    full = TrendsPipeline(domain_tables, _params(limit=20)).variant("status")
    page1 = TrendsPipeline(domain_tables, _params(limit=10, page=1)).variant(
        "status"
    )
    full_ids = [r["id"] for r in full.collect()]
    page1_ids = [r["id"] for r in page1.collect()]
    assert page1_ids == full_ids[10:20]


def test_deleted_members_absent(spark, domain_tables):
    """Property (SURVEY §5.2 item 5): anti-join output never contains a
    deleted member's publication."""
    pipe = TrendsPipeline(domain_tables, _params(limit=0))
    out = pipe.curated(include_retweets=False)
    usernames = {r["username"] for r in out.collect()}
    assert "pub03" not in usernames  # deleted-list screen_name
    assert "pub05" not in usernames  # deleted-list-3 screen_name


def test_count_highlights_matches_reference_count(
    spark, domain_tables, domain_duck
):
    """A1: the count query (trends.go:450-529) — spine joins + IN-list
    + day filter only, popularity join unaggregated (multiplies)."""
    sday = CIVIL.format(c="s.ust_created_at")
    hday = CIVIL.format(c="h.publication_date_time")
    pday = CIVIL.format(c="p.checked_at")
    curated_sql = f"""
        SELECT COUNT(*) FROM highlight h
        JOIN weaving_status s ON s.ust_id = h.status_id
          AND {sday} = {hday} AND {sday} = DATE '{DAY}'
        JOIN publishers_list pl ON h.aggregate_id = pl.id
          AND pl.public_id IN {IN_LIST}
        LEFT JOIN status_popularity p ON p.status_id = h.status_id
          AND {pday} = {hday}
        WHERE {hday} = DATE '{DAY}'
    """
    distinct_sql = f"""
        SELECT COUNT(*) FROM weaving_status s
        LEFT JOIN highlight h ON s.ust_id = h.status_id
          AND {sday} = {hday} AND {sday} = DATE '{DAY}'
        LEFT JOIN publishers_list pl ON h.aggregate_id = pl.id
          AND pl.public_id IN {IN_LIST}
        LEFT JOIN status_popularity p ON p.status_id = h.status_id
          AND {pday} = {hday}
        WHERE {sday} = DATE '{DAY}'
    """
    pipe = TrendsPipeline(domain_tables, _params())
    assert pipe.count_highlights() == domain_duck.execute(
        curated_sql
    ).fetchone()[0]
    assert pipe.count_highlights(distinct_sources=True) == domain_duck.execute(
        distinct_sql
    ).fetchone()[0]


def test_last_week_statuses_corrected(spark, domain_tables, domain_duck):
    """F6: corrected 7-day lookback (the reference's flag is dead —
    its SQL is invalid, trends.go:531-534)."""
    now = "2024-03-03 12:00:00"
    got = TrendsPipeline(domain_tables, _params()).last_week_statuses(now)
    expected = domain_duck.execute(
        f"""
        SELECT COUNT(*) FROM weaving_status s
        WHERE s.ust_created_at - INTERVAL 1 HOUR
              > TIMESTAMP '{now}' - INTERVAL 7 DAY
          AND s.ust_created_at - INTERVAL 1 HOUR <= TIMESTAMP '{now}'
        """
    ).fetchone()[0]
    assert got.count() == expected and expected > 0


def test_bug_compat_reproduces_favorites_bug(spark, domain_tables, domain_duck):
    """bug_compat=True reproduces trends.go:344 exactly: the distinct
    favorites cascade falls back to h.total_RETWEETS."""
    pipe = TrendsPipeline(domain_tables, _params(bug_compat=True))
    sql = distinct_oracle(DAY, include_retweets=False).replace(
        "COALESCE(p.total_favorites, h.total_favorites,",
        "COALESCE(p.total_favorites, h.total_retweets,",
    )
    _compare(pipe.variant("statusFromDistinctSources"), domain_duck, sql)
    # and the buggy output differs from the corrected default somewhere
    corrected = TrendsPipeline(domain_tables, _params()).variant(
        "statusFromDistinctSources"
    )
    a = {(r["id"], r["totalFavorites"]) for r in corrected.collect()}
    b = {(r["id"], r["totalFavorites"])
         for r in pipe.variant("statusFromDistinctSources").collect()}
    assert a != b


def test_curated_retweet_extension(spark, domain_tables):
    """Engine extension: curated(include_retweets=True) has no kind
    filter (reference semantics for includeRetweets on the curated
    path) — a superset of the status variant."""
    pipe = TrendsPipeline(domain_tables, _params(limit=0))
    no_rt = {r["id"] for r in pipe.curated(False).collect()}
    all_kinds = {r["id"] for r in pipe.curated(True).collect()}
    assert no_rt < all_kinds


def test_argmax_one_row_per_source(spark, domain_tables):
    pipe = TrendsPipeline(domain_tables, _params(limit=0))
    out = pipe.distinct_sources(include_retweets=False).collect()
    names = [r["username"] for r in out]
    assert len(names) == len(set(names))
