"""robots.txt parsing (operators/robots.py): RFC 9309 group/agent
semantics on realistic files, the wildcard boundary, and the
crawl-to-verdicts end-to-end through sources/warc + urls.robots_verdicts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from org_revue_de_presse_trends_spark.operators.robots import (
    parse_robots_txt,
    robots_rules_from_records,
)

BASIC = """
# politeness file
User-agent: *
Disallow: /private
Allow: /private/pub

User-agent: MyBot
Disallow: /mybot-only
"""


def test_wildcard_group():
    rules, n = parse_robots_txt(BASIC, "OtherBot")
    assert rules == [("/private", False), ("/private/pub", True)]
    assert n == 0


def test_exact_agent_beats_star_case_insensitive():
    rules, _ = parse_robots_txt(BASIC, "mybot")
    assert rules == [("/mybot-only", False)]


def test_matching_groups_merge():
    txt = """
User-agent: a
Disallow: /one

User-agent: b
Disallow: /noise

User-agent: a
Allow: /two
"""
    assert parse_robots_txt(txt, "A")[0] == [("/one", False), ("/two", True)]


def test_consecutive_agent_lines_share_rules():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots_txt(txt, "b")[0] == [("/x", False)]
    # a User-agent line AFTER rules starts a NEW group
    txt2 = "User-agent: a\nDisallow: /x\nUser-agent: b\nDisallow: /y\n"
    assert parse_robots_txt(txt2, "b")[0] == [("/y", False)]


def test_empty_disallow_and_unknown_keys():
    txt = """
User-agent: *
Crawl-delay: 10
Disallow:
Sitemap: http://x/s.xml
Disallow: /keep
"""
    assert parse_robots_txt(txt)[0] == [("/keep", False)]


@pytest.mark.parametrize(
    "value,expect,n_drop",
    [
        ("/a*", [("/a", False)], 0),  # trailing * == prefix
        ("/a*b", [], 1),  # interior *: unsupported, dropped
        ("/a$", [], 1),  # $ anchor: unsupported, dropped
    ],
)
def test_wildcard_boundary(value, expect, n_drop):
    rules, n = parse_robots_txt(f"User-agent: *\nDisallow: {value}\n")
    assert rules == expect and n == n_drop


def test_garbage_never_raises():
    for body in ("", "::::\n\x00\xff", "Disallow: /orphan-no-group",
                 "User-agent: *"):
        rules, _ = parse_robots_txt(body)
        assert rules == []


def test_crawl_to_verdicts_end_to_end(spark, tmp_path):
    """robots.txt records inside the crawl drive page verdicts: the
    deny + carve-out precedence per domain, default-allow for domains
    with no robots file."""
    from org_revue_de_presse_trends_spark.operators.urls import (
        robots_verdicts,
        with_canonical_url,
    )
    from org_revue_de_presse_trends_spark.sources import warc as W

    def resp(uri, body, ctype="text/html"):
        return (
            {
                "WARC-Type": "response",
                "WARC-Record-ID": f"<urn:{uri}>",
                "WARC-Target-URI": uri,
                "WARC-Date": "2025-02-01T00:00:00Z",
                "Content-Type": "application/http; msgtype=response",
            },
            W.build_http_response(200, {"Content-Type": ctype}, body),
        )

    robots_a = b"User-agent: *\nDisallow: /private\nAllow: /private/pub\n"
    recs = [
        resp("http://www.site-a.com/robots.txt", robots_a, "text/plain"),
        resp("http://www.site-a.com/private/x", b"<p>Secret page here.</p>"),
        resp("http://www.site-a.com/private/pub/y", b"<p>Carved out.</p>"),
        resp("http://www.site-a.com/open", b"<p>Open page.</p>"),
        resp("http://site-b.org/anything", b"<p>No robots at all.</p>"),
    ]
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "seg.warc").write_bytes(W.build_warc(recs))

    records = W.read_warc(spark, str(d))
    rules = robots_rules_from_records(records)
    got_rules = {
        (r["dom"], r["prefix"]): r["allow"] for r in rules.collect()
    }
    assert got_rules == {
        ("site-a.com", "/private"): False,
        ("site-a.com", "/private/pub"): True,
    }

    pages = with_canonical_url(
        records.where(
            ~F.col("target_uri").contains("robots.txt")
            & F.col("parse_error").isNull()
        ).withColumn("url", F.col("target_uri")),
        "url",
    )
    verdicts = {
        r["target_uri"]: r["allowed"]
        for r in robots_verdicts(pages, rules, ["target_uri"]).collect()
    }
    assert verdicts == {
        "http://www.site-a.com/private/x": False,
        "http://www.site-a.com/private/pub/y": True,
        "http://www.site-a.com/open": True,
        "http://site-b.org/anything": True,
    }
