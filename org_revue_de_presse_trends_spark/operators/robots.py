"""robots.txt parsing (RFC 9309, public spec) — turning the
``/robots.txt`` responses a crawl ALREADY CONTAINS (Common Crawl
archives them alongside the pages) into the broadcastable rules frame
``operators/urls.robots_verdicts`` consumes, so crawl-politeness
filtering runs as a post-hoc audit over the corpus itself.

Parser semantics implemented (and their boundaries, documented rather
than silently wrong):

- groups: one or more consecutive ``User-agent`` lines start a group;
  ``Allow``/``Disallow`` lines belong to the open group; a
  ``User-agent`` line AFTER rules starts a new group (RFC 9309 §2.2.1).
- group selection: all groups whose product token case-insensitively
  equals the requested agent; if none, all ``*`` groups (exact match
  beats the wildcard group — §2.2.1's "most specific group").
  Matching groups MERGE.
- an empty ``Disallow:`` value is no rule (the classic allow-all
  idiom); ``Sitemap``/unknown keys are ignored; ``#`` starts a
  comment; keys are case-insensitive and whitespace-tolerant.
- wildcard boundary: a TRAILING ``*`` is prefix-equivalent and is
  stripped; a rule containing an interior ``*`` or a ``$`` anchor is
  not expressible as a longest-prefix rule — such rules are DROPPED
  and counted (``n_unsupported``), never half-applied.  The
  longest-prefix evaluator itself is ``robots_verdicts``
  (broadcast join + struct-MAX argmax; see its scale note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_robots_txt(
    text: str, user_agent: str = "*"
) -> tuple[list[tuple[str, bool]], int]:
    """Rules for ``user_agent`` from one robots.txt body.

    Returns ``([(path_prefix, allow), ...], n_unsupported)`` in file
    order (the caller assigns tiebreak ids).  Never raises: malformed
    lines are skipped, an empty/blank body yields no rules.
    """
    ua = user_agent.strip().lower()
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    agents: list[str] = []
    rules: list[tuple[str, bool]] = []
    in_agents = True  # collecting the group's user-agent lines?
    n_unsupported = 0

    def close():
        nonlocal agents, rules
        if agents:
            groups.append((agents, rules))
        agents, rules = [], []

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, value = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not in_agents:
                close()
                in_agents = True
            agents.append(value.lower())
        elif key in ("allow", "disallow"):
            in_agents = False
            if not value:
                continue  # empty Disallow: == no rule
            if value.endswith("*"):
                value = value.rstrip("*")
            if "*" in value or "$" in value:
                n_unsupported += 1
                continue
            rules.append((value, key == "allow"))
        else:
            # Sitemap / Crawl-delay / unknown keys end the UA run but
            # keep the group open
            in_agents = False
    close()

    exact = [r for a, rs in groups if ua in a for r in rs]
    if any(ua in a for a, _ in groups):
        return exact, n_unsupported
    return [r for a, rs in groups if "*" in a for r in rs], n_unsupported


def robots_rules_from_records(
    records: DataFrame, user_agent: str = "*"
) -> DataFrame:
    """(dom, prefix, allow, rid) rules parsed from the crawl's own
    successful ``/robots.txt`` responses — ready for
    ``urls.robots_verdicts``.  ``dom`` is the PSL registrable domain
    of the robots URI, so verdicts key on the same column the rest of
    the URL family uses; several robots files mapping to one
    registrable domain (subdomain robots) merge, file order preserved
    within each via the rid tiebreak.

    Scale: |robots files| rows parsed in one mapInPandas — per-domain
    output is 10-100 rules, broadcastable downstream by design."""
    from .urls import with_canonical_url
    from ..sources.warc import decode_text

    robots = (
        records.where(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            & F.col("target_uri").rlike("^[a-zA-Z]+://[^/]+/robots\\.txt$")
        )
        .withColumn("url", F.col("target_uri"))
    )
    doms = with_canonical_url(robots, "url").select(
        F.col("registrable_domain").alias("dom"),
        "target_uri",
        "content_type",
        "payload",
    )

    ua = user_agent

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for dom, uri, ctype, payload in zip(
                pdf["dom"], pdf["target_uri"], pdf["content_type"],
                pdf["payload"],
            ):
                body = decode_text(
                    bytes(payload) if payload is not None else b"",
                    str(ctype) if ctype is not None else None,
                )
                rules, _ = parse_robots_txt(body, ua)
                for i, (prefix, allow) in enumerate(rules):
                    # rid unique per (file, position): several robots
                    # files on one registrable domain merge without
                    # collisions; exact re-fetch duplicates collapse
                    # in the full-row distinct below, CONFLICTING
                    # re-fetches keep both rules and the verdict
                    # argmax resolves them deterministically
                    out.append(
                        {
                            "dom": str(dom),
                            "prefix": prefix,
                            "allow": bool(allow),
                            "rid": f"{uri}#{i:05d}",
                        }
                    )
            yield pd.DataFrame(
                out, columns=["dom", "prefix", "allow", "rid"]
            )

    return doms.mapInPandas(
        parse, "dom STRING, prefix STRING, allow BOOLEAN, rid STRING"
    ).dropDuplicates()
