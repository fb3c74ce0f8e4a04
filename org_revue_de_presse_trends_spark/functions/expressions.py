"""Named column expressions for the trends domain (SURVEY.md §2.2).

Each function mirrors one scalar-expression operator of the reference,
cited by trends.go line.  All are built-in Spark column expressions —
JVM-side, whole-stage-codegen'd; zero Python UDFs (SURVEY §2.10: none
are needed for parity).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def civil_day(ts: Column, shift_hours: int = 1, tz: str | None = None) -> Column:
    """Civil-day bucketing (reference trends.go:311,377,399).

    The reference hard-codes ``ts - INTERVAL 1 HOUR → date`` — a
    local(CET)→UTC shift that is correct in winter and off by one hour
    under CEST (SURVEY §1.4).  Default reproduces that exactly; pass
    ``tz="Europe/Paris"`` for the corrected DST-aware local→UTC
    conversion (same result in winter, -2h in summer).
    """
    if tz is not None:
        return F.to_date(F.to_utc_timestamp(ts, tz))
    return F.to_date(ts - F.expr(f"INTERVAL {int(shift_hours)} HOUR"))


def tweet_url(screen_name: Column, status_id: Column) -> Column:
    """CONCAT('https://twitter.com/', name, '/status/', id)
    (reference trends.go:281)."""
    return F.concat(
        F.lit("https://twitter.com/"),
        screen_name,
        F.lit("/status/"),
        status_id,
    )


def popularity(
    checked: Column, at_collection: Column, raw_json_doc: Column | None = None,
    json_field: str = "retweet_count",
) -> Column:
    """The popularity cascade (reference trends.go:286-287,338-348):
    re-checked value → value at collection → raw API JSON fallback."""
    branches = [checked, at_collection]
    if raw_json_doc is not None:
        branches.append(
            F.get_json_object(raw_json_doc, f"$.{json_field}").cast("int")
        )
    return F.coalesce(*branches)


def is_retweet_derived(is_retweet: Column, api_document: Column) -> Column:
    """3-way retweet derivation (reference trends.go:347,378):
    COALESCE(h.is_retweet, doc->>'retweeted_status_result' IS NOT NULL,
    false)."""
    return F.coalesce(
        is_retweet,
        F.get_json_object(api_document, "$.retweeted_status_result").isNotNull(),
        F.lit(False),
    )


def json_user_id(api_document: Column) -> Column:
    """Nested JSON user id as bigint (reference trends.go:379-380)."""
    return F.get_json_object(api_document, "$.user.id_str").cast("long")


def is_valid_json(doc: Column) -> Column:
    """Reference skips rows whose document fails json.Valid
    (trends.go:619-623,690-694).  Spark: try-parse returns null on
    invalid input."""
    return F.try_parse_json(doc).isNotNull()
