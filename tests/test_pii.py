"""PII redaction (functions/pii.py): planted-string evidence.

The corpus fixture carries no digits, so the driver query plants
synthetic PII (cross-engine hash check in test_driver_contract via the
oracle).  These tests pin the behavior on REALISTIC planted strings:
each class matches its canonical shapes, redaction is idempotent on
clean text, and overlapping digit runs are attributed to exactly one
class by the fixed rule order.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from org_revue_de_presse_trends_spark.functions import pii as P


def _redact_one(spark, text: str):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = P.with_pii_redacted(df).collect()[0]
    return row


@pytest.mark.parametrize(
    "text,expected,counts",
    [
        (
            "reach me at john.doe+x@mail.example.org today",
            "reach me at <EMAIL> today",
            {"n_email": 1},
        ),
        (
            "call (415) 555-0142 or 415-555-0199 now",
            "call <PHONE> or <PHONE> now",
            {"n_phone": 2},
        ),
        (
            "card 4111 1111 1111 1111 expires soon",
            "card <CARD> expires soon",
            {"n_card": 1},
        ),
        (
            "ssn 078-05-1120 on file",
            "ssn <SSN> on file",
            {"n_ssn": 1},
        ),
        (
            "server at 10.0.0.1 and 192.168.255.254",
            "server at <IPV4> and <IPV4>",
            {"n_ipv4": 2},
        ),
        # no PII: text unchanged, all counts zero
        ("the quick brown fox", "the quick brown fox", {}),
    ],
)
def test_pii_classes(spark, text, expected, counts):
    row = _redact_one(spark, text)
    assert row["text_redacted"] == expected
    for name, _, _ in P.PII_RULES:
        assert row[f"n_{name}"] == counts.get(f"n_{name}", 0), name


def test_phone_does_not_match_inside_longer_digit_run(spark):
    """Without the \\b before the first digit group, the tail of a
    longer digit string would match and leave its head unredacted."""
    row = _redact_one(spark, "order id 12345-678-9012 shipped")
    assert row["n_phone"] == 0
    assert row["text_redacted"] == "order id 12345-678-9012 shipped"
    # the anchored shapes still match after the fix
    for text in ("+1-415-555-0142", "(415) 555-0142", "415.555.0142"):
        r = _redact_one(spark, f"call {text} now")
        assert r["n_phone"] == 1, text
        assert r["text_redacted"] == "call <PHONE> now", text


def test_card_not_double_counted_as_phone(spark):
    """A card's digit runs could read like a phone number; the fixed
    order (card before phone) must attribute it to card only."""
    row = _redact_one(spark, "pay 4111 1111 1111 1111 thanks")
    assert row["n_card"] == 1
    assert row["n_phone"] == 0
    assert row["text_redacted"] == "pay <CARD> thanks"


def test_email_with_digits_consumed_before_phone(spark):
    row = _redact_one(spark, "mail user4155550142@example.com ok")
    assert row["n_email"] == 1
    assert row["n_phone"] == 0
    assert row["text_redacted"] == "mail <EMAIL> ok"


def test_mixed_document_all_classes(spark):
    text = (
        "contact a@b.io card 4111 1111 1111 1111 "
        "call +1-415-555-0142 ssn 078-05-1120 ip 10.0.0.1"
    )
    row = _redact_one(spark, text)
    assert (
        row["text_redacted"]
        == "contact <EMAIL> card <CARD> call <PHONE> ssn <SSN> ip <IPV4>"
    )
    for name in ("email", "card", "phone", "ssn", "ipv4"):
        assert row[f"n_{name}"] == 1, name


def test_redaction_idempotent(spark):
    """Redacting already-redacted text changes nothing."""
    once = _redact_one(spark, "contact a@b.io at 10.0.0.1")["text_redacted"]
    again = _redact_one(spark, once)
    assert again["text_redacted"] == once
    for name, _, _ in P.PII_RULES:
        assert again[f"n_{name}"] == 0


def test_counts_are_long_typed(spark):
    """Contract invariant: counts must be bigint to line up with the
    DuckDB oracle's len(list) type."""
    df = spark.createDataFrame([(1, "a@b.io")], "doc_id long, text string")
    out = P.with_pii_redacted(df)
    for name, _, _ in P.PII_RULES:
        assert dict(out.dtypes)[f"n_{name}"] == "bigint"


def test_plan_is_single_map_stage(spark):
    """Redaction must stay a pure projection: no shuffle, no Python."""
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("a@b.io x").alias("text")
    )
    plan = (
        P.with_pii_redacted(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
