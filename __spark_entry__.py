"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (the trends-pipeline shape) at
sf0.001.  ``queries()`` / ``oracle_sql()`` — the full registered suite
from org_revue_de_presse_trends_spark.plans (one entry per implemented
SURVEY §2 / LLM-pipeline operator; oracle present whenever the op is
SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from org_revue_de_presse_trends_spark import plans  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return plans.QUERIES["daily_top_events"](spark, "/root/testdata/sf0.001")


#: Driver-window rotation (r6 verdict item 6, continued per round):
#: the driver re-generates fixtures between rounds, so oracled queries
#: that sit permanently past its 50-slot window would only catch
#: cross-engine drift via the in-repo sf0.01 gate.  Each round the
#: next batch of overflow-oracled queries moves INTO the window
#: (emitted first); the previous rotation returns to registration
#: order.  tests/test_driver_contract.py pins both resulting sets.
#:
#: r10 batch (r9 verdict item 1): ALL 47 oracled queries that had
#: never carried driver evidence rotate in at once — the TPC-H q4-q22
#: long tail (14), the four r9 oracles (md5 siblings + classifier
#: AUC), the r7b source-stats family, and the doc-quality/decon long
#: tail — plus three stable veterans to fill the 50-slot window.
#: After CORRECTNESS_r10 this makes every oracled query driver-green
#: cumulative (140/140).  The r9 batch (eval octet, URL family,
#: q2/q11) went 15/15 driver-green in CORRECTNESS_r09 and returns to
#: overflow.
WINDOW_ROTATION = [
    # TPC-H q4-q22 long tail — never driver-verified until now
    "q4_priority_with_late_lines",
    "q6_forecast_revenue_change",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q10_returned_item_customers",
    "q12_priority_by_lateness",
    "q14_promo_revenue_ratio",
    "q15_top_suppliers",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_bracket_revenue",
    "q20_excess_shippers",
    "q21_waiting_suppliers",
    "q22_idle_customers",
    # the four r9 oracles
    "dedup_minhash_md5",
    "dedup_simhash_md5",
    "doc_winnow_fingerprints_md5",
    "doc_lang_classifier_auc",
    # decontamination / span-dedup family
    "doc_decontamination",
    "doc_span_decontaminated",
    "doc_span_dedup_keep_first",
    "doc_duplicate_spans",
    "doc_repetition_signals",
    "doc_bloom_contamination",
    "doc_overlap_pairs",
    # r7b source-stats family
    "source_zipf_slope",
    "vocab_coverage_curve",
    "source_js_divergence",
    "source_data_card",
    "source_ngram_overlap",
    "token_bigram_pmi",
    # doc-quality / curation long tail
    "doc_gopher_rules",
    "doc_pii_redaction",
    "doc_dsir_importance",
    "doc_weighted_sample",
    "doc_split_counts",
    "doc_unigram_surprisal",
    "doc_token_entropy",
    "doc_perplexity_buckets",
    "doc_contrastive_negatives",
    "doc_bm25_rarest_terms",
    "doc_token_chunks",
    "doc_nfc_normalization",
    # remaining never-verified analytics
    "orders_nearby_count",
    "orders_profile",
    "events_daily_dense",
    "event_type_daily_bursts",
    # three stable veterans filling the window to 50
    "q1_pricing_summary",
    "daily_top_events",
    "events_daily_counts",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registered suite: rotation set first, then remaining oracled
    queries, then rows-only.

    The driver evaluates only the first 50 entries.  Oracled queries
    carry the hard hash-vs-DuckDB signal, so they are emitted ahead of
    rows-only ones; within each class registration order is preserved
    (stable sort), so additions never displace the evaluated window —
    tests/test_driver_contract.py pins the exact window contents and
    the deliberate overflow set (gated by the in-repo contract test).
    """
    rot = {n: i for i, n in enumerate(WINDOW_ROTATION)}
    ordered = sorted(
        plans.QUERIES.items(),
        key=lambda kv: (
            0 if kv[0] in rot else (1 if kv[0] in plans.ORACLES else 2),
            rot.get(kv[0], 0),
        ),
    )
    return dict(ordered)


def oracle_sql() -> dict[str, str]:
    return dict(plans.ORACLES)
