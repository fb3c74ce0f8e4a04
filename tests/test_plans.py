"""Plan-shape regression tests: the physical-plan properties
ARCHITECTURE.md claims are pinned here so they cannot silently regress
(a correct-but-shuffling plan is a perf bug at 100 TB).
"""

from __future__ import annotations

import contextlib
import io

import pytest

from org_revue_de_presse_trends_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # filter reaches the scan
    # column pruning: only the 7 needed columns in ReadSchema
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert "l_quantity" in read


def test_q3_take_ordered_and_broadcast(spark):
    plan = plan_of(spark, "q3_top_revenue_orders")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_q5_all_dims_broadcast(spark):
    plan = plan_of(spark, "q5_supplier_nation_revenue")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_pagination_take_ordered(spark):
    plan = plan_of(spark, "topk_orders_paginated")
    assert "TakeOrderedAndProject" in plan


def test_anti_join_broadcast(spark):
    plan = plan_of(spark, "orders_excluding_building_anti")
    assert "LeftAnti" in plan


def test_no_cartesian_anywhere(spark):
    """No query may compile to an unconstrained CartesianProduct; the
    only nested-loop allowed is broadcast-side (J4/banded joins)."""
    for name in sorted(QUERIES):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name


def test_ann_two_phase_topk(spark):
    """ANN ranking must be two-phase: a partial top-k keyed by
    (query_id, spark_partition_id) before the final per-query window —
    otherwise every scored row shuffles into |queries| reducers and one
    reducer holds a corpus-sized partition at 100×."""
    for name in ("ann_cosine_topk", "ann_ivf_topk", "ann_pq_topk"):
        plan = plan_of(spark, name)
        assert plan.count("Window") >= 2, name
        assert "SPARK_PARTITION_ID" in plan.upper(), name


def test_lateral_decorrelates_to_window(spark):
    """The correlated LATERAL + LIMIT must decorrelate into a single
    windowed-rank plan — per-customer subquery re-execution would be
    |customer| jobs at scale."""
    plan = plan_of(spark, "lateral_top2_orders_per_customer")
    assert "Window" in plan
    assert "CartesianProduct" not in plan


def test_argmax_single_aggregate_no_window(spark):
    """A4 via max_by must stay a hash aggregate (map-side partial), not
    a sort-window plan."""
    plan = plan_of(spark, "argmax_event_per_user")
    assert "Window" not in plan
    assert "Aggregate" in plan


def test_nation_pair_revenue_broadcasts_all_dims(spark):
    """Q7 shape: supplier/customer/nation broadcast; the only
    SortMergeJoin (if any) is the lineitem-orders fact join."""
    plan = plan_of(spark, "nation_pair_revenue")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_late_lines_is_semi_join(spark):
    plan = plan_of(spark, "orders_with_late_lines")
    assert "LeftSemi" in plan


def test_embedding_lsh_srp_plan_shape(spark):
    """The round-5 SRP pipeline claims (operators/dedup.py): signatures
    come from one Arrow-batched matmul (MapInPandas), pairs from one
    per-bucket blocked matmul (FlatMapGroupsInPandas), and the plan has
    NO joins and exactly ONE exchange (the bucket groupBy) — no
    candidate-pair shuffle, no vector re-attach joins, no pair-dedup
    aggregate (the first-colliding-band filter runs in-group)."""
    df = QUERIES["embedding_lsh_near_dup"](spark, SF)
    static = io.StringIO()
    with contextlib.redirect_stdout(static):
        df.explain("formatted")
    plan = static.getvalue()
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan
    assert "dropDuplicates" not in plan
    assert plan.count("Exchange") <= 2  # plan node + its detail block


def test_decontamination_broadcasts_benchmark(spark):
    """The corpus side must never shuffle: benchmark hashes broadcast."""
    plan = plan_of(spark, "doc_decontamination")
    assert "BroadcastHashJoin" in plan


def test_orders_nearby_count_aggregate_pushdown_shape(spark):
    """The range-join count rewrite: per-day counts + RANGE window +
    broadcast join back — the plan must show exactly that (a banded
    pair join would show a shuffled join and no Window)."""
    plan = plan_of(spark, "orders_nearby_count")
    assert "Window" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_events_daily_dense_spine_broadcasts_daily(spark):
    """Date-spine densification: the daily-count side is broadcast
    (pre-aggregated, tiny) — the spine must not shuffle."""
    plan = plan_of(spark, "events_daily_dense")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bigram_pmi_broadcast_counts_and_topk(spark):
    """PMI: unigram-count and total-count sides broadcast; the final
    top-20 is TakeOrderedAndProject, never a global sort."""
    plan = plan_of(spark, "token_bigram_pmi")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_q4_exists_is_semi_join(spark):
    """The decorrelated EXISTS: left-semi, never a full join + dedup."""
    plan = plan_of(spark, "q4_priority_with_late_lines")
    assert "LeftSemi" in plan


def test_q6_predicates_reach_the_scan(spark):
    """The canonical pushdown scan: both range predicates appear as
    PushedFilters on the lineitem parquet scan, and ReadSchema carries
    only the three needed columns."""
    plan = plan_of(spark, "q6_forecast_revenue_change")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "l_discount" in pushed and "l_quantity" in pushed
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" in read and "l_orderkey" not in read


def test_q8_dims_broadcast(spark):
    """lineitem⋈orders is the only big join; the supplier-nation and
    customer-nation-region dims broadcast."""
    plan = plan_of(spark, "q8_market_share")
    assert plan.count("BroadcastHashJoin") >= 2


def test_q21_decorrelated_to_aggregates(spark):
    """EXISTS + NOT EXISTS became per-order aggregates: the plan joins
    lineitem-derived frames, with no nested-loop / cartesian anywhere."""
    plan = plan_of(spark, "q21_waiting_suppliers")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_html_extract_is_zero_shuffle_map(spark):
    """doc_html_extract claims a pure map stage: no exchange beyond
    the spread_for_cpu round-robin repartition, no join, no
    aggregate — the 16-stage regex chain fuses into the scan."""
    plan = plan_of(spark, "doc_html_extract")
    assert "Join" not in plan
    assert "HashAggregate" not in plan
    # spread_for_cpu introduces exactly one round-robin exchange
    assert plan.count("Exchange") <= 2  # plan node + detail block


def test_c4_line_filter_is_zero_shuffle(spark):
    """doc_c4_line_filter claims the OPERATOR CHAIN adds zero shuffle:
    the HOF split/filter/reassembly never leaves the row — the only
    exchange is spread_for_cpu's guarded round-robin repartition (r11:
    the single-split scan serialized the whole regex+HOF chain into
    one task; the html_extract precedent)."""
    plan = plan_of(spark, "doc_c4_line_filter")
    assert "Join" not in plan
    assert "HashAggregate" not in plan
    assert plan.count("Exchange") <= 2  # plan node + detail block
    assert "Generate" not in plan  # no explode — HOFs only


def test_line_dedup_two_aggregates_no_pair_join(spark):
    """doc_line_dedup claims: kept set == the norm aggregate's output
    (no join back to the exploded stream) — so the plan holds exactly
    the two hash aggregates' exchanges plus the totality join on the
    unique doc key, and no window over the line."""
    plan = plan_of(spark, "doc_line_dedup")
    assert "Window" not in plan
    assert plan.count("SortMergeJoin") + plan.count(
        "BroadcastHashJoin"
    ) + plan.count("ShuffledHashJoin") >= 1  # the totality join only
    # exchanges: norm-agg, doc-agg (partial/final pairs share one
    # exchange each) + the totality join's two sides
    assert plan.count("Exchange") <= 10


def test_source_ngram_overlap_skew_salt_paths(spark):
    """The default path keeps the per-source window (its exchange is
    load-bearing — r11 dead-end note); the skew_salt path (r12, guide
    §2.5: one dominant source would serialize the window count into a
    single task at 100 TB) replaces it with a salted two-phase
    aggregate + broadcast join-back and must contain NO Window node
    and no per-source window exchange.  Outputs must be identical
    (exact integer counts)."""
    from org_revue_de_presse_trends_spark.plans.analytics_ext import (
        source_ngram_overlap,
    )

    default_plan = plan_of(spark, "source_ngram_overlap")
    assert "Window" in default_plan

    salted = source_ngram_overlap(spark, SF, skew_salt=64)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        salted.explain("formatted")
    salted_plan = buf.getvalue()
    assert "Window" not in salted_plan
    # two-phase count: (source, bucket) partial then source total
    assert "xxhash64" in salted_plan

    base = {
        tuple(r) for r in QUERIES["source_ngram_overlap"](spark, SF).collect()
    }
    got = {tuple(r) for r in salted.collect()}
    assert got == base
