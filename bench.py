#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Timing = full materialization (collect) per query, after a warm-up
action that triggers JVM/codegen warm paths.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from org_revue_de_presse_trends_spark import plans
from org_revue_de_presse_trends_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_supplier_nation_revenue",
    "daily_top_events",
    "events_daily_counts",
    "argmax_event_per_user",
    "asof_click_before_purchase",
    "orders_excluding_building_anti",
    "orders_left_join_big_lines",
    "lateral_top2_orders_per_customer",
    "grouping_sets_order_stats",
    "qty_price_correlation",
    "running_total_per_customer",
    "user_value_zscores",
    "sessionize_events",
    "events_time_rollup",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_clusters",
    "corpus_selection",
    "corpus_selection_lsh",
    "doc_top_tfidf_terms",
    "doc_winnow_fingerprints",
    "packed_sequences",
    "embedding_lsh_near_dup",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "doc_decontamination",
    "doc_repetition_signals",
    "doc_domain_mixture",
]


#: per-query wall ceiling — ~30× the slowest healthy sf0.1 query; a
#: hang must not zero the whole round's perf signal (the r03 lesson,
#: extended from exceptions to stalls)
QUERY_TIMEOUT_S = float(os.environ.get("SPARK_GRAFT_QUERY_TIMEOUT_S", "180"))


def timed_collect(spark, fn, sf_dir: str, name: str, timeout_s: float = None):
    """Run ``fn(spark, sf_dir).collect()`` with a watchdog: the query
    executes in a worker thread under its own job group (job groups are
    thread-local), and on timeout the group is cancelled so executors
    stop burning CPU before the next query starts.  Raises TimeoutError
    on expiry, re-raises the query's own exception otherwise."""
    import threading

    timeout_s = QUERY_TIMEOUT_S if timeout_s is None else timeout_s
    group = f"bench:{name}"
    box: dict = {}

    def run():
        spark.sparkContext.setJobGroup(group, name, True)
        try:
            box["rows"] = fn(spark, sf_dir).collect()
        except BaseException as e:  # noqa: BLE001 — reported by caller
            box["err"] = e

    t = threading.Thread(target=run, name=group, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        spark.sparkContext.cancelJobGroup(group)
        t.join(30)
        raise TimeoutError(
            f"{name}: exceeded {timeout_s:.0f}s; job group cancelled"
        )
    if "err" in box:
        raise box["err"]
    return box["rows"]


def _cpu_calibration() -> float:
    """Fixed pure-Python workload, timed immediately before AND after
    the suite (both reported): the host is a shared VM with visible
    steal time (identical runs vary ±50%), so absolute query timings
    are only comparable across rounds after normalizing by these."""
    t0 = time.perf_counter()
    s = 0
    for i in range(10_000_000):
        s += i * i
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    calib_before = _cpu_calibration()
    spark = get_spark(app_name="trends-spark-bench")
    spark.sparkContext.setLogLevel("WARN")

    # warm-up: touch every input once so the first timed query doesn't
    # pay JVM classloading
    from org_revue_de_presse_trends_spark.catalog import TABLES, load_table

    for t in TABLES:
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:  # noqa: BLE001 — a drifted/missing fixture
            pass  # surfaces per-query below instead of killing the run

    # two passes per query: the first pays one-time plan/codegen costs
    # (which amortize to zero at scale), the second measures
    # steady-state execution.  "value" = warm total; cold timings are
    # reported alongside for transparency.
    # Per-query error isolation: one failing query must not zero the
    # round's entire perf signal (r03 lesson — an AnalysisException at
    # query 15/29 left BENCH_r03 with no data at all). Failures are
    # recorded under "errors" (exception class + first line) and the
    # remaining queries still get timed.
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = plans.QUERIES[name]
        try:
            t0 = time.perf_counter()
            timed_collect(spark, fn, sf_dir, name)
            cold[name] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            timed_collect(spark, fn, sf_dir, name)
            warm[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001 — harness boundary
            first_line = str(e).strip().splitlines()[0][:300] if str(e) else ""
            errors[name] = f"{type(e).__name__}: {first_line}"

    total = round(sum(warm.values()), 3)
    calib_after = _cpu_calibration()
    # Host-noise-normalized headline: the shared VM shows ±50% steal
    # time across identical runs, so cross-round comparisons divide by
    # the mean bracketing calibration (fixed pure-Python loop).
    calib_mean = (calib_before + calib_after) / 2 or 1.0
    print(
        json.dumps(
            {
                "metric": "headline_suite_runtime_warm",
                "value": total,
                "unit": "sec",
                "queries": warm,
                "queries_cold_first_run": cold,
                "cold_total": round(sum(cold.values()), 3),
                "errors": errors,
                "n_failed": len(errors),
                # host-noise normalizers: same fixed loop timed before
                # and after the suite brackets the measured window
                "cpu_calib_sec": calib_before,
                "cpu_calib_sec_after": calib_after,
                "value_normalized": round(total / calib_mean, 3),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
