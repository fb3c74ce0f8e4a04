#!/usr/bin/env python
"""Bisect the in-suite media slowdown: run the whole suite once the
way bench.py does (watchdog thread per query + MetricsCollector),
then time the image query several ways in the SAME session.

Usage: python scripts/suite_state_probe.py [--no-collector] [--no-thread]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from org_revue_de_presse_trends_spark import plans
from org_revue_de_presse_trends_spark.observability import MetricsCollector
from org_revue_de_presse_trends_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
IMG = "image_near_dup_from_docs"


def main() -> None:
    use_collector = "--no-collector" not in sys.argv
    use_thread = "--no-thread" not in sys.argv
    spark = get_spark(app_name="suite-state-probe")
    spark.sparkContext.setLogLevel("ERROR")
    mc = MetricsCollector(spark) if use_collector else None

    def run_bench_style(name: str) -> float:
        t0 = time.perf_counter()
        if use_thread:
            if mc is not None:
                bench.timed_collect(spark, plans.QUERIES[name], SF, name,
                                    collector=mc)
            else:
                bench.timed_collect(spark, plans.QUERIES[name], SF, name)
        else:
            plans.QUERIES[name](spark, SF).collect()
        return round(time.perf_counter() - t0, 3)

    t_suite0 = time.perf_counter()
    for i, n in enumerate(plans.QUERIES):
        if n == IMG:
            continue
        try:
            run_bench_style(n)
        except Exception as e:  # noqa: BLE001
            print("P err", n, type(e).__name__, flush=True)
        if (i + 1) % 40 == 0:
            print(f"P progress {i+1} ({time.perf_counter()-t_suite0:.0f}s)",
                  flush=True)
    print(f"P suite done in {time.perf_counter()-t_suite0:.0f}s "
          f"(collector={use_collector} thread={use_thread})", flush=True)

    # now the image query, several ways, same session
    for rep in range(4):
        t0 = time.perf_counter()
        plans.QUERIES[IMG](spark, SF).collect()
        print(f"P image plain-mainthread rep{rep} "
              f"{time.perf_counter()-t0:.3f}", flush=True)
    for rep in range(2):
        print(f"P image bench-style rep{rep} {run_bench_style(IMG)}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
