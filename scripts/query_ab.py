#!/usr/bin/env python
"""Interleaved standalone A/B probe for registered queries.

Usage: python scripts/query_ab.py name [name ...] [--reps N]

Fresh tuned session; one untimed warmup pass over all names, then
``reps`` timed passes INTERLEAVED (round-robin over names, the r8d
attribution discipline — interleaving exposes host per-core drift as a
uniform shift instead of biasing one query).  Prints per-run walls,
min, and median per query.  Never run concurrently with bench.py (the
r7c session-pollution lesson).
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from org_revue_de_presse_trends_spark import plans
from org_revue_de_presse_trends_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("names", nargs="+")
    p.add_argument("--reps", type=int, default=5)
    ns = p.parse_args()
    args, reps = ns.names, ns.reps
    spark = get_spark(app_name="query-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        plans.QUERIES[name](spark, SF).collect()
        return round(time.perf_counter() - t0, 3)

    times: dict[str, list[float]] = {n: [] for n in args}
    for n in args:
        print(f"warmup {n:40s} {run(n)}", flush=True)
    for rep in range(reps):
        for n in args:
            t = run(n)
            times[n].append(t)
            print(f"run{rep}   {n:40s} {t}", flush=True)
    for n in args:
        print(
            f"RESULT {n:40s} min={min(times[n])} "
            f"median={statistics.median(times[n])} runs={times[n]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
