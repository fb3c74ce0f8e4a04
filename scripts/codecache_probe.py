#!/usr/bin/env python
"""Probe: does JIT code-cache occupancy explain the late-suite media
slowdown?  Runs every registered query once (the bench's cold pass),
sampling the JVM code-heap pools and re-timing the image query every
30 queries."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from org_revue_de_presse_trends_spark import plans
from org_revue_de_presse_trends_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def code_heaps(spark) -> dict:
    mf = spark._jvm.java.lang.management.ManagementFactory
    out = {}
    for pool in mf.getMemoryPoolMXBeans():
        name = pool.getName()
        if "Code" in name or "code" in name:
            u = pool.getUsage()
            out[name] = (round(u.getUsed() / 2**20, 1),
                         round(u.getMax() / 2**20, 1))
    return out


def main() -> None:
    spark = get_spark(app_name="codecache-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        plans.QUERIES[name](spark, SF).collect()
        return round(time.perf_counter() - t0, 3)

    # prime image once (pay worker spawn) so re-timings are warm-ish
    print("P image prime", run("image_near_dup_from_docs"), flush=True)
    print("P heaps", code_heaps(spark), flush=True)
    names = [n for n in plans.QUERIES
             if n != "image_near_dup_from_docs"]
    for i, n in enumerate(names):
        try:
            run(n)
        except Exception as e:  # noqa: BLE001
            print("P err", n, type(e).__name__, flush=True)
        if (i + 1) % 30 == 0:
            print(f"P after{i+1} image", run("image_near_dup_from_docs"),
                  code_heaps(spark), flush=True)
    print("P final image", run("image_near_dup_from_docs"),
          run("image_near_dup_from_docs"), code_heaps(spark), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
