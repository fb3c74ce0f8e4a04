#!/usr/bin/env python
"""Is the in-suite media slowdown JVM GC? Run the suite bench-style,
then alternate image runs while sampling GC MXBean collection time."""
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


def gc_stats(spark):
    mf = spark._jvm.java.lang.management.ManagementFactory
    tot_ms, tot_n = 0, 0
    for b in mf.getGarbageCollectorMXBeans():
        tot_ms += b.getCollectionTime()
        tot_n += b.getCollectionCount()
    mem = mf.getMemoryMXBean().getHeapMemoryUsage()
    return tot_ms, tot_n, round(mem.getUsed() / 2**30, 2)


def main() -> None:
    spark = get_spark(app_name="gc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    mc = MetricsCollector(spark)
    t0 = time.perf_counter()
    for n in plans.QUERIES:
        if n == IMG:
            continue
        try:
            bench.timed_collect(spark, plans.QUERIES[n], SF, n, collector=mc)
        except Exception as e:  # noqa: BLE001
            print("P err", n, type(e).__name__, flush=True)
    print(f"P suite done {time.perf_counter()-t0:.0f}s", flush=True)
    # warm image fully
    for _ in range(4):
        plans.QUERIES[IMG](spark, SF).collect()
    for rep in range(8):
        g0 = gc_stats(spark)
        t0 = time.perf_counter()
        _, qm = bench.timed_collect(
            spark, plans.QUERIES[IMG], SF, IMG, collector=mc
        )
        dt = time.perf_counter() - t0
        g1 = gc_stats(spark)
        print(
            f"P image rep{rep} wall={dt:.2f} qm_wall={qm.wall_sec:.2f} "
            f"gc_ms=+{g1[0]-g0[0]} gc_n=+{g1[1]-g0[1]} heap={g1[2]}G",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
