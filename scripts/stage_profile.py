#!/usr/bin/env python
"""Per-stage profile of one registered query: duration, task count,
shuffle read/write bytes, input bytes — via the REST status API.

Usage: python scripts/stage_profile.py name [--runs N]

Exploratory instrument (guide §1/§7.1): shows WHERE a query's time goes
(which exchange carries which bytes) so optimization targets the right
stage.  Not for keep/revert decisions — use query_ab.py for those.
"""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from org_revue_de_presse_trends_spark import plans
from org_revue_de_presse_trends_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("name")
    p.add_argument("--runs", type=int, default=2)
    ns = p.parse_args()
    spark = get_spark(
        app_name="stage-profile", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages():
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
            return json.load(r)

    for run in range(ns.runs):
        before = {s["stageId"] for s in stages()}
        spark.sparkContext.setJobDescription(f"{ns.name} run{run}")
        t0 = time.perf_counter()
        plans.QUERIES[ns.name](spark, SF).collect()
        wall = time.perf_counter() - t0
        time.sleep(0.5)
        new = [s for s in stages() if s["stageId"] not in before
               and s["status"] != "SKIPPED"]
        new.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(f"\n=== {ns.name} run{run}: wall {wall:.3f}s, "
              f"{len(new)} executed stages "
              f"(+{sum(1 for s in stages() if s['stageId'] not in before) - len(new)} skipped)")
        print(f"{'stage':>6} {'runTime':>8} {'tasks':>5} {'in MB':>8} "
              f"{'shRd MB':>8} {'shWr MB':>8}  name")
        for s in new[:18]:
            print(f"{s['stageId']:>6} {s.get('executorRunTime', 0)/1e3:>8.2f} "
                  f"{s.get('numCompleteTasks', 0):>5} "
                  f"{s.get('inputBytes', 0)/1e6:>8.1f} "
                  f"{s.get('shuffleReadBytes', 0)/1e6:>8.1f} "
                  f"{s.get('shuffleWriteBytes', 0)/1e6:>8.1f}  "
                  f"{s.get('name', '')[:70]}")
    spark.stop()


if __name__ == "__main__":
    main()
