#!/usr/bin/env python
"""A/B probe for the r7 media near-dup in-suite regression.

Usage: python scripts/media_ab.py [pre_query ...]

Runs the optional PRE queries first (suspected suite-state polluters),
then times the media trio 3x each, printing per-run wall times.  Fresh
session per invocation — compare a no-PRE run against a PRE run.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from org_revue_de_presse_trends_spark import plans
from org_revue_de_presse_trends_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MEDIA = [
    "image_near_dup_from_docs",
    "audio_near_dup_from_docs",
    "video_near_dup_from_docs",
]


def main() -> None:
    pre = sys.argv[1:]
    spark = get_spark(app_name="media-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        plans.QUERIES[name](spark, SF).collect()
        return round(time.perf_counter() - t0, 3)

    for n in pre:
        print(f"pre    {n:40s} {run(n)}", flush=True)
    for rep in range(3):
        for n in MEDIA:
            print(f"media{rep} {n:40s} {run(n)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
