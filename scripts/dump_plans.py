#!/usr/bin/env python
"""Dump .explain("formatted") for registered queries to plans/r11/.

Usage: python scripts/dump_plans.py [--suffix before|after] [names ...]

With no names, dumps EVERY registered query (the r11 optimization
round's measure-first sweep).  Never run concurrently with bench.py
(the r7c session-pollution lesson).  Output files:
plans/r11/<query>_<suffix>.txt
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from org_revue_de_presse_trends_spark import plans
from org_revue_de_presse_trends_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import argparse
    from contextlib import redirect_stdout

    p = argparse.ArgumentParser()
    p.add_argument("names", nargs="*")
    p.add_argument("--suffix", default="before")
    p.add_argument("--outdir", default=None)
    ns = p.parse_args()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = ns.outdir or os.path.join(here, "plans", "r11")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    names = ns.names or sorted(plans.QUERIES)
    for name in names:
        path = os.path.join(outdir, f"{name}_{ns.suffix}.txt")
        try:
            df = plans.QUERIES[name](spark, SF)
            with open(path, "w") as f, redirect_stdout(f):
                df.explain("formatted")
            print(f"wrote {path}", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"FAILED {name}: {type(e).__name__}: {e}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
