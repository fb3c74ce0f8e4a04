#!/usr/bin/env python
"""Missed-exchange-reuse sweep (r12): execute every registered query
and flag plans where two or more NON-reused shuffle exchanges have
textually identical subtrees after expr-id normalization — the
signature of the shingle_pair_counts bug (an optimizer-inferred filter
making one reference canonically different, so AQE materializes the
same work twice).

Usage: python scripts/reuse_sweep.py [sf_dir] [names...]
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from org_revue_de_presse_trends_spark import plans
from org_revue_de_presse_trends_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def norm(s: str) -> str:
    s = re.sub(r"#\d+[A-Za-z]*", "#x", s)
    s = re.sub(r"plan_id=\d+", "plan_id=x", s)
    s = re.sub(r"\[id=#x\]", "", s)
    return s


def subtrees(plan: str):
    """Yield (header_line, subtree_text) for every Exchange node that
    is not a ReusedExchange, using the tree indentation structure."""
    lines = plan.splitlines()
    # depth = index of the node marker ("+-" or the operator name)
    def depth(line):
        m = re.search(r"[+:]- ", line)
        return m.start() if m else (0 if line.strip() else None)

    for i, line in enumerate(lines):
        if re.search(r"\bExchange (hash|range|Round|Single)", line) and \
           "ReusedExchange" not in line:
            d = depth(line)
            if d is None:
                continue
            block = [norm(line[d:])]
            for j in range(i + 1, len(lines)):
                dj = depth(lines[j])
                if dj is not None and dj <= d and lines[j].strip():
                    break
                block.append(norm(lines[j][d:] if len(lines[j]) > d else lines[j]))
            yield norm(line.strip()), "\n".join(block)


def main() -> None:
    spark = get_spark(app_name="reuse-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[2:] or list(plans.QUERIES)
    flagged = 0
    for name in names:
        try:
            df = plans.QUERIES[name](spark, SF)
            t0 = time.perf_counter()
            df.collect()
            wall = time.perf_counter() - t0
            ep = df._jdf.queryExecution().executedPlan().toString()
            # AdaptiveSparkPlan.toString appends the pre-adaptive
            # "== Initial Plan ==" section — only the final plan counts
            ep = ep.split("== Initial Plan ==")[0]
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}", flush=True)
            continue
        seen: dict[str, int] = {}
        for hdr, block in subtrees(ep):
            # coarse key: the partitioning spec + the subtree's leaf
            # scans/generates/aggregates, FILTERS AND PROJECTS STRIPPED
            # — catches subtrees that differ only by optimizer-inferred
            # predicates (the shingle_pair_counts bug class), at the
            # cost of some false positives to inspect by hand
            keep = [
                ln for ln in block.splitlines()
                if re.search(
                    r"FileScan|Generate |HashAggregate|SortAggregate|"
                    r"Window |Expand |Exchange ", ln)
            ]
            key = hdr + "||" + "|".join(sorted(set(keep)))
            seen[key] = seen.get(key, 0) + 1
        dups = {b: c for b, c in seen.items() if c > 1}
        if dups:
            flagged += 1
            print(f"\n== {name} ({wall:.2f}s): "
                  f"{sum(dups.values())} duplicate exchange subtrees", flush=True)
            for b, c in dups.items():
                print(f"  x{c}: {b.splitlines()[0][:110]}")
        else:
            print(f"{name}: ok ({wall:.2f}s)", flush=True)
    print(f"\nflagged {flagged}/{len(names)}")
    spark.stop()


if __name__ == "__main__":
    main()
