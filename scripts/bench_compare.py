#!/usr/bin/env python
"""Round-over-round bench comparison with per-window host-noise
normalization.

Usage: python scripts/bench_compare.py OLD.json NEW.json [--threshold 1.3]

Each query's warm timing is divided by the CPU-calibration sample
nearest to it in suite order (``cpu_calib_series``, emitted every 20
queries since r8; falls back to the before/after pair) before ratios
are computed — so a mid-run host-noise burst moves the normalizer
WITH the queries it hit instead of poisoning 29 round-over-round
comparisons (the r7 failure mode).  Only queries present in both
artifacts are compared; the common-subset normalized total is the
honest headline number.
"""
from __future__ import annotations

import json
import sys


def _from_tail(tail: str) -> dict:
    """Reconstruct a partial payload from the driver's archive format:
    ``{"n":..,"rc":..,"cpus":..,"sf":..,"tail": "<last ~2000 chars of
    the printed JSON line>"}``.  build_payload orders its fields so the
    tail carries the comparison-critical ones (errors, the headline
    warm map, value, value_normalized[_par]); the cut lands mid-map, so
    we drop up to the first ``, "`` key boundary and re-open the
    enclosing braces.  The truncation depth is unknown (usually inside
    the headline "queries" map; possibly inside a nested query_io
    entry), so try deeper re-openings until one parses.  Duplicate keys
    are harmless: json keeps the LAST one, and the real "queries" /
    "value" fields come last in the line.  Calibration anchors live in
    the sacrificed head, so _calib_at falls back to 1.0 — comparisons
    against a tail artifact are RAW, exactly the honest common-subset
    number the r8 verdict computed by hand."""
    cut = tail.find(', "')
    body = tail[cut + 2 :] if cut >= 0 else tail
    for depth in range(1, 4):
        candidate = "{" + '"__tail_prefix__": {' * (depth - 1) + body
        try:
            d = json.loads(candidate)
        except json.JSONDecodeError:
            continue
        # all synthetic nesting lives under the single top-level key —
        # the fields after the truncated object parse as siblings
        partial = d.pop("__tail_prefix__", None)
        if "queries" not in d and isinstance(partial, dict) and partial and all(
            isinstance(v, (int, float)) and not isinstance(v, bool)
            for v in partial.values()
        ):
            # the cut landed inside the headline "queries" map itself
            # (its 76 entries alone span ~2 KB): the recovered flat
            # name→seconds entries ARE the visible headline subset —
            # r8's hand comparison used exactly these 64 rows
            d["queries"] = partial
        if "value" in d or "queries" in d:
            return d
    raise SystemExit(
        "could not reconstruct a payload from the tail wrapper; "
        "compare against bench_full.json from the round's commit instead"
    )


def _load(path: str) -> dict:
    d = json.load(open(path))
    if isinstance(d, dict) and isinstance(d.get("tail"), str):
        sf = d.get("sf")
        d = _from_tail(d["tail"])
        d.setdefault("sf", sf)
    return d


def _suite_order(d: dict) -> list[str]:
    return list(d.get("queries", {})) + list(d.get("queries_secondary", {}))


def _calib_at(d: dict, prefer_parallel: bool = True) -> dict[str, float]:
    """Map each query -> the calibration sample nearest to it in suite
    order.  Series entries are [last_completed_query, single_thread_sec]
    (r7) or [..., parallel_sec] (r8+).  The JVM-parallel sample is
    preferred when both artifacts carry it: the single-thread loop
    measures one core while the queries run 32-way, and a co-tenant
    burst can slow the suite while the single-thread sample speeds up
    (observed r8), inverting the normalization."""
    order = _suite_order(d)
    pos = {n: i for i, n in enumerate(order)}

    def pick(single, par):
        return par if (prefer_parallel and par) else single

    anchors: list[tuple[int, float]] = [
        (-1, pick(d.get("cpu_calib_sec", 1.0), d.get("par_calib_sec")))
    ]
    for entry in d.get("cpu_calib_series", []):
        qname, single = entry[0], entry[1]
        par = entry[2] if len(entry) > 2 else None
        if qname in pos:
            anchors.append((pos[qname], pick(single, par)))
    anchors.append(
        (
            len(order),
            pick(d.get("cpu_calib_sec_after", 1.0),
                 d.get("par_calib_sec_after")),
        )
    )
    out = {}
    for n, i in pos.items():
        nearest = min(anchors, key=lambda a: abs(a[0] - i))
        out[n] = nearest[1] or 1.0
    return out


def _has_parallel(d: dict) -> bool:
    return bool(d.get("par_calib_sec")) or any(
        len(e) > 2 and e[2] for e in d.get("cpu_calib_series", [])
    )


def compare(old: dict, new: dict, threshold: float = 1.3):
    w_old = dict(old.get("queries", {}), **old.get("queries_secondary", {}))
    w_new = dict(new.get("queries", {}), **new.get("queries_secondary", {}))
    # mixed normalizers skew ratios: use parallel only when BOTH
    # artifacts carry it
    par = _has_parallel(old) and _has_parallel(new)
    c_old = _calib_at(old, prefer_parallel=par)
    c_new = _calib_at(new, prefer_parallel=par)
    common = [n for n in w_new if n in w_old and w_old[n] > 0]
    rows = []
    tot_old = tot_new = 0.0
    for n in common:
        no = w_old[n] / c_old[n]
        nn = w_new[n] / c_new[n]
        tot_old += no
        tot_new += nn
        rows.append((nn / no if no else float("inf"), n, w_old[n], w_new[n]))
    rows.sort(reverse=True)
    # THE single trusted total (r9 verdict item 4): total over the
    # trimmed median of every JVM-parallel calib sample in the run —
    # read this ratio when both artifacts carry it; fall back to
    # normalized_total_ratio (nearest-window) otherwise.  calib_burst
    # marks an artifact whose own calib samples disagree >1.5x.
    robust = {
        "old": old.get("value_normalized_robust"),
        "new": new.get("value_normalized_robust"),
        "old_calib_burst": old.get("calib_burst"),
        "new_calib_burst": new.get("calib_burst"),
    }
    if robust["old"] and robust["new"]:
        robust["ratio"] = round(robust["new"] / robust["old"], 3)
    return {
        "n_common": len(common),
        "value_normalized_robust": robust,
        "normalized_total_ratio": round(tot_new / tot_old, 3) if tot_old else None,
        "regressions": [
            {"query": n, "ratio": round(r, 2), "old_s": o, "new_s": w}
            for r, n, o, w in rows
            if r >= threshold and w >= 0.2
        ],
        "improvements": [
            {"query": n, "ratio": round(r, 2), "old_s": o, "new_s": w}
            for r, n, o, w in reversed(rows)
            if r <= 1 / threshold and o >= 0.2
        ],
    }


def main() -> None:
    thr = 1.3
    args: list[str] = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                thr = float(a.split("=", 1)[1])
            else:  # space-separated form: --threshold 1.5
                i += 1
                thr = float(argv[i])
        else:
            args.append(a)
        i += 1
    old = _load(args[0])
    new = _load(args[1])
    print(json.dumps(compare(old, new, thr), indent=2))


if __name__ == "__main__":
    main()
