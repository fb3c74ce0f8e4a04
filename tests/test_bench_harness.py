"""Bench-harness robustness: the watchdog must convert a hanging query
into one recorded error while later queries keep running (r03 lesson,
extended from exceptions to stalls)."""

from __future__ import annotations

import sys
import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from bench import build_payload, timed_collect  # noqa: E402


def _fast(spark, sf_dir):
    return spark.range(10).select(F.col("id"))


def _slow(spark, sf_dir):
    # ~minutes of real executor work at local[32]; must be cancelled
    big = spark.range(3_000_000_000)
    return big.alias("a").join(
        big.alias("b"), F.col("a.id") % 1000 == F.col("b.id") % 1000
    ).agg(F.count(F.lit(1)).alias("n"))


def _raises(spark, sf_dir):
    raise ValueError("boom")


def test_timed_collect_returns_rows(spark):
    rows = timed_collect(spark, _fast, "", "fast", timeout_s=60)
    assert len(rows) == 10


def test_timed_collect_reraises_query_error(spark):
    with pytest.raises(ValueError, match="boom"):
        timed_collect(spark, _raises, "", "raises", timeout_s=60)


def test_timed_collect_with_collector_returns_metrics(spark):
    """The warm pass composes the watchdog with MetricsCollector: same
    rows back, plus per-query counters attributed via the watchdog's
    own job group (so cancellation still owns the group)."""
    from org_revue_de_presse_trends_spark.observability import (
        MetricsCollector,
    )

    def q(spark, sf_dir):
        return (
            spark.range(10_000)
            .groupBy((F.col("id") % 7).alias("k"))
            .agg(F.count(F.lit(1)).alias("n"))
        )

    rows, qm = timed_collect(
        spark, q, "", "with-metrics", timeout_s=120,
        collector=MetricsCollector(spark),
    )
    assert len(rows) == 7
    assert qm.result_rows == 7
    assert qm.n_jobs >= 1 and qm.n_tasks >= 1
    assert qm.shuffle_bytes_written > 0  # groupBy shuffles


def test_payload_tail_carries_critical_fields():
    """The driver archives only the LAST ~2000 chars of the printed
    line.  At 79+ headline queries the warm map alone exceeds that
    window, so the contract (re-cut in r10, review-caught: the old
    errors-BEFORE-queries order silently pushed errors/n_failed out
    of the archive, and this test had been shrunk to n=57 to stay
    green) is now: the critical SCALAR section — errors summary,
    n_failed, value, every normalized total — always fits, even with
    100 headline queries AND a multi-error round; the warm map sits
    immediately before it so its suffix fills whatever window
    remains."""
    import json

    n = 100
    qnames = [f"query_name_number_{i:02d}" for i in range(n)]
    sec_names = [f"secondary_query_num_{i:02d}" for i in range(30)]
    warm = {q: 1.234 for q in qnames}
    warm_sec = {q: 0.123 for q in sec_names}
    cold = {q: 2.345 for q in qnames + sec_names}
    io = {
        q: {"read_mb": 12.34, "shuffle_mb": 5.67, "spill_mb": 0.0,
            "tasks": 64, "rows": 1000}
        for q in qnames + sec_names
    }
    series = [["query_name_number_20", 0.5, 2.1],
              ["query_name_number_40", 0.5, 2.05]]
    many_errors = {
        f"failing_query_{i:02d}": "Boom: " + "x" * 500 for i in range(12)
    }
    line = json.dumps(
        build_payload(0.1, io, cold, warm, many_errors,
                      0.5, 0.52, warm_sec, None, series,
                      par_calib_before=2.0, par_calib_after=2.2)
    )
    tail = line[-2000:]
    assert '"errors"' in tail and '"n_failed"' in tail
    assert '"n_failed": 12' in tail
    assert '"value"' in tail
    assert '"value_normalized"' in tail
    assert '"value_normalized_par"' in tail
    assert '"value_normalized_robust"' in tail
    assert '"calib_burst"' in tail
    # the tail errors summary is bounded (≤8 entries, ≤100 chars each,
    # overflow counted) while the full detail rides in the head zone
    payload = json.loads(line)
    assert len(payload["errors"]) == 9 and payload["errors"]["__more__"]
    assert all(len(v) <= 100 for v in payload["errors"].values())
    assert payload["errors_detail"]["failing_query_00"].endswith("x")
    assert len(payload["errors_detail"]) == 12
    # a long warm-map suffix is recoverable from the tail
    assert tail.count('"query_name_number_99": 1.234') == 1
    # order pin: the critical keys are the LAST keys; the warm map
    # sits immediately before them; secondary is sacrificial head
    keys = list(payload.keys())
    assert keys[-9:] == [
        "queries", "errors", "n_failed", "value", "value_normalized",
        "value_normalized_par", "par_calib_median", "calib_burst",
        "value_normalized_robust",
    ]
    # the critical scalar section itself always fits: from "errors"
    # (after the warm map) to line end is well under the 2000 window
    assert len(line) - line.rindex('"errors"') < 1800
    payload = json.loads(line)
    assert payload["value_normalized_par"] == round(
        payload["value"] / 2.1, 3
    )
    # THE round-over-round number: total over the trimmed median of
    # every parallel sample {2.0, 2.1, 2.05, 2.2} (n<5: plain median)
    assert payload["par_calib_median"] == 2.075
    assert payload["value_normalized_robust"] == round(
        payload["value"] / 2.075, 3
    )
    assert payload["calib_burst"] is False
    assert keys.index("queries_secondary") < keys.index("errors")
    assert json.loads(line)["secondary_total"] == round(0.123 * 30, 3)
    # the spike-retry report is sacrificial head weight too
    assert keys.index("warm_retries") < keys.index("queries_secondary")


def test_timed_collect_cancels_hanging_query_and_recovers(spark):
    t0 = time.perf_counter()
    with pytest.raises(TimeoutError, match="hang"):
        timed_collect(spark, _slow, "", "hang", timeout_s=5)
    elapsed = time.perf_counter() - t0
    assert elapsed < 45, f"watchdog took {elapsed:.0f}s to fire+cancel"
    # the session must be healthy for the NEXT query (the whole point)
    rows = timed_collect(spark, _fast, "", "after-hang", timeout_s=60)
    assert len(rows) == 10


def test_bench_compare_prefers_parallel_calibration():
    """scripts/bench_compare normalizes per-query timings by the
    NEAREST calibration sample, preferring the JVM-parallel sample
    when both artifacts carry it (r8: a co-tenant burst slows the
    32-way suite while the single-thread sample speeds up, inverting
    single-thread normalization)."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from bench_compare import compare

    # old run: quiet host — calib 1.0 everywhere, query takes 1 s
    old = {
        "queries": {"q": 1.0},
        "queries_secondary": {},
        "cpu_calib_sec": 1.0,
        "cpu_calib_sec_after": 1.0,
        "par_calib_sec": 1.0,
        "par_calib_sec_after": 1.0,
        "cpu_calib_series": [],
    }
    # new run: parallel throughput halved (steal), single-thread
    # calib unchanged; the query doubles with the parallel resource
    new = {
        "queries": {"q": 2.0},
        "queries_secondary": {},
        "cpu_calib_sec": 1.0,
        "cpu_calib_sec_after": 1.0,
        "par_calib_sec": 2.0,
        "par_calib_sec_after": 2.0,
        "cpu_calib_series": [],
    }
    out = compare(old, new, threshold=1.3)
    # parallel-normalized: 2.0/2.0 vs 1.0/1.0 -> ratio 1.0, no
    # regression flagged (single-thread normalization would say 2x)
    assert out["normalized_total_ratio"] == 1.0
    assert out["regressions"] == []

    # r7-style artifacts (no parallel samples) fall back to the
    # single-thread normalizer: the same timings DO flag a regression
    for d in (old, new):
        d.pop("par_calib_sec"), d.pop("par_calib_sec_after")
    out = compare(old, new, threshold=1.3)
    assert out["normalized_total_ratio"] == 2.0
    assert [r["query"] for r in out["regressions"]] == ["q"]


def test_bench_compare_parses_driver_tail_wrapper(tmp_path):
    """The driver archives BENCH_r{N}.json as {"n","rc","cpus","sf",
    "tail": <last ~2000 chars of the printed line>} — the comparer must
    reconstruct the visible headline subset from that wrapper (r8
    verdict item 2b: it returned n_common: 0 on its own round
    artifacts)."""
    import json

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from bench_compare import _load, compare

    n = 60
    warm = {f"query_name_number_{i:02d}": 1.0 + i / 100 for i in range(n)}
    payload = build_payload(
        0.1,
        {q: {"read_mb": 9.99, "shuffle_mb": 1.11, "spill_mb": 0.0,
             "tasks": 64, "rows": 500} for q in warm},
        {q: 2.0 for q in warm},
        warm,
        {},
        0.5, 0.52,
        {f"sec_{i:02d}": 0.2 for i in range(30)},
        par_calib_before=1.0, par_calib_after=1.0,
    )
    line = json.dumps(payload)
    wrapped = {"n": 9, "rc": 0, "cpus": 32, "sf": 0.1,
               "tail": line[-2000:] + "\n"}
    p = tmp_path / "BENCH_rXX.json"
    p.write_text(json.dumps(wrapped))
    got = _load(str(p))
    # the cut lands inside the headline map: a suffix of it must be
    # recovered verbatim, plus the trailing scalars
    assert got["value"] == payload["value"]
    assert got["value_normalized_par"] == payload["value_normalized_par"]
    recovered = got["queries"]
    assert 30 <= len(recovered) <= n
    assert all(warm[q] == v for q, v in recovered.items())
    # and compare() runs on two such wrappers with a real common subset
    out = compare(got, got, threshold=1.3)
    assert out["n_common"] == len(recovered)
    assert out["normalized_total_ratio"] == 1.0
    assert out["regressions"] == [] and out["improvements"] == []

    # full payloads still load unchanged
    p2 = tmp_path / "bench_full.json"
    p2.write_text(line)
    assert _load(str(p2))["queries"] == warm


def test_bench_compare_tail_cut_inside_nested_object(tmp_path):
    """A tail whose cut lands INSIDE a nested query_io entry (depth 2)
    must still reconstruct: the partial inner object is synthetic-
    prefix junk, the later real fields parse as siblings, and the
    flat-numeric heuristic must NOT mislabel the junk as the headline
    map when a real \"queries\" key is present."""
    import json

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from bench_compare import _from_tail

    warm = {f"q{i:02d}": 1.0 for i in range(5)}
    payload = build_payload(
        0.1,
        {q: {"read_mb": 1.0, "shuffle_mb": 2.0, "spill_mb": 0.0,
             "tasks": 8, "rows": 100} for q in warm},
        {q: 2.0 for q in warm}, warm, {}, 0.5, 0.5,
        par_calib_before=1.0, par_calib_after=1.0,
    )
    line = json.dumps(payload)
    # cut mid-way through the FIRST query_io entry's inner dict
    cut_at = line.index('"shuffle_mb"')
    got = _from_tail(line[cut_at:])
    assert got["queries"] == warm
    assert got["value"] == payload["value"]
    # the junk key from the partial inner object must not leak into
    # the comparison maps
    assert "shuffle_mb" not in got["queries"]
    assert "shuffle_mb" not in got.get("queries_secondary", {})


def test_bench_compare_nearest_window_localizes_burst():
    """A mid-run noise burst captured by one interleaved sample must
    normalize only the queries in its window."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from bench_compare import compare

    base = {
        "cpu_calib_sec": 1.0, "cpu_calib_sec_after": 1.0,
        "par_calib_sec": 1.0, "par_calib_sec_after": 1.0,
    }
    names = [f"q{i}" for i in range(40)]
    old = dict(
        base,
        queries={n: 1.0 for n in names},
        queries_secondary={},
        cpu_calib_series=[[names[19], 1.0, 1.0]],
    )
    # burst hits the SECOND half of the new run and lasts to the end:
    # queries 20.. take 3x, and both the mid-suite parallel sample
    # (taken after q19) and the after-suite sample read 3x
    new = dict(
        base,
        queries={n: (3.0 if i >= 20 else 1.0) for i, n in enumerate(names)},
        queries_secondary={},
        cpu_calib_series=[[names[19], 1.0, 3.0]],
        par_calib_sec_after=3.0,
    )
    out = compare(old, new, threshold=1.3)
    flagged = {r["query"] for r in out["regressions"]}
    # first-half queries (normalized by the quiet before-sample on the
    # old run and ~quiet window on the new) stay unflagged; the burst
    # half normalizes by the 3x sample and stays unflagged too — the
    # comparison correctly attributes the burst to the host
    assert flagged.isdisjoint(set(names[:10])), flagged
    assert not {f"q{i}" for i in range(25, 35)} & flagged, flagged

def test_slow_warmup_guard_fires_on_injected_warm_over_cold():
    """r9 verdict item 3: a load burst that inflates the warm sample to
    just-above-cold (ann_ivf_topk archived warm 1.59 s vs cold 1.34 s,
    1.19x — below the 1.4x single-retry trigger) must now enter the
    improving-reruns loop.  Synthetic injected-delay shape: steady
    query, burst adds +0.25 s to the warm pass only."""
    from bench import _needs_slow_warmup, _spike_guard_trips

    cold, steady = 1.34, 1.30
    burst_warm = steady + 0.29  # the archived r9 sample
    assert not _spike_guard_trips(burst_warm, cold)  # the r9 hole
    assert _needs_slow_warmup(burst_warm, cold)      # now covered
    # steady state itself never triggers (warm <= cold, both small)
    assert not _needs_slow_warmup(steady, cold)
    # trivial queries stay exempt: sub-0.5s cold jitter is noise
    assert not _needs_slow_warmup(0.14, 0.12)
    # the two pre-existing arms still fire
    assert _needs_slow_warmup(5.0, 4.0)    # >3s absolute
    assert _needs_slow_warmup(1.0, 20.0)   # cold >> warm (mid-decay)


def test_trimmed_median_drops_burst_polluted_sample():
    """One steal-burst-polluted calib sample must not move the anchor
    (r9: endpoint par samples 0.23-0.31 mid-burst vs 0.906 quiet)."""
    from bench import _trimmed_median

    quiet = [0.90, 0.91, 0.89, 0.92, 0.88, 0.90]
    assert _trimmed_median(quiet + [0.23]) == 0.90  # burst trimmed away
    assert _trimmed_median([]) is None
    assert _trimmed_median([None, 0.0]) is None     # failed calibs only
    assert _trimmed_median([2.0, 2.2]) == 2.1       # n<5: plain median


def test_payload_flags_calib_burst_dispersion():
    """calib_burst is the machine-readable marker that the parallel
    samples themselves disagree >1.5x — a total from such a run needs
    the series read before it is trusted round-over-round."""
    from bench import build_payload

    warm = {"q": 1.0}
    base = dict(sf=0.1, query_io={}, cold={"q": 1.2}, warm=warm,
                errors={}, calib_before=0.5, calib_after=0.5)
    quiet = build_payload(
        *base.values(), None, None,
        [["q", 0.5, 0.9]], par_calib_before=0.88, par_calib_after=0.92,
    )
    assert quiet["calib_burst"] is False
    burst = build_payload(
        *base.values(), None, None,
        [["q", 0.5, 0.9]], par_calib_before=0.30, par_calib_after=0.92,
    )
    assert burst["calib_burst"] is True
    # the robust total still exists (median of the kept samples)
    assert burst["value_normalized_robust"] is not None


def test_bench_compare_reports_robust_total():
    """r9 verdict item 4: when both artifacts carry
    value_normalized_robust (the trimmed-median-anchored total), the
    comparer surfaces it with its ratio and each side's burst flag —
    THE number round-over-round reads."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from bench_compare import compare

    old = {"queries": {"q": 1.0}, "queries_secondary": {},
           "value_normalized_robust": 100.0, "calib_burst": False}
    new = {"queries": {"q": 1.1}, "queries_secondary": {},
           "value_normalized_robust": 105.0, "calib_burst": True}
    out = compare(old, new)
    r = out["value_normalized_robust"]
    assert r["old"] == 100.0 and r["new"] == 105.0
    assert r["ratio"] == 1.05
    assert r["old_calib_burst"] is False and r["new_calib_burst"] is True
    # absent on one side: no ratio, no crash (pre-r10 artifacts)
    out = compare({"queries": {"q": 1.0}}, new)
    assert "ratio" not in out["value_normalized_robust"]
