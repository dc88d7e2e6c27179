#!/usr/bin/env python3
"""Selftest for bench_ref_update.py's partial-run guard (round 19).

The hazard it pins: a SPARK_GRAFT_ONLY run carries a handful of
queries, and before the guard the updater took the run's query list as
THE surface — a single-query merge reduced a 232-row reference to one
row, silently deleting every other floor. The guard must (a) carry
absent floors through verbatim, (b) still merge the present query's
reading, (c) not pollute run_totals_sec with a partial "total".
"""
import json, subprocess, sys, tempfile, os

HERE = os.path.dirname(os.path.abspath(__file__))

ref = {
    "method": "selftest", "sf": 0.1, "n_queries": 3,
    "queries": {"q1": 1.0, "q2": 2.0, "q3": 3.0},
    "runs": {"q1": [1.0], "q2": [2.0], "q3": [3.0]},
    "provenance": {"q1": {"run": "x", "surface": 3, "calibrated": True}},
    "run_totals_sec": [6.0], "best_sum_sec": 6.0,
    "calib": {"st_ms": 100.0, "mt_ms": 100.0,
              "mem_st_ms": 100.0, "mem_mt_ms": 100.0},
}
partial_run = {
    "value": 0.4, "queries": {"q2": 0.4},
    "calib": {"st_before_ms": 100.0, "mt_before_ms": 100.0,
              "st_after_ms": 100.0, "mt_after_ms": 100.0,
              "mem_st_before_ms": 100.0, "mem_mt_before_ms": 100.0,
              "mem_st_after_ms": 100.0, "mem_mt_after_ms": 100.0},
}

with tempfile.TemporaryDirectory() as d:
    rp, pp, op = (os.path.join(d, n) for n in ("ref.json", "run.json", "out.json"))
    json.dump(ref, open(rp, "w"))
    json.dump(partial_run, open(pp, "w"))
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench_ref_update.py"),
         rp, pp, "--label", "st", "--stale-threshold", "99", "--out", op],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr + out.stdout
    assert "partial input (1 of 3" in out.stdout, out.stdout
    got = json.load(open(op))
    assert got["n_queries"] == 3, got["n_queries"]
    assert got["queries"] == {"q1": 1.0, "q2": 0.4, "q3": 3.0}, got["queries"]
    assert got["runs"]["q3"] == [3.0] and got["runs"]["q2"] == [2.0, 0.4]
    assert got["provenance"]["q1"] == ref["provenance"]["q1"], "prov lost"
    assert got["run_totals_sec"] == [6.0], "partial total polluted history"
    assert got["best_sum_sec"] == 4.4

    # the 50-99% band (ADVICE r19): a run covering 2 of 3 queries is
    # STILL partial — q3's floor carries through, totals stay clean
    band_run = dict(partial_run)
    band_run["queries"] = {"q1": 0.9, "q2": 1.9, "q4": 0.1}
    band_run["value"] = 2.9
    json.dump(band_run, open(pp, "w"))
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench_ref_update.py"),
         rp, pp, "--label", "st", "--stale-threshold", "99", "--out", op],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr + out.stdout
    assert "partial input (3 of 3" in out.stdout, out.stdout
    got = json.load(open(op))
    assert got["queries"] == {"q1": 0.9, "q2": 1.9, "q3": 3.0, "q4": 0.1}, \
        got["queries"]
    assert got["run_totals_sec"] == [6.0], "partial total polluted history"

    # removal is explicit only: --drop q3 shrinks the surface, and the
    # now-full-coverage run appends its total
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench_ref_update.py"),
         rp, pp, "--label", "st", "--stale-threshold", "99", "--out", op,
         "--drop", "q3"],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr + out.stdout
    got = json.load(open(op))
    assert got["queries"] == {"q1": 0.9, "q2": 1.9, "q4": 0.1}, got["queries"]
    assert got["run_totals_sec"] == [6.0, 2.9], got["run_totals_sec"]

    # --drop of an unknown query refuses loudly
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench_ref_update.py"),
         rp, pp, "--label", "st", "--stale-threshold", "99", "--out", op,
         "--drop", "q9"],
        capture_output=True, text=True)
    assert out.returncode != 0 and "absent from the reference" in out.stderr

print("selftest_bench_ref_update: all checks pass")
