#!/usr/bin/env python3
"""Self-test for tools/bench_compare.py's exit-code and annotation
contract (ADVICE r15 / round 16): the refusal path must be
distinguishable from clean (exit 3), a calib thread-count mismatch must
fall back to the unscaled threshold, and provenance-known stale minima
must be annotated on flagged lines. Run: python3 tools/selftest_bench_compare.py
(exits nonzero on first failure — no framework, stdlib only)."""
import json
import os
import subprocess
import sys
import tempfile

TOOL = os.path.join(os.path.dirname(__file__), "bench_compare.py")


def run(bench, ref, extra=()):
    d = tempfile.mkdtemp()
    bp, rp = os.path.join(d, "bench.json"), os.path.join(d, "ref.json")
    json.dump(bench, open(bp, "w"))
    json.dump(ref, open(rp, "w"))
    p = subprocess.run(
        [sys.executable, TOOL, bp, "--ref", rp,
         "--local", os.path.join(d, "nope.json")] + list(extra),
        capture_output=True, text=True)
    return p.returncode, p.stdout + p.stderr


def calib(st, mt, threads=32):
    return {"threads": threads, "st_before_ms": st, "mt_before_ms": mt,
            "st_after_ms": st, "mt_after_ms": mt}


REF = {"queries": {"q01_a": 1.0, "q02_b": 1.0},
       "n_queries": 2,
       "calib": {"st_ms": 280.0, "mt_ms": 320.0, "threads": 32},
       "provenance": {"q01_a": {"run": "audit", "surface": 2,
                                "calibrated": True},
                      "q02_b": {"run": "old", "surface": 1,
                                "calibrated": False}}}


def bench(q1, q2, cal):
    return {"queries": {"q01_a": q1, "q02_b": q2}, "calib": cal, "sf": "x"}


def check(name, cond, detail=""):
    if not cond:
        print(f"FAIL {name}: {detail}")
        sys.exit(1)
    print(f"ok   {name}")


# 1. clean quiet run -> exit 0
rc, out = run(bench(1.0, 1.0, calib(281, 321)), REF)
check("clean-quiet-exit-0", rc == 0 and "clean" in out, f"rc={rc} {out}")

# 2. not-quiet box -> exit 3, flags unadjudicated (NOT silently clean)
rc, out = run(bench(5.0, 5.0, calib(900, 1000)), REF)
check("refusal-exit-3", rc == 3, f"rc={rc} {out}")
check("refusal-reports", "unadjudicated" in out and "NOT QUIET" in out, out)

# 3. plan-changed regression on a quiet box -> exit 1
rc, out = run(bench(3.0, 1.0, calib(281, 321)), REF, ["--changed", "q01_a"])
check("regression-exit-1", rc == 1 and "REGRESSION q01_a" in out,
      f"rc={rc} {out}")

# 4. thread-count mismatch -> no scaling, note emitted, unscaled threshold
rc, out = run(bench(1.0, 1.0, calib(281, 321, threads=16)), REF)
check("thread-mismatch-note", rc == 0 and "thread counts differ" in out, out)

# 5. provenance annotation: a flagged query whose min predates the
#    current surface / calibration carries the stale-min note
rc, out = run(bench(1.0, 2.0, calib(281, 321)), REF)
check("stale-min-annotated", "stale-min candidate" in out
      and "1-query surface" in out and "predates calibration" in out, out)
# ...and the audit-confirmed row does NOT get the note when flagged
rc, out = run(bench(2.0, 1.0, calib(281, 321)), REF)
check("confirmed-not-annotated",
      "q01_a" in out and "stale-min candidate" not in out, out)


# 6. memory-bandwidth calib (round 16): when BOTH sides carry the mem
#    unit, a bandwidth-loaded box scales the ratio even though the CPU
#    loop reads quiet (the register-loop blind spot the unit exists for)
MEMREF = dict(REF, calib=dict(REF["calib"], mem_st_ms=264.0,
                              mem_mt_ms=157.0))


def memcalib(st, mt, mem_st, mem_mt):
    c = calib(st, mt)
    c.update({"mem_st_before_ms": mem_st, "mem_mt_before_ms": mem_mt,
              "mem_st_after_ms": mem_st, "mem_mt_after_ms": mem_mt})
    return c


rc, out = run(bench(1.0, 1.0, memcalib(281, 321, 530, 160)), MEMREF)
check("mem-calib-scales", rc == 0 and "mem_st 530ms" in out
      and "box 2.01x over quiet" in out, f"rc={rc} {out}")
# bandwidth pressure past the refusal bar refuses even with quiet CPU
rc, out = run(bench(1.0, 1.0, memcalib(281, 321, 700, 450)), MEMREF)
check("mem-calib-refuses", rc == 3, f"rc={rc} {out}")
# a run without the mem unit degrades to CPU-only scaling, loudly
rc, out = run(bench(1.0, 1.0, calib(281, 321)), MEMREF)
check("mem-calib-absent-note", rc == 0
      and "no mem-bandwidth calib on one side" in out, out)

# 7. whole-run hypervisor steal (round 16): a burst BETWEEN calibration
#    samples is invisible to the loops; steal_pct integrates the window
rc, out = run(bench(1.0, 1.0, dict(memcalib(281, 321, 265, 158),
                                   steal_pct=30.0)), MEMREF)
check("steal-scales", rc == 0 and "steal 30.0%" in out
      and "box 1.43x over quiet" in out, f"rc={rc} {out}")
rc, out = run(bench(1.0, 1.0, dict(memcalib(281, 321, 265, 158),
                                   steal_pct=70.0)), MEMREF)
check("steal-refuses", rc == 3, f"rc={rc} {out}")
rc, out = run(bench(1.0, 1.0, dict(memcalib(281, 321, 265, 158),
                                   steal_pct=-1.0)), MEMREF)
check("steal-unreadable-note", rc == 0 and "steal unreadable" in out,
      f"rc={rc} {out}")

# 8. self-adjudication (round 17): a flag whose isolated re-run reading
#    is clean on a quiet adjudication window is cleared automatically
def adjbench(q1, q2, cal, adj):
    b = bench(q1, q2, cal)
    b["adjudication"] = adj
    return b


ADJ_QUIET_CAL = {"threads": 32, "st_ms": 282.0, "mt_ms": 322.0,
                 "steal_pct": 0.1}
rc, out = run(adjbench(3.0, 1.0, calib(281, 321),
                       {"threshold": 1.6, "cal_ratio": 1.0,
                        "queries": {"q01_a": {"suite": 3.0, "ref": 1.0,
                                              "isolated": 1.1}},
                        "calib": ADJ_QUIET_CAL}), REF)
check("adjudication-clears-noise", rc == 0 and "adjudicated-noise q01_a" in out
      and "noise-or-regression" not in out, f"rc={rc} {out}")

# a SUSTAINED isolated reading stays flagged (real signal, not noise)
rc, out = run(adjbench(3.0, 1.0, calib(281, 321),
                       {"threshold": 1.6, "cal_ratio": 1.0,
                        "queries": {"q01_a": {"suite": 3.0, "ref": 1.0,
                                              "isolated": 2.9}},
                        "calib": ADJ_QUIET_CAL}), REF)
check("adjudication-sustained-keeps-flag", rc == 0 and "SUSTAINED" in out
      and "noise-or-regression q01_a" in out, f"rc={rc} {out}")

# plan-changed regression cleared only when isolated reading is clean
rc, out = run(adjbench(3.0, 1.0, calib(281, 321),
                       {"threshold": 1.6, "cal_ratio": 1.0,
                        "queries": {"q01_a": {"suite": 3.0, "ref": 1.0,
                                              "isolated": 1.1}},
                        "calib": ADJ_QUIET_CAL}), REF,
             ["--changed", "q01_a"])
check("adjudication-clears-plan-changed", rc == 0
      and "adjudicated-noise q01_a" in out and "[plan changed]" in out,
      f"rc={rc} {out}")
rc, out = run(adjbench(3.0, 1.0, calib(281, 321),
                       {"threshold": 1.6, "cal_ratio": 1.0,
                        "queries": {"q01_a": {"suite": 3.0, "ref": 1.0,
                                              "isolated": 2.9}},
                        "calib": ADJ_QUIET_CAL}), REF,
             ["--changed", "q01_a"])
check("adjudication-sustained-regression-exit-1", rc == 1
      and "REGRESSION q01_a" in out, f"rc={rc} {out}")

# an adjudication window that was itself loaded is unusable — flag stays
rc, out = run(adjbench(3.0, 1.0, calib(281, 321),
                       {"threshold": 1.6, "cal_ratio": 1.0,
                        "queries": {"q01_a": {"suite": 3.0, "ref": 1.0,
                                              "isolated": 1.1}},
                        "calib": {"threads": 32, "st_ms": 900.0,
                                  "mt_ms": 1000.0}}), REF)
check("adjudication-loaded-window-unusable", rc == 0
      and "unusable" in out and "noise-or-regression q01_a" in out,
      f"rc={rc} {out}")

# refusal path rescue: loaded SUITE window, quiet adjudication window,
# clean isolated reading -> flags cleared, exit 0 instead of 3
rc, out = run(adjbench(5.0, 5.0, calib(900, 1000),
                       {"threshold": 1.6, "cal_ratio": 3.2,
                        "queries": {"q01_a": {"suite": 5.0, "ref": 1.0,
                                              "isolated": 1.1},
                                    "q02_b": {"suite": 5.0, "ref": 1.0,
                                              "isolated": 1.2}},
                        "calib": ADJ_QUIET_CAL}), REF)
check("adjudication-rescues-refusal", rc == 0
      and "every flag cleared" in out, f"rc={rc} {out}")
# ...but an uncleared flag under a loaded suite window still refuses
rc, out = run(adjbench(5.0, 5.0, calib(900, 1000),
                       {"threshold": 1.6, "cal_ratio": 3.2,
                        "queries": {"q01_a": {"suite": 5.0, "ref": 1.0,
                                              "isolated": 4.8},
                                    "q02_b": {"suite": 5.0, "ref": 1.0,
                                              "isolated": 1.2}},
                        "calib": ADJ_QUIET_CAL}), REF)
check("adjudication-partial-still-refuses", rc == 3
      and "unadjudicated q01_a" in out, f"rc={rc} {out}")

# 10. sub-min_sec floor exemption is capped by measured time (VERDICT
#     r18 #2: q14's 0.197s floor read 12.96s — 65.9x — and was never
#     flagged). A tiny-floor query measured HUGE must flag; the same
#     floor measured small stays noise-exempt.
TINY = {"queries": {"q01_a": 0.15, "q02_b": 1.0}, "n_queries": 2,
        "calib": REF["calib"]}
rc, out = run({"queries": {"q01_a": 12.96, "q02_b": 1.0},
               "calib": calib(281, 321), "sf": "x"}, TINY)
check("tiny-floor-abs-cap-flags", rc == 0
      and "noise-or-regression q01_a" in out, f"rc={rc} {out}")
rc, out = run({"queries": {"q01_a": 0.5, "q02_b": 1.0},
               "calib": calib(281, 321), "sf": "x"}, TINY)
check("tiny-floor-small-reading-exempt", rc == 0 and "clean" in out,
      f"rc={rc} {out}")

print("all bench_compare selftests passed")
