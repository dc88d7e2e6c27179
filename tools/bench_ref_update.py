#!/usr/bin/env python3
"""Merge calibration-stamped bench runs into BENCH_REF.json and retire
stale minima with per-row provenance (VERDICT r15 #1).

Usage:
    python3 tools/bench_ref_update.py BENCH_REF.json run1.json run2.json ... \
        [--force-retire q60_x,q61_y] [--reset q147_z] \
        [--stale-threshold 1.3] [--label r16] [--max-calib-ratio 1.35] \
        [--min-sec 0.2] [--out BENCH_REF.json] [--note "..."]

Why this exists: BENCH_REF's per-query reference is a MIN over the run
history, and a min never ages out — rounds 13-15 each burned judge time
re-proving that round-8-era minima (recorded pre-calibration, at a smaller
query surface, in the quietest windows ever logged) are unreachable by
current code with git-verified unchanged plans (the q05/q60-class:
JVM/code-layout drift as the surface grew). This tool makes the
adjudication mechanical and leaves per-row provenance behind so
tools/bench_compare.py annotates future flags instead of a judge
re-litigating.

Policy, per query (all PUBLISHED numbers are real measurements — the
load-normalization below only drives decisions, never recorded values):
  - every input run carries graft.Bench calibration; its worst st/mt
    ratio vs the reference's quiet calib must be <= --max-calib-ratio or
    the tool refuses (minima may only be adjudicated against runs whose
    machine state is known and mild). Each run's QUIET-EQUIVALENT times
    are time/ratio — the same uniform-inflation model bench_compare
    scales its thresholds by.
  - plan-changed queries (--reset) and new queries: history RESET to the
    new runs' raw values.
  - mechanical staleness: if the quiet-equivalent floor of the new runs
    exceeds stale-threshold x the recorded min (and the min is >=
    --min-sec, bench_compare's signal band), the min is unreachable even
    after machine-state adjustment -> retire.
  - --force-retire: rows a judge already adjudicated stale (the r15
    q60-class) retire regardless of today's ratios.
  - a retired row's new reference = min over the CALIBRATION-ERA real
    measurements: the last 5 historical run values (the rounds-11+
    windows; per-query run arrays are ragged but chronologically
    appended, so the tail is the recent era) plus the new runs' raw
    values. The retired value is recorded in provenance (retired_min).
  - otherwise the min is kept (audit-confirmed) — lowered only if a new
    raw value genuinely beats it.
"""
import argparse
import json
import sys


def load_run(path):
    doc = json.load(open(path))
    if "queries" not in doc or "calib" not in doc:
        sys.exit(f"{path}: not a graft.Bench artifact with calib")
    if doc.get("errors"):
        sys.exit(f"{path}: run had errors {sorted(doc['errors'])} - refusing")
    return doc


def calib_ratio(calib, ref_calib):
    st = max(float(calib["st_before_ms"]), float(calib["st_after_ms"]))
    mt = max(float(calib["mt_before_ms"]), float(calib["mt_after_ms"]))
    ratio = max(st / float(ref_calib["st_ms"]),
                mt / float(ref_calib["mt_ms"]), 1.0)
    # include the round-16 memory-bandwidth unit when both sides carry it
    # (the CPU loop is blind to co-tenant DRAM pressure; see bench_compare)
    mem_keys = ("mem_st_before_ms", "mem_st_after_ms",
                "mem_mt_before_ms", "mem_mt_after_ms")
    if all(k in calib for k in mem_keys) \
            and "mem_st_ms" in ref_calib and "mem_mt_ms" in ref_calib:
        mst = max(float(calib["mem_st_before_ms"]),
                  float(calib["mem_st_after_ms"]))
        mmt = max(float(calib["mem_mt_before_ms"]),
                  float(calib["mem_mt_after_ms"]))
        ratio = max(ratio, mst / float(ref_calib["mem_st_ms"]),
                    mmt / float(ref_calib["mem_mt_ms"]))
    # fold whole-run hypervisor steal in (see bench_compare): p% stolen
    # uniformly inflates wall time by 1/(1 - p)
    sp = calib.get("steal_pct")
    if sp is not None and 0.0 <= float(sp) < 95.0:
        ratio = max(ratio, 1.0 / (1.0 - float(sp) / 100.0))
    elif sp is not None and float(sp) >= 95.0:
        ratio = max(ratio, 20.0)
    return ratio


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("ref")
    ap.add_argument("runs", nargs="+")
    ap.add_argument("--force-retire", default="",
                    help="judge-adjudicated stale rows: retire regardless")
    ap.add_argument("--reset", default="",
                    help="plan-changed queries: history reset, not merged")
    ap.add_argument("--stale-threshold", type=float, default=1.3)
    ap.add_argument("--label", default="r16")
    ap.add_argument("--max-calib-ratio", type=float, default=1.35)
    ap.add_argument("--min-sec", type=float, default=0.2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--note", default="")
    ap.add_argument("--drop", default="",
        help="comma-separated queries to REMOVE from the reference "
             "(the only way a merge may shrink the surface)")
    args = ap.parse_args()

    ref = json.load(open(args.ref))
    runs = [load_run(p) for p in args.runs]
    ratios = []
    for p, r in zip(args.runs, runs):
        ratio = calib_ratio(r["calib"], ref["calib"])
        if ratio > args.max_calib_ratio:
            sys.exit(f"{p}: calibration {ratio:.2f}x over quiet reference "
                     f"(> {args.max_calib_ratio}) - re-run in a quiet window")
        ratios.append(ratio)
        print(f"{p}: calib {ratio:.2f}x, total {r['value']}s, "
              f"{len(r['queries'])} queries")

    force = {q.strip() for q in args.force_retire.split(",") if q.strip()}
    reset = {q.strip() for q in args.reset.split(",") if q.strip()}
    names = sorted(set().union(*[set(r["queries"]) for r in runs]))
    old_q = ref.get("queries", {})
    old_runs = ref.get("runs", {})
    # Partial-run guard (round 19, hardened round 20 per ADVICE r19): a
    # SPARK_GRAFT_ONLY run covers a few queries, and treating its query
    # list as THE surface silently deleted every absent floor (a
    # single-query merge reduced a 232-row reference to 1 row). The r19
    # guard only triggered below 50% coverage, leaving the 50-99% band
    # exposed to the same hazard — now ANY merge whose input runs miss a
    # query present in the old reference is a partial merge: absent
    # floors are carried through untouched, never dropped (removal
    # requires the explicit --drop flag), and full-surface totals are
    # not appended.
    drop = {q.strip() for q in args.drop.split(",") if q.strip()}
    missing_drops = drop - set(old_q)
    if missing_drops:
        sys.exit(f"--drop names queries absent from the reference: "
                 f"{sorted(missing_drops)}")
    absent = set(old_q) - set(names) - drop
    partial = bool(absent)
    if partial:
        print(f"partial input ({len(names)} of {len(old_q)} reference "
              f"queries): {len(absent)} absent floors carried through, "
              "none dropped (use --drop to remove a query explicitly)")
        names = sorted((set(names) | set(old_q)) - drop)
    elif drop:
        names = sorted(set(names) - drop)
    for q in sorted(drop):
        print(f"{q}: dropped from the reference (--drop)")
    surface = len(names)
    new_q, new_runs, prov = {}, {}, {}
    counts = {"new_floor": 0, "kept": 0, "retired": 0, "reset_or_new": 0}

    old_prov = ref.get("provenance", {})
    for q in names:
        raw = [r["queries"][q] for r in runs if q in r["queries"]]
        if not raw:
            # partial merge: this query wasn't in the input runs —
            # carry its floor, history, and provenance through verbatim
            new_q[q] = old_q[q]
            new_runs[q] = old_runs.get(q, [])
            if q in old_prov:
                prov[q] = old_prov[q]
            counts["kept"] += 1
            continue
        quiet_eq = [r["queries"][q] / ratio
                    for r, ratio in zip(runs, ratios) if q in r["queries"]]
        raw_floor, qe_floor = min(raw), min(quiet_eq)
        if q in reset or q not in old_q:
            new_q[q] = raw_floor
            new_runs[q] = raw
            prov[q] = {"run": f"{args.label}-reset", "surface": surface,
                       "calibrated": True}
            if q in reset:
                prov[q]["plan_changed"] = True
            counts["reset_or_new"] += 1
            continue
        old_min = old_q[q]
        hist = old_runs.get(q, [])
        new_runs[q] = hist + raw
        stale = q in force or (
            old_min >= args.min_sec and
            qe_floor > old_min * args.stale_threshold)
        if not stale:
            new_q[q] = min(old_min, raw_floor)
            if raw_floor <= old_min:
                prov[q] = {"run": f"{args.label}-run", "surface": surface,
                           "calibrated": True}
                counts["new_floor"] += 1
            else:
                prov[q] = {"run": f"pre-{args.label}-min audit-confirmed",
                           "surface": surface, "calibrated": True}
                counts["kept"] += 1
        else:
            era = hist[-5:] + raw
            new_q[q] = min(era)
            prov[q] = {"run": f"{args.label}-audit", "surface": surface,
                       "calibrated": True, "retired_min": old_min}
            if q in force:
                prov[q]["adjudicated"] = "r15-verdict"
            counts["retired"] += 1
            print(f"retired {q}: {old_min} -> {new_q[q]} "
                  f"(quiet-eq floor {qe_floor:.3f}, "
                  f"{qe_floor / old_min:.2f}x{' FORCED' if q in force else ''})")

    dropped = sorted(set(old_q) - set(names))
    if dropped:
        print(f"dropped (no longer on the surface): {dropped}")

    ref["queries"] = new_q
    ref["runs"] = new_runs
    ref["provenance"] = prov
    ref["n_queries"] = surface
    if not partial:
        # partial-run totals are not full-surface totals — appending a
        # 0.5s single-query "total" would pollute the run history
        ref["run_totals_sec"] = ref.get("run_totals_sec", []) + \
            [round(r["value"], 2) for r in runs]
    ref["best_sum_sec"] = round(sum(new_q.values()), 2)
    if args.note:
        ref["method"] = ref.get("method", "") + " " + args.note
    out = args.out or args.ref
    json.dump(ref, open(out, "w"))
    print(f"wrote {out}: {surface} queries, best_sum {ref['best_sum_sec']}s; "
          + ", ".join(f"{k}={v}" for k, v in counts.items()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
