#!/usr/bin/env python3
"""Per-query bench regression check against recorded quiet-machine reference values.

Usage:
    python3 tools/bench_compare.py BENCH_r08.json [--ref BENCH_REF.json]
        [--threshold 1.6] [--changed q67_ngram_prefix_neardup,q84_gopher_rules]

Why per-query, not totals: BASELINE.md's round-7 controlled experiment ran the
identical tree four times and observed full-run totals of 92 / 295 / 401 / 810 s
(co-tenant VM interference only ever inflates on this box). A total is therefore
not a regression signal; a single query sustained above threshold x its recorded
quiet value MIGHT be, but only when that query's plan actually changed in the
round — pass the plan-changed queries via --changed (default: flag everything
over threshold as "noise-or-regression: re-measure isolated", and only
plan-changed offenders as hard failures).

Input formats accepted, in order of preference:
  1. raw graft.Bench output: {"metric":..., "value":..., "queries":{...}, "sf":...}
  2. the driver's wrapper: {"n":..., "rc":..., "tail":"...", "parsed":{...}|null}
     - when "parsed" is null (stdout truncated mid-JSON), per-query times are
       regex-recovered from "tail"; queries lost to the truncation are reported
       as "missing", never silently passed.
In either case, if the input carries a run "nonce" and a sibling
BENCH_LOCAL.json (written by graft.Bench alongside the stdout line; override
with --local) exists with the SAME nonce, the file's complete per-query map is
used instead — the stdout capture window truncates ~4 KB of 133 query timings,
the file never does. A nonce mismatch means the file is from a different run
and is ignored (reported).

Machine-state calibration (round 15): graft.Bench emits "calib" — a fixed
single-thread CPU loop (st) and a 32-way parallel loop (mt), each timed
untracked before and after the suite. When both the bench input and the
reference carry calibration, the flag threshold is scaled by the observed
slowdown ratio; beyond --refuse-above (default 2.5x) the box is declared
not-quiet and per-query adjudication is refused outright (timings carry no
signal at that interference level — BASELINE.md measured up to 9x with zero
code change). Artifacts without calib degrade to the unscaled threshold.
The calibration is only comparable at equal thread counts: a thread-count
mismatch between the run's calib and the reference's falls back to the
unscaled threshold with a note (ADVICE r15 — a SPARK_GRAFT_CPUS != 32 run
would otherwise scale by a meaningless mt ratio).

Memory-bandwidth calibration (round 16): the CPU loop is register-only by
design and therefore blind to co-tenant DRAM-bandwidth pressure — observed
to slow the (bandwidth-bound) Spark suite ~30% while st/mt read quiet.
graft.Bench additionally emits mem_st/mem_mt (streaming-sum over a 512 MiB
array, 1-thread and 32-way) before and after the suite; when the reference
carries quiet mem_st_ms/mem_mt_ms, those ratios join the max() that scales
the threshold and triggers the refusal path. Either side lacking the mem
unit degrades to CPU-only scaling, with a note.

Whole-run hypervisor steal (round 16): both calibration loops sample
INSTANTS, so a co-tenant burst landing between the before/after samples
inflates the suite invisibly. graft.Bench reads /proc/stat's cumulative
steal counter at run start and end and emits steal_pct — the fraction of
the machine's capacity the hypervisor withheld over the WHOLE window. A
p% steal uniformly inflates wall time by 1/(1-p); that factor joins the
same max(). steal_pct = -1 means /proc/stat was unreadable (noted).

Per-query provenance (round 16): when the reference carries a "provenance"
object ({query: {run, surface, calibrated}}), any flagged query whose
recorded minimum predates the current surface size or a calibration-verified
window is annotated "[stale-min candidate]" in the report — the judge reads
staleness off the row instead of re-proving it with isolated re-runs
(VERDICT r15 #1; the q05/q60-class adjudications).

Self-adjudication (round 17): graft.Bench now replays this tool's flag test
in-process after the suite, re-runs exactly the flagged queries, and stamps
an "adjudication" section ({threshold, cal_ratio, queries: {q: {suite, ref,
isolated}}, calib: single-sample}) into the artifact. A flag whose isolated
reading is within the adjudication-window-scaled threshold was suite-window
noise and is cleared here automatically — including in the refusal path,
where a loaded suite window doesn't invalidate isolated readings taken in a
later quiet window. Sustained flags (slow in the isolated re-run too) are
reported as real signal.

Exit code: 0 = clean (or only non-plan-changed queries over threshold);
           1 = a plan-changed query is over threshold (and not cleared by
               adjudication), or the input had rc != 0;
           2 = usage / unreadable input;
           3 = adjudication REFUSED (box not quiet per calibration AND the
               artifact's own adjudication section could not clear every
               flag) — NOT a clean result: scripted gates must treat 3 as
               "re-run in a quiet window", never as a pass (ADVICE r15).
"""
import argparse
import json
import re
import sys

QUERY_RE = re.compile(r'"(q\d+_[A-Za-z0-9_]+)"\s*:\s*([0-9]+(?:\.[0-9]+)?)')


NONCE_RE = re.compile(r'"nonce"\s*:\s*"([0-9a-f-]+)"')


def load_query_times(path, local_path="BENCH_LOCAL.json"):
    """Return (times: dict, rc: int|None, truncated: bool, calib: dict|None,
    adjudication: dict|None)."""
    with open(path) as f:
        doc = json.load(f)
    if isinstance(doc, dict) and "queries" in doc and isinstance(doc["queries"], dict):
        return (dict(doc["queries"]), doc.get("rc"), False, doc.get("calib"),
                doc.get("adjudication"))
    # driver wrapper
    rc = doc.get("rc")
    parsed = doc.get("parsed")
    tail = doc.get("tail", "") or ""
    nonce = None
    if isinstance(parsed, dict) and parsed.get("nonce"):
        nonce = parsed["nonce"]
    else:
        m = NONCE_RE.search(tail)
        if m:
            nonce = m.group(1)
    if nonce:
        # prefer the complete file artifact when it provably belongs to
        # this run (same nonce) — the stdout tail truncates, the file never
        try:
            local = json.load(open(local_path))
            if local.get("nonce") == nonce and isinstance(local.get("queries"), dict):
                # informational, like the stale-file note below: stderr, so
                # the stdout report stays machine-readable (ADVICE r10)
                print(f"using {local_path} (nonce {nonce} matches): "
                      f"{len(local['queries'])} per-query times", file=sys.stderr)
                return (dict(local["queries"]), rc, False, local.get("calib"),
                        local.get("adjudication"))
            print(f"note: {local_path} nonce {local.get('nonce')!r} != run nonce "
                  f"{nonce!r} - stale file ignored", file=sys.stderr)
        except (OSError, json.JSONDecodeError) as e:
            # docstring promises ignores are reported (ADVICE r10): a
            # missing/corrupt file degrades to tail recovery, but loudly
            print(f"note: {local_path} unreadable ({e}) - falling back to "
                  f"stdout tail recovery", file=sys.stderr)
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        return (dict(parsed["queries"]), rc, False, parsed.get("calib"),
                parsed.get("adjudication"))
    times = {name: float(sec) for name, sec in QUERY_RE.findall(tail)}
    return times, rc, True, None, None


def calibration_ratio(calib, ref_calib):
    """How much slower the bench run's box was than the reference's quiet
    box, per graft.Bench's untracked CPU calibration (st = single-thread
    ms, mt = 32-way wall ms, each the WORSE of before/after). Returns
    (ratio, note) — ratio >= 1.0, or (None, reason) when either side
    lacks calibration (old artifacts)."""
    if not isinstance(calib, dict):
        return None, "bench input has no calib field (pre-r15 artifact)"
    if not isinstance(ref_calib, dict):
        return None, "reference has no calib field (pre-r15 artifact)"
    try:
        st = max(float(calib["st_before_ms"]), float(calib["st_after_ms"]))
        mt = max(float(calib["mt_before_ms"]), float(calib["mt_after_ms"]))
        ref_st = float(ref_calib["st_ms"])
        ref_mt = float(ref_calib["mt_ms"])
    except (KeyError, TypeError, ValueError) as e:
        return None, f"calib field malformed: {e}"
    # the mt loop's wall time scales with oversubscription, so the ratio is
    # only meaningful at EQUAL thread counts (ADVICE r15): a run calibrated
    # at a different SPARK_GRAFT_CPUS falls back to no scaling, loudly
    threads, ref_threads = calib.get("threads"), ref_calib.get("threads")
    if threads is not None and ref_threads is not None \
            and int(threads) != int(ref_threads):
        return None, (f"calib thread counts differ (run {threads} vs "
                      f"reference {ref_threads}) - mt ratio not comparable")
    ratio = max(st / ref_st, mt / ref_mt, 1.0)
    note = (f"st {st:.0f}ms vs quiet {ref_st:.0f}ms, "
            f"mt {mt:.0f}ms vs quiet {ref_mt:.0f}ms")
    # Memory-bandwidth unit (round 16): the CPU loop is register-only by
    # design, so it is blind to co-tenant DRAM-bandwidth pressure — the
    # mode observed to slow the (bandwidth-bound) Spark suite ~30% while
    # st/mt read quiet. Include the mem ratios when BOTH sides carry them;
    # older artifacts degrade to CPU-only scaling with a note.
    mem_keys = ("mem_st_before_ms", "mem_st_after_ms",
                "mem_mt_before_ms", "mem_mt_after_ms")
    if all(k in calib for k in mem_keys) \
            and "mem_st_ms" in ref_calib and "mem_mt_ms" in ref_calib:
        try:
            mst = max(float(calib["mem_st_before_ms"]),
                      float(calib["mem_st_after_ms"]))
            mmt = max(float(calib["mem_mt_before_ms"]),
                      float(calib["mem_mt_after_ms"]))
            ref_mst = float(ref_calib["mem_st_ms"])
            ref_mmt = float(ref_calib["mem_mt_ms"])
            ratio = max(ratio, mst / ref_mst, mmt / ref_mmt)
            note += (f", mem_st {mst:.0f}ms vs quiet {ref_mst:.0f}ms, "
                     f"mem_mt {mmt:.0f}ms vs quiet {ref_mmt:.0f}ms")
        except (TypeError, ValueError) as e:
            note += f" (mem calib malformed, ignored: {e})"
    else:
        note += " (no mem-bandwidth calib on one side; CPU-only scaling)"
    # Hypervisor steal (round 16): the loops sample instants, so a
    # co-tenant burst BETWEEN samples is invisible to them; the kernel's
    # steal counter integrates over the whole run. steal_pct% of machine
    # capacity stolen uniformly inflates wall time by 1/(1 - p) — fold
    # that in. -1 means /proc/stat was unreadable (reported, not fatal).
    sp = calib.get("steal_pct")
    if sp is not None:
        try:
            sp = float(sp)
            if 0.0 <= sp < 95.0:
                ratio = max(ratio, 1.0 / (1.0 - sp / 100.0))
                note += f", steal {sp:.1f}%"
            elif sp >= 95.0:
                ratio = max(ratio, 20.0)  # machine effectively not ours
                note += f", steal {sp:.1f}%"
            else:
                note += " (steal unreadable)"
        except (TypeError, ValueError):
            note += " (steal_pct malformed, ignored)"
    return ratio, note


def adjudication_scale(adj, ref_calib, refuse_above):
    """Threshold scaling for the bench's SELF-adjudication window (round
    17): graft.Bench re-runs its flagged queries after the suite and
    stamps a single calibration sample (st_ms/mt_ms/mem_st_ms/mem_mt_ms/
    steal_pct) taken right after those re-runs. Returns (ratio, note) —
    ratio >= 1.0 when the window is usable, (None, reason) when the
    adjudication carries no calib, thread counts mismatch, or the window
    itself was not quiet (beyond refuse_above)."""
    cal = adj.get("calib")
    if not isinstance(cal, dict):
        return None, "adjudication carries no calib sample"
    if not isinstance(ref_calib, dict):
        return None, "reference has no calib field"
    try:
        st, mt = float(cal["st_ms"]), float(cal["mt_ms"])
        rst, rmt = float(ref_calib["st_ms"]), float(ref_calib["mt_ms"])
    except (KeyError, TypeError, ValueError) as e:
        return None, f"adjudication calib malformed: {e}"
    threads, ref_threads = cal.get("threads"), ref_calib.get("threads")
    if threads is not None and ref_threads is not None \
            and int(threads) != int(ref_threads):
        return None, "adjudication calib thread count differs from reference"
    ratio = max(st / rst, mt / rmt, 1.0)
    note = f"st {st:.0f}ms, mt {mt:.0f}ms vs quiet {rst:.0f}/{rmt:.0f}ms"
    try:
        if "mem_st_ms" in cal and "mem_st_ms" in ref_calib:
            ratio = max(ratio,
                        float(cal["mem_st_ms"]) / float(ref_calib["mem_st_ms"]),
                        float(cal["mem_mt_ms"]) / float(ref_calib["mem_mt_ms"]))
            note += (f", mem {float(cal['mem_st_ms']):.0f}/"
                     f"{float(cal['mem_mt_ms']):.0f}ms")
    except (KeyError, TypeError, ValueError, ZeroDivisionError) as e:
        note += f" (mem calib ignored: {e})"
    sp = cal.get("steal_pct")
    try:
        sp = float(sp)
        if sp >= 95.0:
            ratio = max(ratio, 20.0)
        elif sp >= 0.0:
            ratio = max(ratio, 1.0 / (1.0 - sp / 100.0))
            note += f", steal {sp:.1f}%"
    except (TypeError, ValueError):
        pass
    if ratio > refuse_above:
        return None, f"adjudication window itself not quiet ({ratio:.2f}x: {note})"
    return ratio, note


def apply_adjudication(adj, ref, flag_lists, base_threshold, ref_calib,
                       refuse_above):
    """Clear flagged queries whose isolated re-run reading is within the
    adjudication-window-scaled threshold. Mutates nothing; returns
    (new_flag_lists, cleared_count). flag_lists is a list of
    (label, rows) with rows = [(q, t, ref_t, ratio), ...]."""
    if not isinstance(adj, dict) or not isinstance(adj.get("queries"), dict):
        return flag_lists, 0
    if not any(rows for _, rows in flag_lists):
        return flag_lists, 0
    scale, note = adjudication_scale(adj, ref_calib, refuse_above)
    if scale is None:
        print(f"note: adjudication section present but unusable ({note})")
        return flag_lists, 0
    thr = base_threshold * (scale if scale > 1.05 else 1.0)
    print(f"adjudication window: {note} -> isolated threshold {thr:.2f}x")
    out, cleared = [], 0
    for label, rows in flag_lists:
        keep = []
        for q, t, r, ratio in rows:
            a = adj["queries"].get(q)
            iso = None
            if isinstance(a, dict):
                try:
                    iso = float(a["isolated"])
                except (KeyError, TypeError, ValueError):
                    iso = None
            if iso is not None and r > 0 and iso / r <= thr:
                cleared += 1
                tag = " [plan changed]" if label == "hard" else ""
                print(f"adjudicated-noise {q}: {t:.2f}s in-suite "
                      f"({ratio:.1f}x) but isolated re-run {iso:.2f}s "
                      f"({iso / r:.1f}x, within {thr:.2f}x of quiet "
                      f"{r:.2f}s){tag}")
            else:
                if iso is not None:
                    print(f"note: {q} SUSTAINED in isolated re-run "
                          f"({iso:.2f}s vs quiet {r:.2f}s, over {thr:.2f}x)")
                keep.append((q, t, r, ratio))
        out.append((label, keep))
    return out, cleared


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("bench", help="BENCH_r{N}.json (raw Bench output or driver wrapper)")
    ap.add_argument("--ref", default="BENCH_REF.json")
    ap.add_argument("--threshold", type=float, default=1.6,
                    help="flag queries over threshold x quiet reference (default 1.6)")
    ap.add_argument("--changed", default="",
                    help="comma-separated query names whose plans changed this round; "
                         "only these become hard failures when over threshold")
    ap.add_argument("--min-sec", type=float, default=0.2,
                    help="ignore ratio noise below this absolute reference time (default 0.2s)")
    ap.add_argument("--abs-cap", type=float, default=1.0,
                    help="a sub-min-sec-floor query is still flagged when its "
                         "measured time exceeds max(min_sec x threshold, this) "
                         "(default 1.0s; VERDICT r18: the exemption must not "
                         "hide a 13s reading on a 0.2s floor)")
    ap.add_argument("--local", default="BENCH_LOCAL.json",
                    help="graft.Bench's complete file artifact; used when its "
                         "nonce matches the bench input's (default BENCH_LOCAL.json)")
    ap.add_argument("--refuse-above", type=float, default=2.5,
                    help="calibration ratio beyond which the box is declared "
                         "not-quiet and per-query adjudication is refused "
                         "(default 2.5)")
    args = ap.parse_args()

    try:
        ref_doc = json.load(open(args.ref))
        ref = ref_doc["queries"]
    except (OSError, KeyError, json.JSONDecodeError) as e:
        print(f"cannot read reference {args.ref}: {e}", file=sys.stderr)
        return 2
    try:
        times, rc, truncated, calib, adj = load_query_times(
            args.bench, args.local)
    except (OSError, json.JSONDecodeError) as e:
        print(f"cannot read bench {args.bench}: {e}", file=sys.stderr)
        return 2

    cal_ratio, cal_note = calibration_ratio(calib, ref_doc.get("calib"))
    threshold = args.threshold
    quiet = True
    if cal_ratio is None:
        print(f"note: no calibration scaling ({cal_note}); using raw "
              f"threshold {threshold}x", file=sys.stderr)
    elif cal_ratio > args.refuse_above:
        quiet = False
        print(f"BOX NOT QUIET: calibration {cal_ratio:.2f}x over the quiet "
              f"reference ({cal_note}) - per-query adjudication refused; "
              f"re-run in a quiet window before acting on any timing")
    elif cal_ratio > 1.05:
        threshold = args.threshold * cal_ratio
        print(f"calibration: box {cal_ratio:.2f}x over quiet reference "
              f"({cal_note}) - threshold scaled "
              f"{args.threshold}x -> {threshold:.2f}x")
    else:
        print(f"calibration: box quiet ({cal_note})", file=sys.stderr)

    changed = {q.strip() for q in args.changed.split(",") if q.strip()}
    unknown_changed = changed - set(ref)
    if unknown_changed:
        print(f"warning: --changed names not in reference: {sorted(unknown_changed)}",
              file=sys.stderr)

    if rc not in (0, None):
        print(f"FAIL: bench run exited rc={rc}")
        return 1
    if truncated:
        print(f"note: input had parsed=null; recovered {len(times)} per-query "
              f"times from truncated stdout tail")

    missing = sorted(set(ref) - set(times))
    new = sorted(set(times) - set(ref))
    flagged = []       # over threshold, plan unchanged -> re-measure isolated
    hard = []          # over threshold AND plan changed -> regression
    # Sub-min_sec floors are noise-exempt ONLY while the measured time is
    # also small (VERDICT r18 #2: q14's 0.197s floor read 12.96s — 65.9x,
    # the largest ratio in the artifact — and was invisible to the old
    # unconditional exemption). A tiny-floor query whose MEASURED time
    # exceeds max(min_sec x threshold, abs_cap) is flagged like any other.
    abs_exempt = max(args.min_sec * threshold, args.abs_cap)
    for q in sorted(set(ref) & set(times)):
        if ref[q] < args.min_sec and times[q] <= abs_exempt:
            continue
        ratio = times[q] / ref[q]
        if ratio > threshold:
            (hard if q in changed else flagged).append((q, times[q], ref[q], ratio))

    # Self-adjudication (round 17, VERDICT r16 #1): the bench re-ran its
    # own over-threshold queries after the suite and stamped the isolated
    # readings + a fresh calib sample. A flag whose isolated reading is
    # within the (adjudication-window-scaled) threshold was suite-window
    # noise — cleared here, so a quiet-window attestation needs no judge
    # re-run. Works in the refusal path too: the suite window being loaded
    # doesn't invalidate isolated readings taken in a LATER quiet window
    # (anything unflagged passed the raw threshold even on the loaded box,
    # so clearing the flagged set closes the round).
    adj_lists, adj_cleared = apply_adjudication(
        adj, ref, [("hard", hard), ("flagged", flagged)],
        args.threshold, ref_doc.get("calib"), args.refuse_above)
    (_, hard), (_, flagged) = adj_lists

    if not quiet:
        # rescue ONLY when the adjudication actually cleared every flag —
        # a loaded window with no flags (or no adjudication section) keeps
        # the unconditional exit-3 contract (ADVICE r15)
        if adj_cleared > 0 and not (hard or flagged):
            print("suite window not quiet, but every flag cleared by the "
                  "bench's own isolated adjudication re-runs")
        else:
            # the box was measurably loaded: remaining timings carry no
            # signal. Report what WOULD have been flagged (informational),
            # adjudicate nothing — and exit 3, NOT 0 (ADVICE r15): refusal
            # must be distinguishable from clean by scripted callers, or a
            # loaded box passes plan-changed regressions silently.
            for q, t, r, ratio in hard + flagged:
                print(f"unadjudicated {q}: {t:.2f}s vs quiet {r:.2f}s ({ratio:.1f}x) "
                      f"- box not quiet, timing carries no signal")
            return 3

    # provenance annotation (round 16): a flagged query whose recorded min
    # predates the current surface or a calibrated window is a stale-min
    # candidate — the q05/q60-class pattern the judge re-proved manually in
    # rounds 13-15. The annotation is informational; it never changes the
    # exit code (a plan-changed regression is a regression regardless).
    prov = ref_doc.get("provenance") or {}
    surface = ref_doc.get("n_queries")

    def stale_note(q):
        p = prov.get(q)
        if not isinstance(p, dict):
            return ""
        reasons = []
        if surface and p.get("surface") and int(p["surface"]) < int(surface):
            reasons.append(f"min recorded at {p['surface']}-query surface")
        if p.get("calibrated") is False:
            reasons.append("min predates calibration")
        if reasons:
            return f" [stale-min candidate: {'; '.join(reasons)}]"
        return ""

    for q, t, r, ratio in hard:
        print(f"REGRESSION {q}: {t:.2f}s vs quiet {r:.2f}s ({ratio:.1f}x, "
              f"plan changed){stale_note(q)}")
    for q, t, r, ratio in flagged:
        print(f"noise-or-regression {q}: {t:.2f}s vs quiet {r:.2f}s ({ratio:.1f}x) "
              f"- plan unchanged this round; re-measure isolated before acting"
              f"{stale_note(q)}")
    if missing:
        print(f"missing from bench input ({len(missing)}): {', '.join(missing)}"
              + (" [stdout truncation]" if truncated else ""))
    if new:
        print(f"new queries not in reference ({len(new)}): {', '.join(new)} "
              f"- add quiet values to {args.ref}")
    if not (hard or flagged or missing):
        print(f"clean: {len(times)} queries all within {threshold:.2f}x of quiet reference")
    return 1 if hard else 0


if __name__ == "__main__":
    sys.exit(main())
