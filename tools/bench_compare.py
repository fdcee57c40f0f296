#!/usr/bin/env python3
"""Cross-round per-query bench ledger (r7 VERDICT item #7;
box-normalized since r11 per r10 VERDICT item #2).

Parses every committed generation of bench.json out of git history
(each round's end-of-round sweep commits one), plus the working-tree
bench.json if present, and prints:

  - a per-query table of the last N generations (seconds),
  - the box factor between the two newest generations (the ratio of
    their `calibration` probes — a warm, gc-fenced solo q1_pricing pass
    Bench times before the sweep; 1.0 when either side predates the
    probe),
  - a regression list: queries whose latest/previous ratio, DIVIDED BY
    THE BOX FACTOR, exceeds THRESHOLD (default 1.5x) AND whose latest
    time exceeds the scheduling-floor guard (default 1.0 s — sub-second
    deltas at local[32] are pure scheduler noise).

Why normalize: the build VM's Spark speed varies ~2x between rounds
(r10 ran ~1.9x slower than r9 and flagged a uniform band including
untouched headliners — all machine, adjudicated by solo probes). The
calibration probe measures the machine once; dividing it out leaves
only code-attributable movement.

The round-exit checklist (SURVEY.md section 7) runs this mechanically;
flagged rows must be solo re-benched (SPARK_GRAFT_ONLY=<q>) before the
round closes — the sweep-noise adjudication rule in SURVEY section 6.

Usage: python3 tools/bench_compare.py [--threshold 1.5] [--floor 1.0]
                                      [--last 5] [--selftest]
Exit code 1 if any regression is flagged (so the checklist can gate).
"""
import argparse
import json
import subprocess
import sys


def git(*args):
    return subprocess.run(["git"] + list(args), capture_output=True,
                          text=True, check=True).stdout


def parse_doc(raw):
    """(queries, calibration_sec|None) from one bench.json text."""
    doc = json.loads(raw.strip().splitlines()[0])
    queries = doc.get("queries")
    if not isinstance(queries, dict) or not queries:
        return None
    cal = (doc.get("calibration") or {}).get("sec")
    cal = float(cal) if isinstance(cal, (int, float)) and cal > 0 else None
    return queries, cal


def load_generations():
    """[(label, {query: secs}, cal)] oldest->newest, deduped by content."""
    shas = git("log", "--reverse", "--format=%h", "--", "bench.json").split()
    gens, seen = [], set()
    for sha in shas:
        try:
            raw = git("show", f"{sha}:bench.json")
        except subprocess.CalledProcessError:
            continue
        try:
            parsed = parse_doc(raw)
        except (json.JSONDecodeError, IndexError):
            continue
        if parsed is None:
            continue
        queries, cal = parsed
        key = json.dumps(queries, sort_keys=True)
        if key in seen:
            continue
        seen.add(key)
        gens.append((sha, queries, cal))
    try:
        with open("bench.json") as f:
            parsed = parse_doc(f.read())
        if parsed is not None:
            queries, cal = parsed
            key = json.dumps(queries, sort_keys=True)
            if key not in seen:
                gens.append(("worktree", queries, cal))
    except (OSError, json.JSONDecodeError, IndexError):
        pass
    return gens


def box_factor(cal_prev, cal_new):
    """Machine-speed ratio between two generations (>1 = newer box
    slower). 1.0 when either side lacks the calibration probe."""
    if cal_prev and cal_new:
        return cal_new / cal_prev
    return 1.0


def find_regressions(prev, latest, box, threshold, floor):
    """[(q, t_old, t_new, raw_ratio, normalized_ratio)] — flagged rows."""
    out = []
    for q, t_new in sorted(latest.items()):
        t_old = prev.get(q)
        if t_old is None or t_old <= 0 or t_new <= 0:
            continue
        raw = t_new / t_old
        norm = raw / box
        if t_new > floor and norm > threshold:
            out.append((q, t_old, t_new, raw, norm))
    return out


def selftest():
    """Synthetic 2x-clock check: a generation that is uniformly 2x
    slower WITH a 2x calibration must flag nothing; a genuine 3x
    single-query regression on top of the 2x box must still flag."""
    prev = {"q_a": 1.0, "q_b": 2.0, "q_c": 4.0}
    slow_box = {q: t * 2.0 for q, t in prev.items()}
    assert box_factor(1.0, 2.0) == 2.0
    flags = find_regressions(prev, slow_box, box_factor(1.0, 2.0), 1.5, 1.0)
    assert flags == [], f"uniform 2x box flagged: {flags}"
    # without calibration the same sweep WOULD flag (the r10 failure mode)
    unnorm = find_regressions(prev, slow_box, 1.0, 1.5, 1.0)
    assert len(unnorm) == 3, f"expected 3 raw flags, got {unnorm}"
    # a genuine 3x regression on q_b survives normalization
    slow_box["q_b"] = prev["q_b"] * 2.0 * 3.0
    flags = find_regressions(prev, slow_box, 2.0, 1.5, 1.0)
    assert [f[0] for f in flags] == ["q_b"], f"expected q_b only: {flags}"
    # floor guard: sub-floor rows never flag even at huge ratios
    flags = find_regressions({"q_tiny": 0.01}, {"q_tiny": 0.9}, 1.0, 1.5, 1.0)
    assert flags == [], f"sub-floor row flagged: {flags}"
    print("selftest ok (4 checks)")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=1.0,
                    help="ignore regressions whose latest time is below this")
    ap.add_argument("--last", type=int, default=5)
    ap.add_argument("--selftest", action="store_true",
                    help="run the synthetic 2x-clock checks and exit")
    args = ap.parse_args()
    if args.selftest:
        return selftest()

    gens = load_generations()
    # drop partial sweeps (SPARK_GRAFT_ONLY dev/adjudication runs write
    # bench.json too): a generation counts only if it covers >=80% of
    # the largest sweep seen, so the ledger compares like with like
    if gens:
        full = max(len(q) for _, q, _ in gens)
        gens = [(l, q, c) for l, q, c in gens if len(q) >= 0.8 * full]
    if len(gens) < 2:
        print(f"only {len(gens)} full-sweep bench.json generation(s) found;"
              " nothing to compare")
        return 0
    gens = gens[-args.last:]
    labels = [g[0] for g in gens]
    prev, latest = gens[-2][1], gens[-1][1]
    box = box_factor(gens[-2][2], gens[-1][2])

    regressions = find_regressions(prev, latest, box,
                                   args.threshold, args.floor)

    all_queries = sorted(latest.keys())
    width = max(len(q) for q in all_queries)
    print(f"{'query'.ljust(width)}  " + "  ".join(f"{l:>9}" for l in labels))
    for q in all_queries:
        row = "  ".join(
            f"{g[1].get(q, float('nan')):9.3f}" if q in g[1] else f"{'-':>9}"
            for g in gens)
        print(f"{q.ljust(width)}  {row}")

    new_queries = sorted(set(latest) - set(prev))
    dropped = sorted(set(prev) - set(latest))
    print(f"\ngenerations compared: {labels[-2]} -> {labels[-1]}"
          f"  ({len(prev)} -> {len(latest)} queries;"
          f" +{len(new_queries)} new, -{len(dropped)} dropped)")
    cals = " vs ".join(
        f"{c:.3f}s" if c else "absent" for c in (gens[-2][2], gens[-1][2]))
    print(f"box factor: {box:.2f}x (calibration probe {cals})")
    if regressions:
        print(f"\nREGRESSIONS (> {args.threshold}x box-normalized, above "
              f"{args.floor}s floor) — solo re-bench each before round exit:")
        for q, t_old, t_new, raw, norm in sorted(regressions,
                                                 key=lambda r: -r[4]):
            print(f"  {q}: {t_old:.3f}s -> {t_new:.3f}s  ({raw:.2f}x raw, "
                  f"{norm:.2f}x normalized)"
                  f"   [SPARK_GRAFT_ONLY={q} runMain graft.Bench]")
        return 1
    print("\nno regressions flagged")
    return 0


if __name__ == "__main__":
    sys.exit(main())
