#!/usr/bin/env python3
"""Cross-round per-query bench ledger (r7 VERDICT item #7).

Parses every committed generation of bench.json out of git history
(each round's end-of-round sweep commits one), plus the working-tree
bench.json if present, and prints:

  - a per-query table of the last N generations (seconds),
  - a regression list: queries whose latest time exceeds the previous
    generation by more than THRESHOLD (default 1.5x) AND exceed the
    scheduling-floor guard (default 1.0 s — sub-second deltas at
    local[32] are pure scheduler noise).

The round-exit checklist (SURVEY.md section 7) runs this mechanically;
flagged rows must be solo re-benched (SPARK_GRAFT_ONLY=<q>) before the
round closes — the sweep-noise adjudication rule in SURVEY section 6.

Usage: python3 tools/bench_compare.py [--threshold 1.5] [--floor 1.0]
                                      [--last 5]
Exit code 1 if any regression is flagged (so the checklist can gate).
"""
import argparse
import json
import subprocess
import sys


def git(*args):
    return subprocess.run(["git"] + list(args), capture_output=True,
                          text=True, check=True).stdout


def load_generations():
    """[(label, {query: secs})] oldest->newest, deduped by content."""
    shas = git("log", "--reverse", "--format=%h", "--", "bench.json").split()
    gens, seen = [], set()
    for sha in shas:
        try:
            raw = git("show", f"{sha}:bench.json")
        except subprocess.CalledProcessError:
            continue
        try:
            doc = json.loads(raw.strip().splitlines()[0])
        except (json.JSONDecodeError, IndexError):
            continue
        queries = doc.get("queries")
        if not isinstance(queries, dict) or not queries:
            continue
        key = json.dumps(queries, sort_keys=True)
        if key in seen:
            continue
        seen.add(key)
        gens.append((sha, queries))
    try:
        with open("bench.json") as f:
            doc = json.loads(f.read().strip().splitlines()[0])
        queries = doc.get("queries") or {}
        key = json.dumps(queries, sort_keys=True)
        if queries and key not in seen:
            gens.append(("worktree", queries))
    except (OSError, json.JSONDecodeError, IndexError):
        pass
    return gens


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=1.0,
                    help="ignore regressions whose latest time is below this")
    ap.add_argument("--last", type=int, default=5)
    args = ap.parse_args()

    gens = load_generations()
    # drop partial sweeps (SPARK_GRAFT_ONLY dev/adjudication runs write
    # bench.json too): a generation counts only if it covers >=80% of
    # the largest sweep seen, so the ledger compares like with like
    if gens:
        full = max(len(q) for _, q in gens)
        gens = [(l, q) for l, q in gens if len(q) >= 0.8 * full]
    if len(gens) < 2:
        print(f"only {len(gens)} full-sweep bench.json generation(s) found;"
              " nothing to compare")
        return 0
    gens = gens[-args.last:]
    labels = [g[0] for g in gens]
    prev, latest = gens[-2][1], gens[-1][1]

    regressions = []
    for q, t_new in sorted(latest.items()):
        t_old = prev.get(q)
        if t_old is None or t_old <= 0 or t_new <= 0:
            continue
        if t_new > args.floor and t_new / t_old > args.threshold:
            regressions.append((q, t_old, t_new, t_new / t_old))

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
    if regressions:
        print(f"\nREGRESSIONS (> {args.threshold}x and above {args.floor}s floor)"
              " — solo re-bench each before round exit:")
        for q, t_old, t_new, ratio in sorted(regressions, key=lambda r: -r[3]):
            print(f"  {q}: {t_old:.3f}s -> {t_new:.3f}s  ({ratio:.2f}x)"
                  f"   [SPARK_GRAFT_ONLY={q} runMain graft.Bench]")
        return 1
    print("\nno regressions flagged")
    return 0


if __name__ == "__main__":
    sys.exit(main())
