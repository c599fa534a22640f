#!/usr/bin/env python3
"""Ship the round's per-query merged bench floors as a committed artifact.

Round-16 verdict item 1: the only perf gates were the TOTAL (< 2x) and the
recall no-drop, so a single query's floor tripling could hide inside
weather-noisy totals. This script copies BENCH_LOCAL.json's merged floor
table (per-query min folded across same-code runs, `queries_merged`) into
BENCH_FLOORS_r{N}.json; scripts/close_gate.py then compares each floor
against the previous round's table and fails the close on any >25%
regression that lacks a SCALE.md adjudication line
(`floor-adjudication r{N}: <query> — <reason>`).

Usage: python3 scripts/bench_floors.py N    (N = closing round number)
"""
import json
import sys


def main():
    n = int(sys.argv[1])
    js = json.load(open("BENCH_LOCAL.json"))
    floors = js.get("queries_merged")
    if not floors:
        # a stale BENCH_LOCAL.json from an older binary would silently ship
        # the noisier single-run minima as the round's gating baseline
        sys.exit("BENCH_LOCAL.json lacks queries_merged — re-run graft.Bench "
                 "at the committed head (merged floors are the gate input; "
                 "the unmerged single-run table is not an acceptable "
                 "fallback)")
    if "sf0.1" not in str(js.get("sf", "")):
        sys.exit(f"BENCH_LOCAL.json is not an sf0.1 run ({js.get('sf')}) — "
                 "floors must come from the official scale factor")
    if js.get("rotate"):
        sys.exit(f"BENCH_LOCAL.json is a rotated partial run "
                 f"({js['rotate']}) — the floor table must come from a "
                 "FULL-registry run (BASELINE.md rotation policy)")
    out = {
        "round": n,
        "sf": js["sf"],
        "head": js.get("head"),
        "merged_runs": js.get("merged_runs", 0),
        "n_queries": len(floors),
        "floors": {k: round(v, 4) for k, v in sorted(floors.items())},
    }
    path = f"BENCH_FLOORS_r{n:02d}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {path}: {len(floors)} floors, "
          f"merged_runs={out['merged_runs']}")


if __name__ == "__main__":
    main()
