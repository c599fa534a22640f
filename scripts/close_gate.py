#!/usr/bin/env python3
"""Round-close gate — the last act of every round, run from the repo root.

Fails LOUDLY (nonzero exit) when the round is about to close in a state the
driver/judge would flag:

  1. Bench stdout line unparseable through the driver's last-2000-chars
     window, or missing the gate keys, or recording query errors
     (BENCH_r10-r12 were `parsed: null` for three consecutive rounds).
  2. BENCH_LOCAL.json missing/stale-schema.
  3. HEAD has not moved since the driver's round-start artifact commit
     (round 12 closed with zero commits and nothing noticed until the
     verdict).
  4. No TESTRUN_r{N}.json for the closing round (pass -n N to enable).

Usage: python3 scripts/close_gate.py [-n ROUND]
"""
import argparse
import glob
import json
import os
import re
import subprocess
import sys

FAILURES = []


def round_of(path):
    """Round number encoded in an artifact filename, -1 if none."""
    m = re.search(r"_r(\d+)\.json$", path)
    return int(m.group(1)) if m else -1


def prev_round_artifact(pattern, cur_path):
    """Latest artifact matching `pattern` from a round STRICTLY BEFORE
    `cur_path`'s, compared NUMERICALLY — lexicographic filename order
    breaks at round >= 100 ('r100' sorts before 'r18')."""
    cur_n = round_of(cur_path)
    cands = [(round_of(p), p) for p in glob.glob(pattern)]
    cands = [(n, p) for n, p in cands if 0 <= n < cur_n]
    return max(cands)[1] if cands else None


def fail(msg):
    FAILURES.append(msg)
    print(f"[close-gate] FAIL: {msg}")


def ok(msg):
    print(f"[close-gate] ok:   {msg}")


def check_bench_stdout():
    path = "BENCH_STDOUT.txt"
    if not os.path.exists(path):
        return fail(f"{path} missing — run graft.Bench at sf0.1 before closing")
    line = open(path).read().strip()
    if len(line) > 2000:
        return fail(f"bench stdout line is {len(line)} chars; the driver "
                    "keeps only the last 2000 — summary keys would be cut")
    try:
        js = json.loads(line[-2000:])
    except json.JSONDecodeError as e:
        return fail(f"bench stdout line does not parse through the "
                    f"2000-char window: {e}")
    required = ["value", "n_queries", "s_per_query", "pass_totals",
                "n_errors", "core25_total"]
    missing = [k for k in required if k not in js]
    if missing:
        return fail(f"bench stdout line missing keys: {missing}")
    if js["n_errors"] != 0:
        return fail(f"bench recorded {js['n_errors']} query errors: "
                    f"{js.get('errors')}")
    if js.get("rotate"):
        return fail(f"kept bench line is a rotated partial run "
                    f"({js['rotate']}) — stamp a FULL-registry run "
                    "(BASELINE.md rotation policy: rotation is for farm "
                    "runs only)")
    if "sf0.1" in str(js.get("sf", "")) and "ratio_vs_r1" not in js:
        return fail("sf0.1 bench line lacks ratio_vs_r1")
    # Weather refusal (round-13 verdict): never stamp a line whose fixed-mix
    # core25 probe shows a hot window — the measurement is weather, not code.
    # With same-head merged-min in Bench itself, a persistent >1.15 means no
    # quiet window was ever sampled at this commit: run more (bench_quiet.py).
    cr = js.get("core25_ratio")
    if cr is not None and cr > 1.15:
        return fail(f"core25_ratio {cr} > 1.15 — hot window; re-run "
                    "scripts/bench_quiet.py until a quiet sample merges in")
    if js.get("ratio_vs_r1") is not None and js["ratio_vs_r1"] >= 2.0:
        return fail(f"ratio_vs_r1 {js['ratio_vs_r1']} >= 2.0 — the perf gate "
                    "is red; do not close on this line")
    ok(f"bench stdout line: {len(line)} chars, parses, "
       f"{js['n_queries']} queries, n_errors=0, "
       f"ratio_vs_r1={js.get('ratio_vs_r1')} (merged-min FLOOR when "
       f"merged_runs>0), inrun_ratio={js.get('inrun_ratio')} "
       f"(this run's own min-of-passes — the like-for-like figure), "
       f"core25_ratio={js.get('core25_ratio')}, "
       f"merged_runs={js.get('merged_runs', 0)}")


def check_bench_local():
    path = "BENCH_LOCAL.json"
    if not os.path.exists(path):
        return fail(f"{path} missing")
    try:
        js = json.loads(open(path).read())
    except json.JSONDecodeError as e:
        return fail(f"{path} does not parse: {e}")
    for k in ["queries", "raw_passes", "pass_totals", "load_avg"]:
        if k not in js:
            return fail(f"{path} missing key {k}")
    if js.get("errors"):
        return fail(f"{path} records errors: {list(js['errors'])[:5]}")
    ok(f"BENCH_LOCAL.json: {len(js['queries'])} queries, "
       f"total={js['value']:.1f}s, loads={js['load_avg']}")


def check_head_moved():
    log = subprocess.run(
        ["git", "log", "--format=%H %s", "-200"],
        capture_output=True, text=True).stdout.splitlines()
    if not log:
        return fail("git log empty?")
    head = log[0].split()[0]
    start = None
    for ln in log:
        h, _, subj = ln.partition(" ")
        if re.match(r"round \d+: verdict/advice", subj):
            start = h
            break
    if start is None:
        return ok("no driver round-start commit found (round 1?)")
    if head == start:
        return fail("HEAD is still the driver's round-start artifact commit "
                    "— zero builder commits this round")
    n = log.index(next(l for l in log if l.startswith(start)))
    ok(f"HEAD moved: {n} commit(s) since round start {start[:8]}")


def check_testrun(n):
    if n is None:
        print("[close-gate] skip: TESTRUN check (no -n ROUND given)")
        return
    path = f"TESTRUN_r{n:02d}.json"
    if not os.path.exists(path):
        return fail(f"{path} missing — record the round's full `sbt test` run")
    try:
        js = json.loads(open(path).read())
    except json.JSONDecodeError as e:
        return fail(f"{path} does not parse: {e}")
    if js.get("exit_code", js.get("rc", 1)) != 0:
        return fail(f"{path} records a failing test run")
    ok(f"{path}: green")


def check_recall(n):
    # Round-16 verdict item 5: the ANN tier's recall must be
    # round-over-round driver-visible, so a perf win that silently trades
    # recall fails the close instead of passing today's gates.
    if n is None:
        print("[close-gate] skip: RECALL check (no -n ROUND given)")
        return
    path = f"RECALL_r{n:02d}.json"
    if not os.path.exists(path):
        return fail(f"{path} missing — run "
                    f"`sbt \"runMain graft.tools.RecallReport "
                    f"/root/testdata/sf0.1 {path}\"`")
    try:
        js = json.loads(open(path).read())
    except json.JSONDecodeError as e:
        return fail(f"{path} does not parse: {e}")
    # random-fixture tiers (r16) + clustered-fixture tiers (r17, verdict
    # item 2: the clustered fixture is where LSH recall is meaningful —
    # 2/80-level random-fixture numbers can't express a regression)
    # random-fixture + clustered-fixture tiers, plus (r18, verdict item 1)
    # the composed IVF→ADC→rerank production recipe with its two knob-
    # sensitivity points — all deterministic, all no-drop gated
    tiers = ["lsh_nbits8", "lsh_nbits4", "ivf_trained", "ivf_portable",
             "ivf_pq", "pq_rerank", "int8_brute",
             "c_lsh_nbits8", "c_multiprobe8", "c_ivf_trained",
             "c_ivf_pq_resid", "c_pq_rerank",
             # OPQ-style deterministic rotation A/B (r19): same knobs as
             # c_pq_rerank, pipeline in vec_rotate'd space, same truth
             "c_pq_rerank_rot",
             "c_ivf_rerank", "c_ivf_rerank_np2", "c_ivf_rerank_s32",
             # text-LSH served-index tag (r18 continuation): planted-pair
             # recall per edit-distance band on the deterministic fixture
             "t_lsh_tag_k6", "t_lsh_tag_k10", "t_lsh_tag_k14",
             "t_lsh_tag_k18",
             # multi-probe tag (r19): query-side probe expansion over the
             # SAME served index — must dominate the plain tiers per band
             "t_lsh_tag_mp_k6", "t_lsh_tag_mp_k10", "t_lsh_tag_mp_k14",
             "t_lsh_tag_mp_k18"]
    missing = [t for t in tiers if t not in js]
    if missing:
        return fail(f"{path} missing tiers: {missing}")
    dominated = [k for k in (6, 10, 14, 18)
                 if js[f"t_lsh_tag_mp_k{k}"]["recall"]
                 < js[f"t_lsh_tag_k{k}"]["recall"] - 1e-9]
    if dominated:
        return fail(f"{path}: multi-probe tag recall BELOW the plain tag "
                    f"at bands {dominated} — probe expansion can only add "
                    "verified pairs; a drop means the probe matrix or the "
                    "dedup rule broke")
    if js["c_pq_rerank_rot"]["recall"] < js["c_pq_rerank"]["recall"] - 1e-9:
        return fail(f"{path}: rotated PQ rerank recall "
                    f"({js['c_pq_rerank_rot']['recall']:.3f}) BELOW the "
                    f"unrotated tier ({js['c_pq_rerank']['recall']:.3f}) — "
                    "on the anisotropic clustered fixture the rotation must "
                    "dominate; a drop means vec_rotate or its composition "
                    "with the PQ pipeline broke")
    # drift alarm vs the previous round's artifact, when one exists
    prev = prev_round_artifact("RECALL_r*.json", path)
    if prev:
        old = json.loads(open(prev).read())
        drops = [t for t in tiers if t in old
                 and js[t]["recall"] < old[t]["recall"] - 1e-9]
        if drops:
            return fail(f"recall dropped vs {prev} in: " + ", ".join(
                f"{t} {old[t]['recall']:.3f}->{js[t]['recall']:.3f}"
                for t in drops))
    ok(f"{path}: " + ", ".join(f"{t}={js[t]['recall']:.3f}" for t in tiers))


def check_warm(n):
    # Round-17 verdict item 4: the warm/at-rest ANN path (persisted index +
    # *Indexed/*Encoded entry points) is the deployment recipe, but the
    # registry deliberately times the cold oracle-portable shapes — so a
    # warm-path regression was invisible. BENCH_WARM_r{N}.json
    # (graft.tools.BenchWarm, fixed parameters, min-of-passes) is emitted
    # each close; any query >2x the previous round's floor fails.
    if n is None:
        print("[close-gate] skip: warm-ANN check (no -n ROUND given)")
        return
    path = f"BENCH_WARM_r{n:02d}.json"
    if not os.path.exists(path):
        return fail(f"{path} missing — run "
                    f"`sbt \"runMain graft.tools.BenchWarm "
                    f"/root/testdata/sf0.1 {path}\"`")
    try:
        js = json.loads(open(path).read())
    except json.JSONDecodeError as e:
        return fail(f"{path} does not parse: {e}")
    expected = ["pq_adc", "ivf_adc", "pq_rerank", "ivf_rerank"]
    qs = js.get("queries", {})
    missing = [q for q in expected if q not in qs]
    if missing:
        return fail(f"{path} missing warm rows: {missing}")
    prev = prev_round_artifact("BENCH_WARM_r*.json", path)
    if not prev:
        return ok(f"{path}: " + ", ".join(
            f"{q}={qs[q]:.3f}s" for q in expected) + " (baseline round)")
    old = json.loads(open(prev).read()).get("queries", {})
    slow = [f"{q} {old[q]:.3f}->{qs[q]:.3f} ({qs[q] / old[q]:.2f}x)"
            for q in expected if q in old and old[q] > 0
            and qs[q] > old[q] * 2.0]
    if slow:
        return fail(f"warm-ANN regressions >2x vs {prev}: "
                    + ", ".join(slow)
                    + " — farm more BenchWarm runs at this head first "
                    "(same-head merged floors, r18 verdict item 5); a "
                    "persistent 2x after quiet-window merges is code")
    ok(f"{path}: " + ", ".join(f"{q}={qs[q]:.3f}s" for q in expected)
       + f" — all within 2x of {prev}"
       + (f" (merged over {js['merged_runs']} same-head runs)"
          if js.get("merged_runs") else ""))


def check_floors(n):
    # Round-16 verdict item 1: per-query merged floors gate round-over-round.
    # A single query's floor regressing >25% vs the previous round's floor
    # table fails the close unless SCALE.md carries an adjudication line
    # `floor-adjudication r{N}: <query>`; the table itself ships as
    # BENCH_FLOORS_r{N}.json (scripts/bench_floors.py).
    if n is None:
        print("[close-gate] skip: floors check (no -n ROUND given)")
        return
    cur_path = f"BENCH_FLOORS_r{n:02d}.json"
    if not os.path.exists(cur_path):
        return fail(f"{cur_path} missing — run "
                    f"`python3 scripts/bench_floors.py {n}` after the kept "
                    "bench run")
    try:
        cur = json.loads(open(cur_path).read())
    except json.JSONDecodeError as e:
        return fail(f"{cur_path} does not parse: {e}")
    if "floors" not in cur or not cur["floors"]:
        return fail(f"{cur_path} carries no floors")
    # the committed table must match the bench it claims to ship
    if os.path.exists("BENCH_LOCAL.json"):
        bl = json.loads(open("BENCH_LOCAL.json").read())
        blf = bl.get("queries_merged") or bl.get("queries", {})
        drifted = [q for q, v in cur["floors"].items()
                   if q in blf and abs(blf[q] - v) > 5e-4]
        if drifted:
            return fail(f"{cur_path} is stale vs BENCH_LOCAL.json "
                        f"({len(drifted)} floors differ, e.g. {drifted[:3]}) "
                        f"— regenerate with scripts/bench_floors.py {n}")
    prev = prev_round_artifact("BENCH_FLOORS_r*.json", cur_path)
    if not prev:
        return ok(f"{cur_path}: {len(cur['floors'])} floors "
                  "(no previous round's table — baseline round)")
    old = json.loads(open(prev).read())
    scale = open("SCALE.md").read() if os.path.exists("SCALE.md") else ""
    regressed, waived = [], []
    for q, v_old in old.get("floors", {}).items():
        v_new = cur["floors"].get(q)
        if v_new is None or v_old <= 0:
            continue  # dropped/renamed queries are a registry change, not perf
        if v_new > v_old * 1.25:
            if f"floor-adjudication r{n}: {q}" in scale:
                waived.append(q)
            else:
                regressed.append(f"{q} {v_old:.3f}->{v_new:.3f} "
                                 f"({v_new / v_old:.2f}x)")
    if regressed:
        return fail(f"per-query floor regressions vs {prev} without a "
                    "SCALE.md `floor-adjudication` entry:\n    " +
                    "\n    ".join(regressed))
    ok(f"{cur_path}: {len(cur['floors'])} floors vs {prev} — no "
       f"unadjudicated >25% regressions"
       + (f" ({len(waived)} adjudicated: {waived})" if waived else ""))


def check_clean_tree():
    out = subprocess.run(["git", "status", "--porcelain"],
                         capture_output=True, text=True).stdout
    dirty = [l for l in out.splitlines()
             if l and not l.endswith(("BENCH_LOCAL.json", "BENCH_STDOUT.txt",
                                      "BENCH_RUNS.jsonl",
                                      "BENCH_WARM_RUNS.jsonl",
                                      "LEAKCHECK.json"))]
    if dirty:
        return fail("uncommitted changes at close:\n  " + "\n  ".join(dirty))
    ok("working tree clean (modulo regenerated artifacts)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=None, help="closing round number")
    args = ap.parse_args()
    check_bench_stdout()
    check_bench_local()
    check_head_moved()
    check_testrun(args.n)
    check_recall(args.n)
    check_warm(args.n)
    check_floors(args.n)
    check_clean_tree()
    if FAILURES:
        print(f"[close-gate] ROUND CLOSE BLOCKED — {len(FAILURES)} failure(s)")
        sys.exit(1)
    print("[close-gate] all gates green — round may close")


if __name__ == "__main__":
    main()
