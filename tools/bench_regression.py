#!/usr/bin/env python3
"""Round-over-round per-query exec regression diff (VERDICT r10 Next #1).

Usage: python3 tools/bench_regression.py [BENCH_BUILDER_rN.json [BENCH_BUILDER_rM.json]]
       (no args: auto-pick the two newest BENCH_BUILDER_r*.json)

Compares `queries_exec_med` (cumulative executor-time medians — the
load-independent basis; wall medians stretch under box contention,
executor time does not) between two builder artifacts and flags every
query whose median moved more than FLAG_RATIO in either direction.
For each flagged query it prints the covariates that decide weather vs
regression: per-run [wall, exec, gc, load] from both rounds, the cold
exec basis, and whether the query is memo-warmed (a memo-warmed exec
median near 0 moving to/from nonzero is a memo-policy change, not a
regression).

Also usable as a library: `regressions(cur, prev)` returns the flagged
list; build_bench_artifact.py embeds it in the round artifact so no
future round ships an unexplained >2x move in its own artifact.
"""
import glob
import json
import sys

FLAG_RATIO = 2.0
FLOOR_SEC = 1.0  # ignore moves where both medians are sub-second noise


def regressions(cur, prev):
    """Flagged per-query exec-median moves between two artifact dicts."""
    ce = cur.get("queries_exec_med", {})
    pe = prev.get("queries_exec_med", {})
    memo_cur = set(cur.get("memo_warmed", []))
    memo_prev = set(prev.get("memo_warmed", []))
    out = []
    for q in sorted(set(ce) & set(pe)):
        c, p = ce[q], pe[q]
        if max(c, p) < FLOOR_SEC:
            continue
        lo, hi = min(c, p), max(c, p)
        if lo <= 0:
            ratio = float("inf") if hi > 0 else 1.0
        else:
            ratio = hi / lo
        if ratio < FLAG_RATIO:
            continue
        entry = {
            "query": q,
            "exec_prev": p,
            "exec_cur": c,
            "direction": "up" if c > p else "down",
            "memo_prev": q in memo_prev,
            "memo_cur": q in memo_cur,
        }
        cold = cur.get("queries_cold_wall_exec", {}).get(q)
        if cold:
            entry["cold_wall_exec_load"] = cold
        runs = cur.get("runs_wall_exec_gc_load", {}).get(q)
        if runs:
            entry["runs_cur"] = runs
        runs_p = prev.get("runs_wall_exec_gc_load", {}).get(q)
        if runs_p:
            entry["runs_prev"] = runs_p
        out.append(entry)
    # new/removed queries are coverage changes, not regressions; list them
    return out


def main():
    if len(sys.argv) >= 3:
        cur_f, prev_f = sys.argv[1], sys.argv[2]
    else:
        arts = sorted(glob.glob("BENCH_BUILDER_r*.json"))
        if len(sys.argv) == 2:
            cur_f = sys.argv[1]
            prev_f = [a for a in arts if a < cur_f][-1]
        else:
            cur_f, prev_f = arts[-1], arts[-2]
    cur = json.load(open(cur_f))
    prev = json.load(open(prev_f))
    flagged = regressions(cur, prev)
    print(f"{cur_f} vs {prev_f}: {len(flagged)} queries moved >{FLAG_RATIO}x "
          f"(exec-median basis, floor {FLOOR_SEC}s)")
    for e in flagged:
        memo = ""
        if e["memo_prev"] != e["memo_cur"]:
            memo = f"  MEMO-POLICY {e['memo_prev']}->{e['memo_cur']}"
        print(f"  {e['query']:28s} {e['exec_prev']:8.1f} -> {e['exec_cur']:8.1f} "
              f"exec-s ({e['direction']}){memo}")
        if "cold_wall_exec_load" in e:
            # r10 artifacts carry [w, x, ld]; r11+ [w, x, gc, ld]
            c = e["cold_wall_exec_load"]
            w, x, ld = c[0], c[1], c[-1]
            gc = f" gc {c[2]:.1f}s" if len(c) == 4 else ""
            print(f"    cold: wall {w:.1f}s exec {x:.1f}s{gc} at load {ld:.1f}")
        for tag in ("runs_prev", "runs_cur"):
            if tag in e:
                rs = " ".join(
                    f"[w{w:.1f} x{x:.1f} gc{g:.1f} ld{l:.1f}]"
                    for w, x, g, l in e[tag])
                print(f"    {tag}: {rs}")
    return flagged


if __name__ == "__main__":
    main()
