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

# Cold basis (VERDICT r11 Next #4): the cold pass is ONE run per query,
# so it is noisier than the 3-run warm median — the floor is higher to
# skip small-query jitter — but it is also where slow drifts hide (r11:
# dd_prefix_join 289 -> 447 exec-s, a 1.55x move no 2x gate catches),
# so the ratio is lower.
COLD_FLAG_RATIO = 1.5
COLD_FLOOR_SEC = 5.0
# A contiguous run (in cold-pass order — the Map's hash order, i.e.
# the order the queries actually executed) of queries all >=
# WINDOW_RATIO above their previous-round cold exec is the temporal-
# anomaly signature (r11: one of four passes showed a contiguous
# 5-45x window). Minimum length 2: r12's anomalous run 2 had an
# adjacent (gen_store_check 6.2x, it_mis 3.4x) pair a >=3 rule
# missed; at 3x-with-5s-floor two adjacent false positives are
# already unlikely, and big ISOLATED spikes (run 2's it_harmonic
# 14x) are still caught by the per-query flag list above.
WINDOW_RATIO = 3.0
WINDOW_MIN_LEN = 2


def _cold_exec(art):
    """query -> (exec_sec, load) from queries_cold_wall_exec.

    Entries are [w, x, ld] (r10) or [w, x, gc, ld] (r11+)."""
    out = {}
    for q, c in art.get("queries_cold_wall_exec", {}).items():
        if isinstance(c, (list, tuple)) and len(c) >= 3:
            out[q] = (c[1], c[-1])
    return out


def coverage_diff(cur, prev):
    """(added, removed) query names between two artifacts — renames and
    removals must be LISTED, not silently dropped from tracking
    (ADVICE r11)."""
    ce, pe = set(cur.get("queries_exec_med", {})), set(prev.get("queries_exec_med", {}))
    return sorted(ce - pe), sorted(pe - ce)


def cold_regressions(cur, prev):
    """Flagged per-query cold-exec moves between two artifact dicts,
    with the load covariate from each round's cold tuple."""
    ce, pe = _cold_exec(cur), _cold_exec(prev)
    out = []
    for q in sorted(set(ce) & set(pe)):
        (c, cld), (p, pld) = ce[q], pe[q]
        if max(c, p) < COLD_FLOOR_SEC:
            continue
        lo, hi = min(c, p), max(c, p)
        ratio = (float("inf") if hi > 0 else 1.0) if lo <= 0 else hi / lo
        if ratio < COLD_FLAG_RATIO:
            continue
        out.append({
            "query": q,
            "cold_exec_prev": p,
            "cold_exec_cur": c,
            "direction": "up" if c > p else "down",
            "load_prev": pld,
            "load_cur": cld,
        })
    return out


def _cold_items(art):
    """(query, cold_tuple) pairs in EXECUTION order. r13+ artifacts
    carry an explicit `cold_order` array (ADVICE r12: dict key order was
    an implicit invariant nothing asserted — a switch to sorted
    serialization would silently scramble windows); older artifacts fall
    back to queries_cold_wall_exec's JSON object order, which CPython
    3.7+ preserves from the file."""
    cw = art.get("queries_cold_wall_exec", {})
    order = art.get("cold_order")
    if order:
        items = [(q, cw[q]) for q in order if q in cw]
        # A malformed artifact (order and cold-map disagreeing) must not
        # silently shrink the anomaly-window scan — that is the same
        # silent-truncation class cold_order exists to kill (ADVICE
        # r13). Leftover cold-map queries append after the ordered run
        # (window adjacency for them is best-effort, coverage is not),
        # and the mismatch is shouted on stderr.
        leftover = [q for q in cw if q not in set(order)]
        missing = [q for q in order if q not in cw]
        if leftover or missing:
            print(f"WARNING: cold_order/queries_cold_wall_exec mismatch: "
                  f"{len(leftover)} cold-map-only {leftover[:5]}, "
                  f"{len(missing)} order-only {missing[:5]}",
                  file=sys.stderr)
            items.extend((q, cw[q]) for q in leftover)
        return items
    return list(cw.items())


def anomaly_windows(cur, prev):
    """Contiguous cold-pass windows (>= WINDOW_MIN_LEN queries in the
    artifact's cold order, every one >= WINDOW_RATIO x its previous-
    round cold exec, skipping sub-floor queries) — the box-weather
    signature a per-query flag list does not show."""
    pe = _cold_exec(prev)
    windows, run = [], []
    for q, c in _cold_items(cur):
        if not (isinstance(c, (list, tuple)) and len(c) >= 3):
            continue
        x = c[1]
        p = pe.get(q, (None, None))[0]
        if p is None or max(x, p) < COLD_FLOOR_SEC:
            continue  # unmatched/small queries neither extend nor break a run
        if p > 0 and x / p >= WINDOW_RATIO:
            run.append({"query": q, "ratio": round(x / p, 1),
                        "cold_exec_prev": p, "cold_exec_cur": x})
        elif p <= 0 and x >= COLD_FLOOR_SEC:
            # 0 -> large is the strongest possible signal: an infinite-
            # ratio window MEMBER, not a run breaker (ADVICE r12 — the
            # old else branch split the window into sub-threshold
            # fragments). ratio is null because JSON has no Infinity.
            run.append({"query": q, "ratio": None,
                        "cold_exec_prev": p, "cold_exec_cur": x})
        else:
            if len(run) >= WINDOW_MIN_LEN:
                windows.append(run)
            run = []
    if len(run) >= WINDOW_MIN_LEN:
        windows.append(run)
    return windows


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
    # new/removed queries are coverage changes, not regressions —
    # coverage_diff() lists them and the artifact embeds the lists
    return out


def main():
    if len(sys.argv) >= 3:
        cur_f, prev_f = sys.argv[1], sys.argv[2]
    else:
        arts = sorted(glob.glob("BENCH_BUILDER_r*.json"))
        if len(sys.argv) == 2:
            cur_f = sys.argv[1]
            prior = [a for a in arts if a < cur_f]
        else:
            if len(arts) < 2:
                sys.exit(f"need two BENCH_BUILDER_r*.json artifacts to diff "
                         f"(found {len(arts)}); pass both paths explicitly")
            cur_f, prior = arts[-1], arts[:-1]
        if not prior:
            sys.exit(f"no builder artifact older than {cur_f} to diff against; "
                     f"pass the previous artifact path explicitly")
        prev_f = prior[-1]
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
    cold = cold_regressions(cur, prev)
    print(f"cold basis: {len(cold)} queries moved >{COLD_FLAG_RATIO}x "
          f"(single-run cold exec, floor {COLD_FLOOR_SEC}s)")
    for e in cold:
        print(f"  {e['query']:28s} {e['cold_exec_prev']:8.1f} -> "
              f"{e['cold_exec_cur']:8.1f} cold exec-s ({e['direction']}) "
              f"load {e['load_prev']:.1f} -> {e['load_cur']:.1f}")
    for w in anomaly_windows(cur, prev):
        qs = " ".join(
            f"{x['query']}({x['ratio'] if x['ratio'] is not None else 'inf'}x)"
            for x in w)
        print(f"  ANOMALY WINDOW ({len(w)} contiguous cold queries "
              f">={WINDOW_RATIO}x): {qs}")
    added, removed = coverage_diff(cur, prev)
    if added or removed:
        print(f"coverage: +{len(added)} {added} / -{len(removed)} {removed}")
    return flagged


if __name__ == "__main__":
    main()
