#!/usr/bin/env python3
"""Assemble BENCH_BUILDER_rN.json from a bench run.

Usage: python3 tools/build_bench_artifact.py <round> <stdout_json_file> [note]

Reads target/bench_detail.json (written by graft.Bench) plus the
captured one-line stdout JSON, stamps the current commit, and writes
BENCH_BUILDER_r<round>.json with the same shape as r10's artifact plus
the round-11 fields:

- covariates.heap comes from the JVM's own Runtime.maxMemory (emitted
  by Bench as heap_max_mb) instead of a hardcoded string (ADVICE r10).
- exec_regressions: the output of tools/bench_regression.py vs the
  previous round's builder artifact, embedded so a >2x per-query exec
  move can never ship unflagged in the round's own artifact
  (VERDICT r10 Next #1).
- reconciliation: builder clean-box rate vs the latest driver-parsed
  BENCH_rN.json rate, each with its load column, so the judge's
  "driver delta is load" table writes itself (VERDICT r10 Next #7).
"""
import glob
import json
import subprocess
import sys

import bench_regression

rnd = int(sys.argv[1])
headline = json.load(open(sys.argv[2]))
note = sys.argv[3] if len(sys.argv) > 3 else ""
detail = json.load(open("target/bench_detail.json"))
commit = subprocess.check_output(
    ["git", "rev-parse", "--short", "HEAD"]).decode().strip()
heap_mb = detail.get("heap_max_mb", -1)

out = {
    "headline": headline,
    "covariates": {
        "commit": commit,
        "heap": f"{heap_mb // 1024}g" if heap_mb > 0 else "unknown",
        "heap_max_mb": heap_mb,
        "date": subprocess.check_output(["date", "+%Y-%m-%d"]).decode().strip(),
        "load_1m_start": detail.get("load_start"),
        "load_1m_end": detail.get("load_end"),
        "note": note,
    },
}

# round-over-round exec regression flags vs the previous builder artifact
prev_arts = sorted(a for a in glob.glob("BENCH_BUILDER_r*.json")
                   if a < f"BENCH_BUILDER_r{rnd:02d}.json")
if prev_arts:
    prev = json.load(open(prev_arts[-1]))
    flagged = bench_regression.regressions(detail, prev)
    added, removed = bench_regression.coverage_diff(detail, prev)
    out["exec_regressions"] = {
        "vs": prev_arts[-1],
        "flag_ratio": bench_regression.FLAG_RATIO,
        "flagged": flagged,
        # renamed/removed queries must not silently vanish from
        # regression tracking (ADVICE r11)
        "coverage_added": added,
        "coverage_removed": removed,
    }
    # cold-basis flags + contiguous anomaly windows (VERDICT r11 Next
    # #4): the warm gate missed dd_prefix_join 289->447 and a 5-45x
    # temporal window because neither basis was diffed
    out["cold_regressions"] = {
        "vs": prev_arts[-1],
        "flag_ratio": bench_regression.COLD_FLAG_RATIO,
        "floor_sec": bench_regression.COLD_FLOOR_SEC,
        "flagged": bench_regression.cold_regressions(detail, prev),
        "anomaly_windows": bench_regression.anomaly_windows(detail, prev),
    }

# builder-vs-driver rate reconciliation (latest driver artifact on
# disk; the driver wraps Bench's stdout line under "parsed")
driver_arts = sorted(glob.glob("BENCH_r[0-9][0-9].json"))
if driver_arts:
    drv = json.load(open(driver_arts[-1]))
    drv = drv.get("parsed") or drv
    nq = len(detail.get("queries_med", {}))
    # the driver line carries no query count; take it from the builder
    # artifact of the SAME round the driver benched
    drv_round = driver_arts[-1][len("BENCH_r"):-len(".json")]
    try:
        dq = len(json.load(open(f"BENCH_BUILDER_r{drv_round}.json"))
                 .get("queries_med", {})) or nq
    except OSError:
        dq = nq
    out["reconciliation"] = {
        "builder_suite_sec": headline.get("value"),
        # .get + guard: a malformed headline must degrade to null
        # fields, not KeyError away the whole run's artifact (ADVICE r11)
        "builder_s_per_q": round(headline["value"] / nq, 3)
        if headline.get("value") and nq else None,
        "builder_load_prewarm": detail.get("load_prewarm"),
        "builder_load_start": detail.get("load_start"),
        "driver_artifact": driver_arts[-1],
        "driver_suite_sec": drv.get("value"),
        "driver_s_per_q": round(drv["value"] / dq, 3)
        if drv.get("value") and dq else None,
        "driver_load_prewarm": drv.get("load_1m_prewarm"),
        "driver_load_start": drv.get("load_1m_start"),
    }

out.update(detail)
name = f"BENCH_BUILDER_r{rnd:02d}.json"
json.dump(out, open(name, "w"), indent=None, separators=(",", ":"))
print(f"wrote {name}: {len(detail['queries_med'])} queries, "
      f"suite {headline.get('value')} s, cold {headline.get('cold_sec')} s, "
      f"load {detail.get('load_start')}->{detail.get('load_end')}, "
      f"heap {heap_mb} MB, "
      f"{len(out.get('exec_regressions', {}).get('flagged', []))} exec flags, "
      f"{len(out.get('cold_regressions', {}).get('flagged', []))} cold flags")
