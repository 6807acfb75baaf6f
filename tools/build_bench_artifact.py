#!/usr/bin/env python3
"""Assemble BENCH_BUILDER_rN.json from a bench run.

Usage: python3 tools/build_bench_artifact.py <round> <stdout_json_file> [note]

Reads target/bench_detail.json (written by graft.Bench) plus the
captured one-line stdout JSON, stamps the current commit, and writes
BENCH_BUILDER_r<round>.json with the same shape as r9's artifact plus
the round-10 covariate fields (per-run load, per-query storage state,
cold failures).
"""
import json
import subprocess
import sys

rnd = int(sys.argv[1])
headline = json.load(open(sys.argv[2]))
note = sys.argv[3] if len(sys.argv) > 3 else ""
detail = json.load(open("target/bench_detail.json"))
commit = subprocess.check_output(
    ["git", "rev-parse", "--short", "HEAD"]).decode().strip()
heap = "88g"

out = {
    "headline": headline,
    "covariates": {
        "commit": commit,
        "heap": heap,
        "date": subprocess.check_output(["date", "+%Y-%m-%d"]).decode().strip(),
        "load_1m_start": detail.get("load_start"),
        "load_1m_end": detail.get("load_end"),
        "note": note,
    },
}
out.update(detail)
name = f"BENCH_BUILDER_r{rnd:02d}.json"
json.dump(out, open(name, "w"), indent=None, separators=(",", ":"))
print(f"wrote {name}: {len(detail['queries_med'])} queries, "
      f"suite {headline['value']} s, cold {headline['cold_sec']} s, "
      f"load {detail.get('load_start')}->{detail.get('load_end')}")
