#!/usr/bin/env python3
"""Derive bench_prior.json from one or more bench_out.json artifacts.

bench_prior.json is the flat {"key": seconds} reference Bench.scala's
implausibility guard (VERDICT r14 #4) compares fresh timings against: any
query or index build measuring > 3x its prior re-measures before the
artifact is written. Refresh it from each committed clean run:

    python3 scripts/make_bench_prior.py bench_out.json > bench_prior.json

With several artifacts, the per-key MIN is kept — the fastest committed
time is the right "plausible" reference (a slow-host epoch can only
inflate times, never deflate them). IMPORTANT: pass only artifacts
produced by the CURRENT build configuration — min can never move a
prior back UP, so feeding a superseded config's faster build time
(e.g. a pre-quality-fix index build) makes the guard re-time every
legitimately-slower build forever. After a deliberate cost change,
regenerate from the new config's runs alone.
"""
import json
import sys

prior = {}


def keep(key, val):
    if isinstance(val, (int, float)) and val > 0:
        prior[key] = min(val, prior.get(key, float("inf")))


for path in sys.argv[1:] or ["bench_out.json"]:
    d = json.load(open(path))
    for name, sec in d.get("queries", {}).items():
        keep(name, sec)
    keep("ann.build_sec", d.get("ann", {}).get("build_sec"))
    keep("ann_l2.build_sec", d.get("ann_l2", {}).get("build_sec"))
    keep("ivf_pq.build_sec",
         d.get("ann_l2", {}).get("ivf_pq", {}).get("build_sec"))
    for blk in d.get("ann_hidim", []):
        keep(f"ann_hidim{blk.get('dim')}.build_sec", blk.get("build_sec"))

json.dump(dict(sorted(prior.items())), sys.stdout, indent=0)
print()
