#!/usr/bin/env python3
"""Per-query sf1/sf0.1 superlinearity ratios from two Bench full-record
lines (VERDICT r11 #5). Reads the FULL-record JSON line (4-decimal
seconds) from each log, prints a sorted ratio table and flags queries
whose ratio exceeds the superlinearity threshold (default 10x = the
data-scale factor; linear ops should sit at or below it once fixed
per-query overhead — plan/codegen/driver — is netted out, so the
triage threshold errs high).

Usage: python3 scripts/sf1_ratios.py <bench_sf0.1.log> <bench_sf1.log> [threshold]
(Driver-side tooling only.)
"""
import json
import re
import sys

def full_record(path):
    rec = None
    for line in open(path, encoding="utf-8", errors="replace"):
        line = line.strip()
        if line.startswith('{"metric"') and '"runs"' in line:
            rec = json.loads(line)
    if rec is None:
        sys.exit(f"no full-record bench line in {path}")
    return rec

base = full_record(sys.argv[1])
big = full_record(sys.argv[2])
thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

rows = []
for q, t1 in big["queries"].items():
    t0 = base["queries"].get(q)
    if t0 is None or t0 <= 0 or t1 <= 0:
        continue
    rows.append((t1 / t0, t0, t1, q))
rows.sort(reverse=True)

print(f"total: sf0.1={base['value']:.2f}s sf1={big['value']:.2f}s "
      f"ratio={big['value']/base['value']:.2f}x  "
      f"(failed: sf0.1={base['failed']} sf1={big['failed']})")
print(f"{'ratio':>7} {'sf0.1s':>8} {'sf1s':>8}  query")
flagged = 0
for r, t0, t1, q in rows:
    flag = " <-- >%.0fx" % thresh if r > thresh else ""
    if flag:
        flagged += 1
    print(f"{r:7.2f} {t0:8.3f} {t1:8.3f}  {q}{flag}")
print(f"\n{flagged} queries over {thresh:.0f}x on 10x data")
