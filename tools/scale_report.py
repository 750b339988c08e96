#!/usr/bin/env python3
"""Render SCALE.md's per-query table from two graft.Bench JSON lines.

Usage: python3 tools/scale_report.py <bench_sf0.1.json> <bench_sf1.json>
Prints a markdown table: query | sf0.1 s | sf1 s | ratio, sorted by
ratio descending, with totals. The bench files are the single-line
{"metric": ...} objects the Bench main prints.
"""
import json, sys, re

def load(p):
    txt = open(p).read()
    m = re.search(r'\{"metric".*\}', txt)
    return json.loads(m.group(0))

a, b = load(sys.argv[1]), load(sys.argv[2])
qa, qb = a["queries"], b["queries"]
rows = []
for q in sorted(qa):
    if q in qb and qa[q] > 0:
        rows.append((q, qa[q], qb[q], qb[q] / qa[q]))
rows.sort(key=lambda r: -r[3])
print("| query | sf0.1 s | sf1 s | sf1/sf0.1 |")
print("|---|---|---|---|")
for q, t1, t2, r in rows:
    print(f"| {q} | {t1:.2f} | {t2:.2f} | {r:.1f}x |")
print(f"| **total** | **{a['value']:.2f}** | **{b['value']:.2f}** | "
      f"**{b['value']/a['value']:.1f}x** |")
