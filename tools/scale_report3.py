#!/usr/bin/env python3
"""Render SCALE.md's three-column per-query table from SmokeGate JSON lines.

Usage: python3 tools/scale_report3.py sf01.json[,sf01b.json] sf1.json[,sf1b.json] sf10.json[,sf10b.json]
Each argument is a comma-separated list of SmokeGate logs/JSON lines for
that scale factor; per-query minima are taken across the list. Prints a
markdown table: query | sf0.1 s | sf1 s | sf10 s | sf1/sf0.1 | sf10/sf1,
sorted by sf10/sf1 descending, with totals over the common query set.
"""
import json, sys, re


def load_many(paths):
    out = {}
    for p in paths.split(","):
        # parse line-by-line: a greedy cross-line regex would swallow
        # trailing text after a JSON object and break json.loads; a
        # malformed line skips quietly instead of killing the report
        for line in open(p):
            line = line.strip()
            if not line.startswith('{"gate"'):
                continue
            try:
                q = json.loads(line)["queries"]
            except (json.JSONDecodeError, KeyError):
                continue
            for k, v in q.items():
                out[k] = min(out.get(k, 1e18), v)
    return out


a, b, c = (load_many(p) for p in sys.argv[1:4])
common = sorted(set(a) & set(b) & set(c))
rows = [(q, a[q], b[q], c[q]) for q in common]
rows.sort(key=lambda r: -(r[3] / r[2] if r[2] > 0 else 0))
print("| query | sf0.1 s | sf1 s | sf10 s | sf1/sf0.1 | sf10/sf1 |")
print("|---|---|---|---|---|---|")
for q, t1, t2, t3 in rows:
    print(f"| {q} | {t1:.2f} | {t2:.2f} | {t3:.2f} | "
          f"{t2/t1 if t1>0 else 0:.1f}x | {t3/t2 if t2>0 else 0:.1f}x |")
s1, s2, s3 = (sum(r[i] for r in rows) for i in (1, 2, 3))
print(f"| **total ({len(rows)} queries)** | **{s1:.2f}** | **{s2:.2f}** | "
      f"**{s3:.2f}** | **{s2/s1 if s1 > 0 else 0:.1f}x** | **{s3/s2 if s2 > 0 else 0:.1f}x** |")
