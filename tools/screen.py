#!/usr/bin/env python3
"""The per-round weak screen, computed deterministically from the two
fold artifacts — raw AND anchor-normalized, so row membership is
stable across host-days (a loaded host inflates every Spark wall
equally; dividing by the untouched-TPC-H anchor drift removes that
before thresholding).

A row screens weak when, on NORMALIZED numbers (spark / anchor_drift):
  correct AND spark_norm >= ABS_FLOOR seconds AND ratio_norm > RATIO.
The raw numbers print alongside so the artifacts stay auditable.

Usage: python3 tools/screen.py <bench_fold.json> <oracle.json>
           [abs_floor=1.0] [ratio=2.0]
Writes markdown to stdout; pipe into BASELINE.md's screen section.
"""
import sys, json


def main():
    bench = json.load(open(sys.argv[1]))
    oracle = json.load(open(sys.argv[2]))
    abs_floor = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    ratio_thresh = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0
    drift = bench.get("anchor_drift") or 1.0
    rows = []
    for q, s in bench["queries"].items():
        o = oracle["queries"].get(q)
        if o is None or o <= 0:
            continue
        s_norm = s / drift
        r_raw = s / o
        r_norm = s_norm / o
        if s_norm >= abs_floor and r_norm > ratio_thresh:
            rows.append((q, s, s_norm, o, r_raw, r_norm))
    rows.sort(key=lambda r: -r[5])
    print(f"<!-- screen: abs_floor={abs_floor}s ratio>{ratio_thresh}x "
          f"anchor_drift={drift} (normalized membership) -->")
    print("| query | spark s (raw) | spark s (norm) | oracle s | × raw | × norm |")
    print("|---|---|---|---|---|---|")
    for q, s, sn, o, rr, rn in rows:
        print(f"| {q} | {s:.3f} | {sn:.3f} | {o:.3f} | {rr:.1f} | {rn:.1f} |")
    print(f"\n{len(rows)} rows; spark total {bench['value']} s over "
          f"{bench['n_queries']} queries vs oracle total {oracle['total']} s "
          f"= {bench['value']/oracle['total']:.2f}x raw, "
          f"{bench['value']/drift/oracle['total']:.2f}x normalized")


if __name__ == "__main__":
    main()
