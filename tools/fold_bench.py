#!/usr/bin/env python3
"""Fold per-query minima across N bench_out.json sweeps into one
bench artifact (the round headline file). Records how many sweeps
fed the fold and the anchor rows so the drift context travels with
the numbers.

Usage: python3 tools/fold_bench.py <out.json> <sweep1.json> [sweep2.json ...]
"""
import sys, json

ANCHOR_NAMES = ("q1_pricing_summary", "q3_join_agg")


def main():
    out, files = sys.argv[1], sys.argv[2:]
    qs, runs = {}, 0
    for f in files:
        d = json.load(open(f))
        runs += d.get("runs", 0)
        for k, v in d["queries"].items():
            qs[k] = min(qs.get(k, v), v)
    payload = {
        "metric": "total", "value": round(sum(qs.values()), 4), "unit": "sec",
        "runs": runs, "agg": "min", "n_queries": len(qs),
        "anchors": {k: qs[k] for k in ANCHOR_NAMES if k in qs},
        "queries": dict(sorted(qs.items())),
        "sf": json.load(open(files[0])).get("sf"),
        "folded_from": len(files),
    }
    json.dump(payload, open(out, "w"))
    print(f"{payload['value']} s over {len(qs)} queries ({len(files)} sweeps)")


if __name__ == "__main__":
    main()
