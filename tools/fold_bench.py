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
    ref_keys, ref_sf = None, None
    for f in files:
        d = json.load(open(f))
        # refuse tail summaries (top-10 only) and mixed inputs: every
        # sweep must cover the SAME query set at the SAME scale, or the
        # folded "total" silently sums a union and lies
        if "queries_file" in d:
            sys.exit(f"{f} is a tail SUMMARY (top-10 queries only) — "
                     f"fold the bench_out.json files it points at instead")
        keys, sf = set(d["queries"]), d.get("sf")
        if ref_keys is None:
            ref_keys, ref_sf = keys, sf
        elif keys != ref_keys or sf != ref_sf:
            sys.exit(f"{f} disagrees with {files[0]}: "
                     f"{len(keys ^ ref_keys)} query-set differences, "
                     f"sf {sf!r} vs {ref_sf!r} — refusing to fold")
        runs += d.get("runs", 0)
        for k, v in d["queries"].items():
            qs[k] = min(qs.get(k, v), v)
    # host-drift factor: geomean of the fold's untouched-TPC-H anchor
    # minima over the ANCHORS.json reference — the normalizer the
    # screen divides by so weak-row membership is stable across
    # host-days (see tools/screen.py)
    import math, os
    drift = None
    anchors_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "ANCHORS.json")
    if os.path.exists(anchors_path):
        ref = json.load(open(anchors_path))
        ratios = [qs[k] / ref[k] for k in ANCHOR_NAMES if k in qs and k in ref]
        if ratios:
            drift = round(math.exp(sum(math.log(r) for r in ratios) / len(ratios)), 4)
    payload = {
        "metric": "total", "value": round(sum(qs.values()), 4), "unit": "sec",
        "runs": runs, "agg": "min", "n_queries": len(qs),
        "anchors": {k: qs[k] for k in ANCHOR_NAMES if k in qs},
        "anchor_drift": drift,
        "queries": dict(sorted(qs.items())),
        "sf": json.load(open(files[0])).get("sf"),
        "folded_from": len(files),
    }
    json.dump(payload, open(out, "w"))
    print(f"{payload['value']} s over {len(qs)} queries ({len(files)} sweeps), "
          f"anchor_drift={drift}")


if __name__ == "__main__":
    main()
