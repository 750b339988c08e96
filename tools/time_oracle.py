#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB over the parquet tables at a scale
factor — the baseline half of the per-round bench screen.

Usage: python3 tools/time_oracle.py <sfDir> <oracleSqlJson> <outJson> [runs]
Runs each query `runs` times (default 2), records the per-query MIN, and
writes {"total": t, "queries": {name: sec}} to <outJson>.
"""
import sys, json, time, glob, os
import duckdb


def main():
    sf_dir, oracle_json, out_json = sys.argv[1:4]
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    con = duckdb.connect()
    con.execute("SET threads TO %d" % (os.cpu_count() or 32))
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_json))
    out = {}
    for name in sorted(oracle):
        best = None
        for _ in range(runs):
            t0 = time.time()
            try:
                con.execute(oracle[name]).fetchall()
            except Exception as e:
                print(f"ERR {name}: {e}", file=sys.stderr)
                best = None
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        if best is not None:
            out[name] = round(best, 4)
            print(f"{name} {best:.3f}")
    payload = {"total": round(sum(out.values()), 4), "queries": out,
               "sf": sf_dir, "runs": runs, "agg": "min"}
    json.dump(payload, open(out_json, "w"))
    print(f"TOTAL {payload['total']:.1f}s over {len(out)} queries -> {out_json}")


if __name__ == "__main__":
    main()
