#!/usr/bin/env python3
"""Generate the DuckDB golden fixture for list_slice conformance.

Runs every randomized (list, begin, end[, step]) case through a real
DuckDB (the same engine the driver's oracle uses) and records its
answer. DuckListSliceFixtureSpec replays the file through the Spark
expression and asserts byte-identical results, making "verified
against DuckDB" an executable claim instead of a comment.

Usage: python3 tools/gen_slice_fixture.py  (rewrites the checked-in
fixture; deterministic via fixed seed)
"""
import duckdb
import json
import random

OUT = "src/test/resources/duckdb_list_slice_cases.jsonl"

random.seed(42)
con = duckdb.connect()

def gen_cases():
    # systematic boundary sweep on a length-5 list, with and without
    # steps (negative steps have their own asymmetric clamp rules)
    base = [1, 2, 3, 4, 5]
    bounds = [None, -7, -5, -2, -1, 0, 1, 2, 4, 5, 6, 9]
    for b in bounds:
        for e in bounds:
            for step in [None, -2, -1, 2]:
                yield base, b, e, step
    # randomized lists (incl. empty) with random bounds and steps
    for _ in range(400):
        n = random.randint(0, 10)
        arr = [random.randint(-9, 9) for _ in range(n)]
        b = random.choice([None] + list(range(-12, 13)))
        e = random.choice([None] + list(range(-12, 13)))
        step = random.choice([None, None, None, -2, -1, 1, 2, 3, 4])
        yield arr, b, e, step

def lit(v):
    return "NULL" if v is None else str(v)

rows = []
for arr, b, e, step in gen_cases():
    arr_sql = "[" + ", ".join(str(x) for x in arr) + "]::INT[]"
    args = f"{arr_sql}, {lit(b)}, {lit(e)}"
    if step is not None:
        args += f", {lit(step)}"
    expected = con.sql(f"SELECT list_slice({args}) AS r").fetchone()[0]
    rows.append({
        "arr": arr, "b": b, "e": e, "step": step,
        "has_step": step is not None,
        "expected": None if expected is None else list(expected),
    })

with open(OUT, "w") as f:
    for r in rows:
        f.write(json.dumps(r) + "\n")
print(f"wrote {len(rows)} cases to {OUT} (duckdb {duckdb.__version__})")
