#!/usr/bin/env python3
"""Generate the DuckDB golden fixture for the DuckFunctions + shim surface.

Each case is one DuckDB-dialect scalar SELECT whose expected value is
computed by a real DuckDB (same engine as the driver's oracle).
DuckFnFixtureSpec replays every case through DuckSqlShim.rewrite +
spark.sql and requires identical values — executable conformance for
the whole dialect surface, not just list_slice.

Cases avoid the documented deltas (docs/sql-dialect.md): list_sum of
empty/all-NULL lists (engine yields fold zero, DuckDB NULL), HUGEINT
widening (kept inside 64-bit), non-ASCII lengths, and functions with
unspecified result order (list_distinct rendered sorted).

Usage: python3 tools/gen_duckfn_fixture.py  (rewrites the checked-in
fixture; deterministic via fixed seed)
"""
import duckdb
import json
import random

OUT = "src/test/resources/duckdb_fn_cases.jsonl"

random.seed(7)
con = duckdb.connect()

WORDS = ["alpha", "beta", "gamma", "delta", "x1", "z9", "spark", "duck",
         "Hello World", "a,b;c", "", "  pad  ", "it's"]


def slit(s):
    return "'" + s.replace("'", "''") + "'"


def ilist(lo=-9, hi=9, n=None):
    n = random.randint(1, 6) if n is None else n
    return "[" + ", ".join(str(random.randint(lo, hi)) for _ in range(n)) + "]"


def cases():
    for _ in range(30):
        l = ilist()
        yield f"len({l})", "long"
        yield f"list_sum({l})", "long"
        yield f"list_min({l})", "long"
        yield f"list_max({l})", "long"
        yield f"list_aggregate({l}, 'min')", "long"
        yield f"list_aggregate({l}, 'max')", "long"
        yield f"list_aggregate({l}, 'sum')", "long"
        yield f"list_aggregate({l}, 'count')", "long"
        yield f"array_to_string({l}, '-')", "str"
        yield f"array_to_string(list_reverse({l}), '|')", "str"
        yield f"array_to_string(list_append({l}, {random.randint(-9, 9)}), ',')", "str"
        yield f"array_to_string(list_prepend({random.randint(-9, 9)}, {l}), ',')", "str"
        yield f"array_to_string(list_concat({l}, {ilist()}), ',')", "str"
        yield f"list_position({l}, {random.randint(-9, 9)})", "long"
        yield f"list_indexof({l}, {random.randint(-9, 9)})", "long"
        yield f"list_contains({l}, {random.randint(-9, 9)})", "bool"
        yield f"array_to_string(list_transform({l}, x -> x * 2 + 1), ',')", "str"
        yield f"array_to_string(list_filter({l}, x -> x % 2 = 0), ',')", "str"
        yield f"list_sum(list_transform({l}, x -> x * x))", "long"
        i = random.randint(-2, 8)
        yield f"({l})[{i}]", "long"  # 1-based, NULL out of range
    for w in WORDS:
        yield f"len({slit(w)})", "long"
        yield f"strpos({slit(w)}, 'a')", "long"
        yield f"upper({slit(w)})", "str"
        if w:
            yield f"array_to_string(string_split_regex({slit(w)}, '[ ,;]+'), '/')", "str"
    for _ in range(20):
        a, b = random.randint(-99, 99), random.choice([2, 3, 5, 7, -4])
        yield f"{a} // {b}", "long"
        yield f"({a})::DOUBLE / 4", "double"
        yield f"({a} * 1.5)::BIGINT", "long"
    for _ in range(10):
        lo = random.randint(-5, 5)
        hi = lo + random.randint(0, 6)
        yield f"list_sum(generate_series({lo}, {hi}))", "long"
        yield f"len(generate_series({lo}, {hi}))", "long"
    for _ in range(10):
        us = random.randint(0, 2_000_000_000) * 1_000_000 + random.randint(0, 999_999)
        yield f"epoch_us(make_timestamp({us}))", "long"
        yield f"epoch_ms(make_timestamp({us // 1000} * 1000))", "long"
    # ordered string_agg over a VALUES relation (deterministic)
    yield ("(SELECT string_agg(w, '-' ORDER BY k) FROM (VALUES (2, 'b'), "
           "(1, 'a'), (3, 'c')) v(k, w))", "str")


rows, seen = [], set()
for expr, typ in cases():
    if expr in seen:
        continue
    seen.add(expr)
    got = con.sql(f"SELECT {expr}").fetchone()[0]
    row = {"sql": expr, "typ": typ,
           "e_l": None, "e_d": None, "e_s": None, "e_b": None,
           "is_null": got is None}
    if got is not None:
        if typ == "long":
            row["e_l"] = int(got)
        elif typ == "double":
            row["e_d"] = float(got)
        elif typ == "bool":
            row["e_b"] = bool(got)
        else:
            row["e_s"] = str(got)
    rows.append(row)

with open(OUT, "w") as f:
    for r in rows:
        f.write(json.dumps(r) + "\n")
print(f"wrote {len(rows)} cases to {OUT} (duckdb {duckdb.__version__})")
