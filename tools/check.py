#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run each oracle SQL
in DuckDB over the sf tables, load the Verify parquet output, sort columns
by name + rows by value, and hash-compare. Dev tooling only (the real gate
is driver-side)."""
import json, sys, math, decimal, datetime
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        return f"f:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, datetime.datetime):
        return f"t:{v.isoformat()}"
    if isinstance(v, list):
        return "l:[" + ",".join(norm(x) for x in v) + "]"
    return f"{type(v).__name__}:{v}"

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        want = con.sql(sql)
        wcols, wrows = canon([d[0] for d in want.description], want.fetchall())
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e)[:300]}")
        fails += 1
        continue
    try:
        got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        gcols, grows = canon([d[0] for d in got.description], got.fetchall())
    except Exception as e:
        print(f"FAIL {name}: result read error: {str(e)[:300]}")
        fails += 1
        continue
    if [c.lower() for c in wcols] != [c.lower() for c in gcols]:
        print(f"FAIL {name}: schema mismatch spark={gcols} duckdb={wcols}")
        fails += 1
    elif wrows != grows:
        print(f"FAIL {name}: rows spark={len(grows)} duckdb={len(wrows)}")
        diff = [(a, b) for a, b in zip(grows, wrows) if a != b]
        only_g = [r for r in grows if r not in set(map(tuple, wrows))][:3]
        only_w = [r for r in wrows if r not in set(map(tuple, grows))][:3]
        for a, b in diff[:3]:
            print(f"   spark : {a}\n   duckdb: {b}")
        if not diff:
            print(f"   spark-only: {only_g}\n   duckdb-only: {only_w}")
        fails += 1
    else:
        print(f"PASS {name} ({len(grows)} rows)")

queries_missing = [n for n in oracle if n not in oracle]
print(f"\n{len(oracle) - fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
