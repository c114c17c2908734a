#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run each oracle SQL
in DuckDB over the sf tables, load the Verify parquet output, sort columns
by name + rows by value, and hash-compare. Dev tooling only (the real gate
is driver-side).

Unlike a value-only compare, this is TYPE-SENSITIVE: the declared DuckDB
type of every output column (decimal precision/scale, integer width,
timestamp unit) is part of the comparison, because the driver's hash is
sensitive to exactly those representation differences (round-1 lesson:
Spark sum(decimal(18,2)) = decimal(28,2) vs DuckDB DECIMAL(38,2) hashed
differently with identical values)."""
import json, os, sys, decimal, datetime
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

def canon(rel):
    cols = [d[0] for d in rel.description]
    types = [str(t) for t in rel.types]
    rows = rel.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    schema = [(cols[i].lower(), types[i]) for i in order]
    return schema, out

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        wschema, wrows = canon(con.sql(sql))
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e)[:300]}")
        fails += 1
        continue
    try:
        gschema, grows = canon(con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'"))
    except Exception as e:
        print(f"FAIL {name}: result read error: {str(e)[:300]}")
        fails += 1
        continue
    if wschema != gschema:
        print(f"FAIL {name}: schema/type mismatch\n   spark : {gschema}\n   duckdb: {wschema}")
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

# outputs written by Verify but lacking an oracle entry, and vice versa
outputs = {d for d in os.listdir(outdir)
           if os.path.isdir(os.path.join(outdir, d))}
for n in sorted(outputs - set(oracle)):
    print(f"WARN {n}: output present but no oracle SQL (rows-only check driver-side)")
for n in sorted(set(oracle) - outputs):
    print(f"FAIL {n}: oracle SQL present but no Verify output written")
    fails += 1

print(f"\n{len(oracle) - fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
