#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, not library
code): load Verify output, run each oracle SQL in DuckDB over the same
parquet tables, compare row counts, sorted column names, and values.

Usage: python3 scripts/check.py [sfdir] [verify_outdir]
"""
import duckdb, glob, json, os, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
declared = sorted(
    d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d)))

fails = 0
for name in declared:
    spark = con.execute(
        f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
    if name not in oracle:
        print(f"{name:24s} rows-only: {len(spark)} rows "
              f"{'PASS' if len(spark) > 0 else 'FAIL (0 rows)'}")
        fails += int(len(spark) == 0)
        continue
    try:
        duck = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name:24s} ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    a = spark.reindex(sorted(spark.columns), axis=1)
    b = duck.reindex(sorted(duck.columns), axis=1)
    if list(a.columns) != list(b.columns):
        print(f"{name:24s} FAIL cols spark={list(a.columns)} duck={list(b.columns)}")
        fails += 1
        continue
    if len(a) != len(b):
        print(f"{name:24s} FAIL rows spark={len(a)} duck={len(b)}")
        fails += 1
        continue
    # value compare after canonical row sort (string-rendered, like a hash)
    av = sorted(map(repr, a.itertuples(index=False, name=None)))
    bv = sorted(map(repr, b.itertuples(index=False, name=None)))
    if av != bv:
        bad = [(x, y) for x, y in zip(av, bv) if x != y][:3]
        print(f"{name:24s} FAIL values; first diffs:")
        for x, y in bad:
            print(f"    spark: {x}\n    duck:  {y}")
        fails += 1
    else:
        print(f"{name:24s} PASS ({len(a)} rows)")

print(f"\n{'ALL PASS' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
