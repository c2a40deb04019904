#!/usr/bin/env python3
"""Dev-only pre-flight mirroring the driver's correctness gate:
run graft.Verify (sbt) output against DuckDB oracles on the same parquet.

ASYMMETRIC on purpose (this is what the driver does): the Spark side is read
with pyarrow/pandas.read_parquet, which preserves DECIMAL as decimal.Decimal
and DATE as datetime.date; the oracle side goes through duckdb fetchdf, which
coerces DECIMAL->float64 and DATE->datetime64. String-comparing the two sides
therefore catches any typed DECIMAL/DATE/TIMESTAMP column left in a final
projection (the round-1 failure mode) that a symmetric fetchdf/fetchdf
comparison silently masks.

Usage: python3 tools/selfcheck.py [sfDir] [outDir]
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    # driver fixtures are flat files; rehearsal dirs (target/testdata-sf1,
    # -x100) are Spark-written DIRECTORIES of part files — glob inside them
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    # Spark side via pyarrow: typed Decimal/date objects survive (driver parity).
    spark_df = pd.read_parquet(d)
    if name not in oracle:
        print(f"{name:28s} rows-only: {len(spark_df)} rows")
        continue
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name:28s} ORACLE SQL ERROR: {e}")
        fails.append(name)
        continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    o = duck_df.reindex(sorted(duck_df.columns), axis=1)
    ok_schema = list(s.columns) == list(o.columns)
    ok_rows = len(s) == len(o)
    ok_vals = False
    if ok_schema and ok_rows:
        sv = s.astype(str).values.tolist()
        ov = o.astype(str).values.tolist()
        ok_vals = sv == ov
        if not ok_vals:
            # locate first mismatching cell for debugging
            for i, (a, b) in enumerate(zip(sv, ov)):
                if a != b:
                    print(f"   first mismatch row {i}: spark={a} duck={b}")
                    break
    status = "OK" if (ok_schema and ok_rows and ok_vals) else "FAIL"
    if status == "FAIL":
        fails.append(name)
        print(f"{name:28s} {status} schema={ok_schema} rows={len(s)}/{len(o)} vals={ok_vals}")
        if not ok_schema:
            print(f"   spark cols: {list(s.columns)}\n   duck  cols: {list(o.columns)}")
    else:
        print(f"{name:28s} OK ({len(s)} rows)")

# queries that THREW during the dump never produce a result dir — surface
# Verify's failure roster so a partial run can't read as a clean one
err_path = os.path.join(out, "_verify_errors.json")
if os.path.exists(err_path):
    errs = json.load(open(err_path))
    for name, msg in sorted(errs.items()):
        print(f"{name:28s} VERIFY THREW: {msg}")
        fails.append(name)

print(f"\n{len(fails)} failures: {fails}" if fails else "\nALL OK")
sys.exit(1 if fails else 0)
