#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: reads Verify output
(parquet per query + oracle_sql.json), runs the oracle SQL in DuckDB over the
same sf dir, and compares row count, column names, and a value hash
(column-name-sorted, row-order-insensitive). Usage:
  python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
subset = set(sys.argv[3:])  # optional query names: check only these
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
if subset:
    oracle = {k: v for k, v in oracle.items() if k in subset}

def canon(df):
    # sort columns by name, round-trip values to strings, sort rows
    df = df[sorted(df.columns)]
    rows = sorted(tuple(repr(v) for v in row) for row in df.itertuples(index=False))
    return rows

fails = 0
for name, sql in sorted(oracle.items()):
    pq = f"{outdir}/{name}"
    if not os.path.isdir(pq):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        mine = con.execute(f"SELECT * FROM read_parquet('{pq}/*.parquet')").df()
        ref = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    if sorted(mine.columns) != sorted(ref.columns):
        print(f"FAIL {name}: cols {sorted(mine.columns)} vs {sorted(ref.columns)}"); fails += 1; continue
    a, b = canon(mine), canon(ref)
    if len(a) != len(b):
        print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); fails += 1; continue
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        print(f"FAIL {name}: value mismatch, e.g. {diff}"); fails += 1; continue
    print(f"OK   {name} ({len(a)} rows)")
print(f"{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'} / {len(oracle)} oracle queries")
sys.exit(1 if fails else 0)
