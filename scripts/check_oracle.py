#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check_oracle.py [sfDir] [verifyOut]
Runs after `sbt "runMain graft.Verify <sfDir> <verifyOut>"`.
"""
import duckdb, json, sys
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'

TABLES = ['region','nation','customer','supplier','part','orders',
          'lineitem','events','documents','embeddings']
con = duckdb.connect()
for t in TABLES:
    con.execute(f"create view {t} as select * from read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_df = pd.read_parquet(f'{out}/{name}')
        duck_df = con.execute(sql).df()
        # check_dtype=True mirrors the driver's dtype-sensitive hash: a
        # DuckDB HUGEINT (object/float64) vs Spark BIGINT divergence must
        # FAIL here — fix by CASTing in the oracle SQL, not by loosening.
        cols = sorted(spark_df.columns)
        s = spark_df[cols].sort_values(cols).reset_index(drop=True)
        q = duck_df[sorted(duck_df.columns)].sort_values(sorted(duck_df.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(s, q, check_dtype=True, check_exact=True)
        print(f"PASS  {name} rows={len(s)}")
    except AssertionError as e:
        fails += 1
        print(f"FAIL  {name}\n  {str(e)[:400]}")
    except Exception as e:
        fails += 1
        print(f"ERROR {name}: {e}")

# Asymmetry between declared oracles, produced result dirs, and query keys
# means a broken/missing query — fail loudly (ADVICE r01).
import os
dirs = {d for d in os.listdir(out)
        if os.path.isdir(os.path.join(out, d))}
missing_results = set(oracle) - dirs
extra_results = dirs - set(oracle)
if missing_results:
    fails += 1
    print(f"MISSING results for declared oracles: {sorted(missing_results)}")
for d in sorted(extra_results):
    # No oracle SQL declared — still assert the minimal invariant the
    # driver's weaker path relies on: readable parquet with >0 rows.
    try:
        n = len(pd.read_parquet(os.path.join(out, d)))
        assert n > 0, "zero rows"
        print(f"PASS  {d} rows={n} (no oracle SQL; rows>0 only)")
    except Exception as e:
        fails += 1
        print(f"FAIL  {d} (no oracle SQL): {e}")
sys.exit(1 if fails else 0)
