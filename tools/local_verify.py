#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: read Verify.scala's
parquet dumps, run each oracle SQL in DuckDB over the same sf dir, and
compare (sort columns by name, sort rows, value-compare). Dev tool only —
the graft library itself is pure Scala/Spark."""
import json, os, sys, math
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
# optional third arg: comma-separated query subset (mirrors Verify's
# subset arg — compare only the queries that were dumped)
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    # table-subset scale dirs (gen_sf.py documents-only runs) lack most
    # tables; a query touching a missing view then fails loudly at
    # exec time, which is the right failure for a subset compare
    if os.path.exists(f"{sf_dir}/{t}.parquet"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cell_eq(a, b):
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            return a == b or math.isclose(float(a), float(b), rel_tol=0, abs_tol=0)
        except (TypeError, ValueError):
            return False
    return a == b

fails = 0
for name, sql in sorted(oracle.items()):
    if only is not None and name not in only:
        continue
    try:
        spark_df = pd.read_parquet(f"{out_dir}/{name}")
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: load/exec error: {e}")
        fails += 1
        continue
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
        fails += 1
        continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
        fails += 1
        continue
    # dtype-strict: the driver's compare hashes value reprs, so an
    # int64-vs-float64 divergence (e.g. DuckDB widening SUM(BIGINT) to
    # HUGEINT -> fetchdf float64) fails there even when values are equal
    # (round 6's c30/c32 reds). Integer WIDTH (int32 vs int64) and
    # datetime UNIT (ns vs us) repr identically and passed the driver
    # hash in r6, so compare at dtype-KIND level — except floats, where
    # width changes the repr (float32 0.1 != float64 0.1).
    def dkind(dt):
        k = dt.kind
        return 'i' if k in 'iu' else k
    dtype_bad = []
    for c in s.columns:
        sk, dk = dkind(s[c].dtype), dkind(d[c].dtype)
        if sk != dk or (sk == 'f' and str(s[c].dtype) != str(d[c].dtype)):
            dtype_bad.append((c, str(s[c].dtype), str(d[c].dtype)))
    if dtype_bad:
        for c, sd, dd in dtype_bad:
            print(f"FAIL {name}: dtype mismatch col={c} spark={sd} duck={dd}"
                  " (driver hash-compare would fail; cast the oracle SQL)")
        fails += 1
        continue
    mismatch = None
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if not cell_eq(a, b):
                mismatch = (col, i, a, b)
                break
        if mismatch:
            break
    if mismatch:
        col, i, a, b = mismatch
        print(f"FAIL {name}: value mismatch col={col} row={i} spark={a!r} duck={b!r}")
        print(f"  spark dtypes: {dict(s.dtypes.astype(str))}")
        print(f"  duck  dtypes: {dict(d.dtypes.astype(str))}")
        fails += 1
    else:
        print(f"OK   {name}: {len(s)} rows")

# rows-only queries (no oracle)
import os
for name in sorted(os.listdir(out_dir)):
    p = os.path.join(out_dir, name)
    if os.path.isdir(p) and name not in oracle and (only is None or name in only):
        n = len(pd.read_parquet(p))
        print(f"{'OK  ' if n > 0 else 'FAIL'} {name}: rows-only check, {n} rows")
        if n == 0:
            fails += 1

sys.exit(1 if fails else 0)
