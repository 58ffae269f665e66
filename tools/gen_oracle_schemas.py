#!/usr/bin/env python3
"""Record each oracle SQL's DuckDB result dtypes as a canonical-kind
snapshot (tools/oracle_schemas.tsv), consumed by OracleSchemaSpec: the
ScalaTest side derives the same canonical kind from each Spark query's
schema and fails on any divergence — so an uncast DuckDB widening
(SUM(BIGINT) -> HUGEINT -> float64) breaks `sbt test` instead of the
driver gate. Regenerate after adding or editing an oracle:

    SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/gen_oracle_schemas.py /root/testdata/sf0.01 /tmp/verify_out

Each line records BOTH sides as pandas sees them — the DuckDB result
kind and the Spark parquet-dump kind — because the driver compares
pandas frames: a nullable Spark BIGINT with actual nulls reads back as
float64 on BOTH sides (a2/a13's left-join columns), which the Spark
SCHEMA alone cannot predict. Generation FAILS on a duck-vs-dump kind
mismatch, so an uncast oracle cannot even be snapshotted.

Canonical kinds: i (any integer width — reprs identically), f:<width>
(float width changes the repr), M (datetime any unit), b, O.
Dev tool only — the graft library itself is pure Scala/Spark.
"""
import json, sys, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))


def kind(dt):
    k = dt.kind
    if k in "iu":
        return "i"
    if k == "f":
        return f"f:{dt}"
    return k


lines = []
bad = []
for name, sql in sorted(oracle.items()):
    duck = con.execute(sql).fetchdf()
    dump = pd.read_parquet(f"{out_dir}/{name}")
    for col in sorted(duck.columns):
        dk, sk = kind(duck[col].dtype), kind(dump[col].dtype)
        if dk != sk:
            bad.append(f"{name}.{col}: duck={dk} dump={sk}")
        lines.append(f"{name}\t{col}\t{dk}\t{sk}")

if bad:
    sys.exit("REFUSING to snapshot mismatched kinds (fix the oracle SQL first):\n  "
             + "\n  ".join(bad))

dest = os.path.join(os.path.dirname(__file__), "oracle_schemas.tsv")
with open(dest, "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {len(lines)} column kinds for {len(oracle)} oracles to {dest}")
