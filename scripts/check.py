#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet dir written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf tables,
sorts columns by name, sorts rows, and compares values exactly.
"""
import sys, os, json, glob
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # testdata ships single-file tables; scaled rungs (DataGen.scaleUp)
    # write Spark-style directories of part files
    path = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(path):
        path += "/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
ok = fail = 0
for name in sorted(oracles):
    sql = oracles[name]
    pq = os.path.join(out_dir, name)
    files = glob.glob(pq + "/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        oracle_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    s = spark_df[sorted(spark_df.columns)]
    o = oracle_df[sorted(oracle_df.columns)]
    if list(s.columns) != list(o.columns):
        print(f"FAIL {name}: cols {list(s.columns)} vs {list(o.columns)}")
        fail += 1; continue
    if len(s) != len(o):
        print(f"FAIL {name}: rows {len(s)} vs {len(o)}"); fail += 1; continue
    sv = sorted(map(tuple, s.astype(str).values.tolist()))
    ov = sorted(map(tuple, o.astype(str).values.tolist()))
    if sv != ov:
        bad = [(a, b) for a, b in zip(sv, ov) if a != b][:3]
        print(f"FAIL {name}: value mismatch, e.g. {bad}")
        fail += 1; continue
    print(f"ok   {name} ({len(s)} rows)"); ok += 1
print(f"== {ok} ok, {fail} fail ==")
sys.exit(1 if fail else 0)
