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
# scaled-rung safety: DuckDB's naive oracle plans (the deliberately
# O(n^2)-ish replays) can spill without bound at sf1 — cap memory and
# give the spill a dedicated dir so one heavy oracle can't take down
# the whole run's process or disk
if os.environ.get("GRAFT_CHECK_MEM"):
    con.execute(f"SET memory_limit='{os.environ['GRAFT_CHECK_MEM']}'")
    con.execute("SET temp_directory='/tmp/graft-duckdb-spill'")
    spill = os.environ.get("GRAFT_CHECK_SPILL", "40GB")
    con.execute(f"SET max_temp_directory_size='{spill}'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # testdata ships single-file tables; scaled rungs (DataGen.scaleUp)
    # write Spark-style directories of part files
    path = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(path):
        path += "/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
# scaled events store ts as int64 nanos (the nanosAsLong round-trip);
# normalize to TIMESTAMP so oracle SQL is layout-independent
if con.execute("SELECT typeof(ts) FROM events LIMIT 1").fetchone()[0] == "BIGINT":
    p = f"{sf_dir}/events.parquet"
    p = p + "/*.parquet" if os.path.isdir(f"{sf_dir}/events.parquet") else p
    con.execute("CREATE OR REPLACE VIEW events AS "
                f"SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) FROM '{p}'")

oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
# optional comma-lists: GRAFT_CHECK_ONLY / GRAFT_CHECK_SKIP
only = set(filter(None, os.environ.get("GRAFT_CHECK_ONLY", "").split(",")))
skip = set(filter(None, os.environ.get("GRAFT_CHECK_SKIP", "").split(",")))
ok = fail = 0
for name in sorted(oracles):
    if (only and name not in only) or name in skip:
        continue
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
