#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB (single-threaded and default) at a
given SF, for comparison with graft.Bench output. Usage:
  python3 tools/duckdb_bench.py /root/testdata/sf0.1 /tmp/verify_out_01/oracle_sql.json [bench.json]
"""
import duckdb, json, sys, time
sf, oracle_path = sys.argv[1], sys.argv[2]
# BENCH.json carries two lines (total, detail) since round 9 - take the first
bench = json.loads(open(sys.argv[3]).readline()) if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(oracle_path))
rows = []
for name, sql in sorted(oracle.items()):
    t0 = time.time(); con.execute(sql).fetchall(); dt = time.time() - t0
    spark = bench['queries'].get(name) if bench else None
    rows.append((name, dt, spark))
print(f"{'query':30s} {'duckdb':>8s} {'spark':>8s} {'ratio':>6s}")
tot_d = tot_s = 0.0
for name, d, s in rows:
    tot_d += d
    if s: tot_s += s
    r = f"{s/d:5.1f}x" if s else "  -"
    print(f"{name:30s} {d:8.2f} {s if s else 0:8.2f} {r}")
print(f"{'TOTAL (oracle-checked)':30s} {tot_d:8.2f} {tot_s:8.2f}")
