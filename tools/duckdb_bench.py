#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB at a given SF, for comparison with
graft.Bench output, and MERGE the result into the bench artifact so
one committed file proves the ratio. Usage:
  python3 tools/duckdb_bench.py /root/testdata/sf0.1 /tmp/verify_out_01/oracle_sql.json [BENCH.json]

With the third argument, a {"metric":"duckdb_total",...} line is
appended to the artifact (replacing any previous duckdb_total line):
total + per-query DuckDB seconds, the Spark total it paired against,
the ratio, and the loadavg at merge time — the self-contained record
the round protocol commits (PERF.md cites only this file).
"""
import duckdb, json, os, sys, time
sf, oracle_path = sys.argv[1], sys.argv[2]
# take the FINAL attempt's compact total line by its metric name —
# retry-to-clean (round 18) may add discarded_attempt_N lines, and a
# first-line read would pair against a thrown-away contaminated run
def _total_line(path):
    for l in open(path):
        if l.strip() and json.loads(l).get("metric") == "total":
            return json.loads(l)
    raise SystemExit(f"no metric=total line in {path}")
bench = _total_line(sys.argv[3]) if len(sys.argv) > 3 else None
# Same before-load gate the Spark side applies (Bench.loadContaminated):
# a "clean" pairing label must hold on BOTH legs — the r15 committed
# artifact's Spark side self-labeled clean while the DuckDB leg ran at
# loadavg 6.85 right after the Spark samples on a hot box.
load_before = [round(v, 2) for v in os.getloadavg()]
cpus = os.cpu_count() or 1
before_threshold = max(1.0, min(2.0, cpus / 4.0))
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
if len(sys.argv) > 3:
    kept = [l for l in open(sys.argv[3]).read().splitlines()
            if l.strip() and json.loads(l).get("metric") != "duckdb_total"]
    duck_contaminated = load_before[0] > before_threshold
    # pairing-level flag ORs both legs: the Spark run's own label
    # (from the compact total line) and this leg's before-load gate
    spark_contaminated = bool(bench.get("load_contaminated", False))
    line = json.dumps({
        "metric": "duckdb_total", "value": round(tot_d, 6), "unit": "sec",
        "sf": sf, "spark_total": round(tot_s, 6),
        "ratio": round(tot_s / tot_d, 4) if tot_d > 0 else None,
        "loadavg_before": load_before,
        "loadavg": [round(v, 2) for v in os.getloadavg()],
        "duckdb_load_contaminated": duck_contaminated,
        "spark_load_contaminated": spark_contaminated,
        "pairing_load_contaminated": duck_contaminated or spark_contaminated,
        "queries": {n: round(d, 6) for n, d, _ in rows}},
        separators=(",", ":"))
    # temp + atomic replace: a crash mid-write must not destroy the
    # bench run's total/detail lines (same convention as the engine's
    # own at-rest writers)
    tmp = sys.argv[3] + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(kept + [line]) + "\n")
    os.replace(tmp, sys.argv[3])
    print(f"merged duckdb_total into {sys.argv[3]} "
          f"(ratio spark/duckdb = {tot_s/tot_d:.2f}x, pairing_load_"
          f"contaminated={duck_contaminated or spark_contaminated})")
