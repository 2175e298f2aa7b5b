import duckdb, json, glob, sys
import pyarrow.parquet as pq
import pandas as pd
sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f'oracle error: {e}')); continue
    files = glob.glob(f'{out}/{name}/*.parquet')
    if not files:
        fails.append((name, 'no spark output')); continue
    got = pd.concat([pq.read_table(f).to_pandas() for f in files])
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    got = got[sorted(got.columns)].reset_index(drop=True)
    if list(exp.columns) != list(got.columns):
        fails.append((name, f'cols: oracle={list(exp.columns)} spark={list(got.columns)}')); continue
    if len(exp) != len(got):
        fails.append((name, f'rows: oracle={len(exp)} spark={len(got)}')); continue
    # normalize dtypes for compare
    for c in exp.columns:
        e, g = exp[c], got[c]
        if str(e.dtype).startswith('datetime') or str(g.dtype).startswith('datetime'):
            e = pd.to_datetime(e).astype('datetime64[ns]'); g = pd.to_datetime(g).astype('datetime64[ns]')
        # the driver hashes values WITH their dtype: a DuckDB HUGEINT
        # (pandas float64, e.g. raw integer SUM) vs a Spark BIGINT
        # hashes "3.0" vs "3" -> mismatch even when == passes. Fail
        # locally on int-vs-float dtype splits so the gate matches.
        ek, gk = e.dtype.kind, g.dtype.kind
        if {ek, gk} == {'i', 'f'} or {ek, gk} == {'u', 'f'}:
            fails.append((name, f'col {c} dtype split: oracle={e.dtype} spark={g.dtype} (driver hash would mismatch; CAST the oracle column)'))
            break
        try:
            eq = (e.isna() & g.isna()) | (e == g)
        except Exception:
            eq = e.astype(str) == g.astype(str)
        if not eq.all():
            idx = (~eq).idxmax()
            fails.append((name, f'col {c} differs at row {idx}: oracle={e[idx]!r} spark={g[idx]!r}'))
            break
print(f'{len(oracle)-len(fails)}/{len(oracle)} match')
for n, m in fails: print('FAIL', n, m)
