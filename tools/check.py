#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
scale factor, execute each oracle SQL in DuckDB over the same parquet
tables, and compare (rows sorted, columns sorted by name, exact values).

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify] [query ...]
"""
import sys, json, glob, os, subprocess
import duckdb, pandas as pd, numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    sfdir = args[0] if len(args) > 0 else '/root/testdata/sf0.01'
    outdir = args[1] if len(args) > 1 else '/tmp/verify_out'
    only = set(args[2:])
    if '--skip-verify' not in sys.argv:
        env = dict(os.environ)
        if only:
            env['SPARK_GRAFT_ONLY'] = ','.join(sorted(only))
        r = subprocess.run(['sbt', '-batch', f'runMain graft.Verify {sfdir} {outdir}'],
                           cwd='/root/repo', capture_output=True, text=True, env=env)
        sys.stdout.write('\n'.join(l for l in r.stdout.splitlines()
                                   if 'error' in l.lower() or 'failed' in l.lower()) + '\n')
        if r.returncode != 0:
            print('VERIFY RUN FAILED'); print(r.stdout[-3000:]); print(r.stderr[-2000:]); sys.exit(1)
    oracle = json.load(open(f'{outdir}/oracle_sql.json'))
    if only:
        unknown = only - set(oracle)
        if unknown:
            print(f'UNKNOWN QUERY FILTER(S): {sorted(unknown)}'); sys.exit(2)
    con = duckdb.connect()
    for t in TABLES:
        p = f'{sfdir}/{t}.parquet'
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only: continue
        spark_dir = f'{outdir}/{name}'
        files = glob.glob(f'{spark_dir}/*.parquet')
        if not files:
            print(f'{name:30s} NO SPARK OUTPUT'); n_bad += 1; continue
        try:
            sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            ddf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f'{name:30s} ERROR {str(e)[:160]}'); n_bad += 1; continue
        ok, msg = compare(sdf, ddf)
        print(f'{name:30s} {"OK" if ok else "MISMATCH: " + msg}')
        n_ok += ok; n_bad += not ok
    print(f'\n{n_ok} ok, {n_bad} bad')
    sys.exit(1 if n_bad else 0)

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)

def compare(sdf, ddf):
    if sorted(sdf.columns) != sorted(ddf.columns):
        return False, f'columns spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}'
    if len(sdf) != len(ddf):
        return False, f'rowcount spark={len(sdf)} duck={len(ddf)}'
    a, b = canon(sdf), canon(ddf)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            av = av.astype(np.float64); bv = bv.astype(np.float64)
            exact = (av == bv) | (np.isnan(av) & np.isnan(bv))
            if not exact.all():
                close = np.isclose(av, bv, rtol=1e-9, equal_nan=True).all()
                i = int(np.argmax(~exact))
                return False, (f'col {c}: {int((~exact).sum())}/{len(av)} differ '
                               f'(close={close}) e.g. {av[i]!r} vs {bv[i]!r}')
        else:
            if a[c].dtype != b[c].dtype and str(a[c].dtype) != str(b[c].dtype):
                pass  # dtype drift reported only if values differ
            eq = (a[c].astype(str).values == b[c].astype(str).values)
            if not eq.all():
                i = int(np.argmax(~eq))
                return False, (f'col {c}: {int((~eq).sum())}/{len(eq)} differ '
                               f'e.g. {a[c].values[i]!r} vs {b[c].values[i]!r}')
    # also surface dtype mismatches that exact string compare hides
    dt = [(c, str(sdf[c].dtype), str(ddf[c].dtype)) for c in sorted(sdf.columns)
          if str(sdf[c].dtype) != str(ddf[c].dtype)]
    if dt:
        return True, f'(dtype drift: {dt})'
    return True, ''

if __name__ == '__main__':
    main()
