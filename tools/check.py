#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
scale factor, execute each oracle SQL in DuckDB over the same parquet
tables, and compare (rows sorted, columns sorted by name, exact values).

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify] [query ...]
"""
import sys, json, glob, os, subprocess
from concurrent.futures import ThreadPoolExecutor
import duckdb, pandas as pd, numpy as np

# 8 concurrent compares x 32 DuckDB worker threads x one fd per parquet
# scan reference blows the 20k nofile limit on the unrolled
# recursive-CTE oracles (observed: EMFILE on tokenizer_bakeoff at both
# SFs). The hard limit is 20k and this container lacks
# CAP_SYS_RESOURCE, so raising it is not an option; instead bump soft
# to hard AND cap DuckDB's GLOBAL worker pool (threads is per-database,
# shared by every cursor) so concurrent compares can't multiply scan
# threads.
try:
    import resource
    soft, hard = resource.getrlimit(resource.RLIMIT_NOFILE)
    resource.setrlimit(resource.RLIMIT_NOFILE, (hard, hard))
except Exception:
    pass

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
    con.execute(f"SET threads TO {os.environ.get('DUCKDB_THREADS', '16')}")
    # Materialize tables into DuckDB memory rather than views over
    # parquet: the unrolled recursive-CTE oracles reference the same
    # table hundreds of times, and every parquet scan holds a file
    # descriptor — views exhausted the (unraisable) 20k nofile limit on
    # the tokenizer oracles at both SFs. Native tables scan memory, and
    # are faster besides. Gate SFs are MB-scale, so memory is a non-issue.
    for t in TABLES:
        p = f'{sfdir}/{t}.parquet'
        if os.path.exists(p):
            con.execute(f"CREATE TABLE {t} AS SELECT * FROM '{p}'")
    names = [n for n in sorted(oracle) if not only or n in only]

    # Compares run on a thread pool: DuckDB releases the GIL during query
    # execution (per-task cursors on the shared connection are the
    # documented concurrency model), and the pandas/numpy compare is
    # GIL-free in its hot loops too. The unrolled recursive-CTE oracles
    # dominate the serial compare wall; overlapping them cuts it ~4x.
    def check_one(name):
        spark_dir = f'{outdir}/{name}'
        files = glob.glob(f'{spark_dir}/*.parquet')
        if not files:
            return name, False, 'NO SPARK OUTPUT'
        try:
            sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            ddf = con.cursor().execute(oracle[name]).fetchdf()
        except Exception as e:
            return name, False, f'ERROR {str(e)[:160]}'
        ok, msg = compare(sdf, ddf)
        return name, ok, ('OK' + (' ' + msg if msg else '')) if ok else 'MISMATCH: ' + msg

    n_ok = n_bad = 0
    with ThreadPoolExecutor(max_workers=int(os.environ.get('CHECK_THREADS', '8'))) as ex:
        for name, ok, msg in ex.map(check_one, names):
            print(f'{name:30s} {msg}', flush=True)
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
