#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark result), runs the matching SQL from
<outDir>/oracle_sql.json in DuckDB against the sfDir parquet tables, sorts
columns by name and rows by all columns, and diffs values. NOT the driver's
exact code — a conservative emulation (exact equality after dtype
normalization; reports near-miss float diffs separately)."""
import sys, os, glob, json
import duckdb
import pandas as pd
import numpy as np

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        k = df[c].dtype.kind
        if k in 'iu':
            df[c] = df[c].astype('int64')
        elif k == 'f':
            df[c] = df[c].astype('float64')
        elif k == 'M':
            df[c] = pd.to_datetime(df[c])
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f'{sfdir}/*.parquet'):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f'{outdir}/oracle_sql.json'))
    n_ok = n_fail = 0
    for name in sorted(oracle):
        res_dir = f'{outdir}/{name}'
        if not os.path.isdir(res_dir):
            print(f'{name}: MISSING spark result'); n_fail += 1; continue
        try:
            a = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchdf()
        except Exception as e:
            print(f'{name}: SPARK READ FAIL {e}'); n_fail += 1; continue
        try:
            b = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f'{name}: ORACLE FAIL {type(e).__name__}: {e}'); n_fail += 1; continue
        if sorted(a.columns) != sorted(b.columns):
            print(f'{name}: COLS {sorted(a.columns)} vs {sorted(b.columns)}')
            n_fail += 1; continue
        ra, rb = norm(a), norm(b)
        if len(ra) != len(rb):
            print(f'{name}: ROWS {len(ra)} vs {len(rb)}'); n_fail += 1; continue
        bad = []
        for c in ra.columns:
            va, vb = ra[c], rb[c]
            if va.dtype.kind == 'f':
                eq = (va == vb) | (va.isna() & vb.isna()) | np.isclose(va, vb, rtol=0, atol=0)
            else:
                eq = (va == vb) | (va.isna() & vb.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                bad.append(f'{c}[{i}]: {va[i]!r} vs {vb[i]!r} ({int((~eq).sum())} diffs)')
        # also flag raw dtype mismatches (driver may be stricter)
        dt = [f'{c}: {a[c].dtype} vs {b[c].dtype}'
              for c in sorted(a.columns) if str(a[sorted(a.columns)][c].dtype) != str(b[sorted(b.columns)][c].dtype)]
        if bad:
            print(f'{name}: VALUES DIFF ' + '; '.join(bad[:3])); n_fail += 1
        else:
            extra = f'  [dtype warn: {", ".join(dt)}]' if dt else ''
            print(f'{name}: OK rows={len(ra)}{extra}'); n_ok += 1
    print(f'== {n_ok} ok, {n_fail} fail ==')
    sys.exit(1 if n_fail else 0)

if __name__ == '__main__':
    main()
