#!/usr/bin/env python3
"""Run-to-run determinism check: diff every query's parquet output across
two independent graft.Verify runs (catches reduction-order float leaks
that the DuckDB compare can miss when both runs land on the same side of
a rounding boundary).

Usage:
  sbt -batch "runMain graft.Verify <sfDir> /tmp/verify_a"
  sbt -batch "runMain graft.Verify <sfDir> /tmp/verify_b"
  python3 tools/determinism.py /tmp/verify_a /tmp/verify_b
"""
import sys, os, glob
import duckdb


def main():
    a, b = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    diffs = 0
    names = sorted(os.path.basename(d) for d in glob.glob(f'{a}/*')
                   if os.path.isdir(d))
    for n in names:
        try:
            r = con.execute(f"""
              SELECT count(*) FROM (
                (SELECT * FROM read_parquet('{a}/{n}/*.parquet')
                 EXCEPT SELECT * FROM read_parquet('{b}/{n}/*.parquet'))
                UNION ALL
                (SELECT * FROM read_parquet('{b}/{n}/*.parquet')
                 EXCEPT SELECT * FROM read_parquet('{a}/{n}/*.parquet')))
            """).fetchone()[0]
            if r:
                print(f'{n}: {r} differing rows')
                diffs += 1
        except Exception as e:
            print(f'{n}: compare error {e}')
            diffs += 1
    print(f'== {len(names)} queries, {diffs} with run-to-run differences ==')
    sys.exit(1 if diffs else 0)


if __name__ == '__main__':
    main()
