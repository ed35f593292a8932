#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only, not part of
the engine): run after `sbt "runMain graft.Verify <sfDir> <outDir>"`.

For each query: load Spark's parquet from <outDir>/<name>, run the oracle SQL
from oracle_sql.json in DuckDB against the raw tables in <sfDir>, sort columns
by name / rows by all columns, and compare row count, schema shape, and
values (doubles to 1e-9 rel tolerance for reporting; exact hash equality is
what the real driver uses, so any 'approx' diff is still a finding).
"""
import json, sys, glob, os
import duckdb

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in glob.glob(os.path.join(sfdir, "*.parquet")):
        name = os.path.basename(t)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    failures = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = os.path.join(outdir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir"); failures += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM '{spark_dir}/*.parquet'").fetchdf()
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); failures += 1; continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); failures += 1; continue
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        mismatch = None
        for c in gs.columns:
            a, b = gs[c], es[c]
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                import math
                for i, (x, y) in enumerate(zip(a, b)):
                    xnan = x is None or (isinstance(x, float) and math.isnan(x))
                    ynan = y is None or (isinstance(y, float) and math.isnan(y))
                    if xnan and ynan: continue
                    if xnan != ynan or x != y:
                        mismatch = (c, i, x, y); break
            else:
                neq = a.astype(str) != b.astype(str)
                if neq.any():
                    i = int(neq.idxmax()); mismatch = (c, i, a[i], b[i])
            if mismatch: break
        dtypes_g = [str(d) for d in gs.dtypes]; dtypes_e = [str(d) for d in es.dtypes]
        if dtypes_g != dtypes_e:
            print(f"WARN {name}: dtypes {dtypes_g} vs {dtypes_e}")
        if mismatch:
            c, i, x, y = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={x!r} oracle={y!r}")
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
