#!/usr/bin/env python3
"""Determinism-at-two-parallelism-levels check (north rule: the same jar at
N and 4N executors must produce identical rows).

Usage:
  SPARK_GRAFT_CPUS=4  sbt -batch "runMain graft.Verify <sfDir> /tmp/det4"
  SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify <sfDir> /tmp/det32"
  python3 tools/detcheck.py /tmp/det4 /tmp/det32

Hashes every query's parquet output (rows sorted by every column, all
columns stringified) and reports per-query equality across the two runs.
"""
import hashlib
import os
import sys

import duckdb


def table_hash(con, path: str) -> str:
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{path}/*.parquet'").fetchall()]
    order = ", ".join(f'"{c}"' for c in cols)
    rows = con.execute(
        f"SELECT * FROM '{path}/*.parquet' ORDER BY {order}").fetchall()
    h = hashlib.md5()
    for row in rows:
        h.update(repr(row).encode())
    return f"{h.hexdigest()}:{len(rows)}"


def main(a_dir: str, b_dir: str) -> int:
    con = duckdb.connect()
    names = sorted(d for d in os.listdir(a_dir)
                   if os.path.isdir(os.path.join(a_dir, d)))
    bad = 0
    for name in names:
        if not os.path.isdir(os.path.join(b_dir, name)):
            print(f"MISS {name}: absent in {b_dir}")
            bad += 1
            continue
        ha = table_hash(con, os.path.join(a_dir, name))
        hb = table_hash(con, os.path.join(b_dir, name))
        if ha == hb:
            print(f"OK   {name}: {ha.split(':')[1]} rows identical")
        else:
            print(f"FAIL {name}: {ha} != {hb}")
            bad += 1
    print(f"\n{'ALL IDENTICAL' if bad == 0 else str(bad) + ' DIFFER'} "
          f"across {len(names)} queries")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
