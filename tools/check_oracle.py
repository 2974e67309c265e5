"""Local stand-in for the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle SQL at
sf0.01, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, values
canonicalized, rows sorted). Usage:

    python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from data_frame_spark.session import get_spark, load_tables, TPCH_TABLES
from data_frame_spark import queries as Q

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def canon(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main(names):
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    # optional memory cap with disk spill for the heaviest twins
    # (the banded-LSH replays can exceed RAM at the sf1 scale-up;
    # capped + spilling they finish instead of OOM-ing the box)
    mem = os.environ.get("SPARK_GRAFT_DUCKDB_MEM")
    if mem:
        tmp = os.environ.get("SPARK_GRAFT_DUCKDB_TMP", "/tmp/duckdb_spill")
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET memory_limit='{mem}'")
        con.execute(f"SET temp_directory='{tmp}'")
    for tname in TPCH_TABLES:
        p = os.path.join(SF_DIR, f"{tname}.parquet")
        if os.path.exists(p):
            # driver testdata ships single parquet FILES; Spark-written
            # scale-up fixtures (.scratch/sf1) are DIRECTORIES of part
            # files — DuckDB needs the glob form for those
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{src}'")

    targets = names or list(Q.QUERIES)
    failures = []
    for name in targets:
        fn = Q.QUERIES[name]
        t0 = time.time()
        sdf = fn(spark, SF_DIR)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        dt = time.time() - t0
        if name not in Q.ORACLE:
            print(f"  {name}: rows={len(srows)} (no oracle, rows-only) [{dt:.1f}s]")
            if len(srows) == 0:
                failures.append((name, "0 rows"))
            continue
        ores = con.execute(Q.ORACLE[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        if not problems:
            sh, oh = table_hash(scols, srows), table_hash(ocols, orows)
            if sh != oh:
                problems.append("value-hash mismatch")
                # show a diff sample
                sset = {tuple(canon(v) for v in r) for r in srows}
                oset = {tuple(canon(v) for v in r) for r in orows}
                so = sorted(sset - oset)[:2]
                os_ = sorted(oset - sset)[:2]
                if so:
                    problems.append(f"spark-only: {so}")
                if os_:
                    problems.append(f"oracle-only: {os_}")
        if problems:
            failures.append((name, "; ".join(str(p) for p in problems)))
            print(f"  {name}: FAIL — {'; '.join(str(p) for p in problems)}")
        else:
            print(f"  {name}: OK rows={len(srows)} [{dt:.1f}s]")

    print()
    if failures:
        print(f"{len(failures)}/{len(targets)} FAILED")
        for n, p in failures:
            print(f"  {n}: {p}")
        sys.exit(1)
    print(f"all {len(targets)} queries match the oracle")


if __name__ == "__main__":
    main(sys.argv[1:])
