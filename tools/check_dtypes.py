"""Pandas-dtype parity gate: oracle vs Spark through the PANDAS lens.

`tools/check_oracle.py` fetches DuckDB results as native Python values
(HUGEINT -> int), so it CANNOT see the coercion a pandas-based
canonicalizer applies — and the driver's correctness gate is
pandas-shaped (module docstring of queries.py, round-2 simhash
incident). The round-11/12 corpus-row reds were exactly this class:
`SUM(CAST(... AS BIGINT))` returns HUGEINT, pandas coerces it to
float64, while the Spark side arrives as non-null int64 — value-equal,
dtype-different, hash-different under a str-cell canon. Rows where the
Spark side is NULLABLE coerce to float64 on BOTH sides and stay green,
which is why only the corpus rows ever reddened.

This tool compares, for every registered oracle, the pandas dtype of
the DuckDB result against the pandas dtype of the Spark result
(`toPandas()`), column by column, at sf0.001. Any mismatch is a
driver-gate hash risk even when the value hash matches locally.

Usage: python tools/check_dtypes.py [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from data_frame_spark.session import get_spark, TPCH_TABLES
from data_frame_spark import queries as Q

SF_DIR = os.environ.get("SPARK_GRAFT_DTYPE_SF_DIR", "/root/testdata/sf0.001")


def main(names):
    spark = get_spark("dtype-check")
    con = duckdb.connect()
    for tname in TPCH_TABLES:
        p = os.path.join(SF_DIR, f"{tname}.parquet")
        if os.path.exists(p):
            # driver testdata ships single parquet FILES; Spark-written
            # scale-up fixtures (.scratch/sf1) are DIRECTORIES of part
            # files — DuckDB needs the glob form for those
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{src}'")

    targets = names or [n for n in Q.QUERIES if n in Q.ORACLE]
    bad = 0
    for name in targets:
        try:
            spdf = Q.QUERIES[name](spark, SF_DIR).toPandas()
            odf = con.execute(Q.ORACLE[name]).df()
        except Exception as e:  # pragma: no cover - report and continue
            print(f"  {name}: ERR {type(e).__name__}: {str(e)[:120]}")
            bad += 1
            continue
        # compare dtype KINDS, not widths: int32-vs-int64 and
        # datetime64[ns]-vs-[us] render identically under a str-cell
        # canon (and appear on historically driver-green rows); the
        # hash-killer is a KIND flip — an integral column arriving as
        # float64 on one side renders '123.0' against '123'
        sdt = {c: (d.kind, str(d)) for c, d in spdf.dtypes.items()}
        odt = {c: (d.kind, str(d)) for c, d in odf.dtypes.items()}

        def kind(v):
            return {"u": "i"}.get(v[0], v[0]) if v else None

        mism = [
            (c, sdt.get(c) and sdt[c][1], odt.get(c) and odt[c][1])
            for c in sorted(set(sdt) | set(odt))
            if kind(sdt.get(c)) != kind(odt.get(c))
        ]
        if mism:
            bad += 1
            print(f"  {name}: DTYPE MISMATCH {mism}")
        else:
            print(f"  {name}: ok")
    if bad:
        print(f"\n{bad} queries with pandas-dtype mismatches")
        return 1
    print(f"\nall {len(targets)} queries dtype-clean through pandas")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
