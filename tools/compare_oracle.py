"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same sf dir, compares row count + sorted-column value
hash (order-insensitive), prints one line per query.

Usage: python tools/compare_oracle.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from garamond_jl_spark.session import get_spark  # noqa: E402
from garamond_jl_spark.sources.tables import TESTDATA_TABLES  # noqa: E402


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        tuple(repr(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for row in canon:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]
    spark = get_spark("oracle-compare", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time() - t0:.1f}s]")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = res.columns
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures += 1
            continue
        ok_n = len(srows) == len(orows)
        ok_c = sorted(scols) == sorted(ocols)
        sh, oh = value_hash(srows, scols), value_hash(orows, ocols)
        ok_h = sh == oh
        status = "OK  " if (ok_n and ok_c and ok_h) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status}  {name}: rows {len(srows)}/{len(orows)} "
              f"cols {scols}/{ocols} hash {sh}/{oh} [{time.time() - t0:.1f}s]")
        if status == "FAIL" and srows and orows:
            print(f"      spark sample: {sorted(srows)[:3]}")
            print(f"      duck  sample: {sorted(orows)[:3]}")
    spark.stop()
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
