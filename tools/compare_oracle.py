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


_SPARK_CANON = {
    "bigint": "i64", "long": "i64", "int": "i32", "integer": "i32",
    "smallint": "i16", "tinyint": "i8", "double": "f64", "float": "f32",
    "string": "str", "boolean": "bool", "timestamp": "ts", "date": "date",
    "binary": "bin",
}
_DUCK_CANON = {
    "BIGINT": "i64", "INTEGER": "i32", "SMALLINT": "i16", "TINYINT": "i8",
    "HUGEINT": "i128", "UBIGINT": "u64", "DOUBLE": "f64", "FLOAT": "f32",
    "VARCHAR": "str", "BOOLEAN": "bool", "TIMESTAMP": "ts", "DATE": "date",
    "BLOB": "bin",
}


def _canon_types(pairs: list[tuple[str, str]], table: dict) -> dict:
    """Map (col, engine_type) pairs to canonical type names keyed by col.

    The driver's gate hashes *typed* values (Arrow), so a Spark int64
    column vs a DuckDB HUGEINT (e.g. bare ``sum(BIGINT)``) hash-mismatches
    even when the Python values are equal — repr() alone missed the
    round-1 groupby_agg/events_tumbling_window failures."""
    return {c: table.get(str(t), str(t)) for c, t in pairs}


def _canon_val(v):
    # PySpark collects BINARY as bytearray, DuckDB as bytes: equal
    # values must hash equally
    return bytes(v) if isinstance(v, bytearray) else v


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        tuple(repr(_canon_val(r[i])) for i in order) for r in rows
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
        stypes = _canon_types(sdf.dtypes, _SPARK_CANON)
        otypes = _canon_types(list(zip(res.columns, res.types)), _DUCK_CANON)
        type_diffs = {c: (stypes.get(c), otypes.get(c))
                      for c in set(stypes) | set(otypes)
                      if stypes.get(c) != otypes.get(c)}
        sh, oh = value_hash(srows, scols), value_hash(orows, ocols)
        ok_h = sh == oh
        status = "OK  " if (ok_n and ok_c and ok_h and not type_diffs) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status}  {name}: rows {len(srows)}/{len(orows)} "
              f"cols {scols}/{ocols} hash {sh}/{oh} [{time.time() - t0:.1f}s]")
        if type_diffs:
            print(f"      TYPE mismatch (spark vs duckdb): {type_diffs}")
        if status == "FAIL" and srows and orows:
            print(f"      spark sample: {sorted(srows, key=repr)[:3]}")
            print(f"      duck  sample: {sorted(orows, key=repr)[:3]}")
    spark.stop()
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
