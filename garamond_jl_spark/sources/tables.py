"""Table IO abstraction (reference operators S1-S4).

The reference loads CSV via JuliaDB (S1, /root/reference/src/data/loaders/
juliadb.jl:1-3) and persists whole-environment caches to a file (S4,
src/searchable/env.jl:31-39).  Here, *tables are the cache*: index state
lives as Iceberg/parquet tables and "load" is just a table read.

This sandbox has no Iceberg jars, so ``read_table``/``write_table``
abstract the catalog: a name containing ``/`` (or ending ``.parquet``)
is a parquet path; otherwise it is resolved as ``spark.read.table`` —
i.e. an Iceberg/HMS catalog table in production.  All engine code goes
through these two functions, so pointing the engine at a real Iceberg
catalog is a config change, not a code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = ("region nation customer supplier part orders lineitem "
                   "events documents embeddings").split()


def is_path(name: str) -> bool:
    return "/" in name or name.endswith(".parquet")


def read_table(spark: SparkSession, name: str) -> DataFrame:
    if is_path(name):
        return spark.read.parquet(name)
    return spark.read.table(name)


def write_table(df: DataFrame, name: str, mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if is_path(name):
        w.parquet(name)
    else:
        w.saveAsTable(name)


def table_exists(spark: SparkSession, name: str,
                 allow_unmarked: bool = False) -> bool:
    """Path-based tables need a completion marker: _SUCCESS (batch
    writes) or _spark_metadata (streaming file sinks).  A directory
    with bare data files but NO marker is most likely a crashed
    mid-write — resume-style callers must not treat it as complete.
    ``allow_unmarked=True`` opts into bare-file detection for tables
    written with the success-marker disabled
    (mapreduce.fileoutputcommitter.marksuccessfuljobs=false)."""
    if is_path(name):
        if not os.path.isdir(name):
            return False
        entries = os.listdir(name)
        if any(e in ("_SUCCESS", "_spark_metadata") for e in entries):
            return True
        return allow_unmarked and any(not e.startswith(("_", "."))
                                      for e in entries)
    return spark.catalog.tableExists(name)


def load_testdata(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load one driver-provided testdata table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
