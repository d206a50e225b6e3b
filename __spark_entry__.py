"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-k over sf0.001 documents.
``queries()`` / ``oracle_sql()`` — operator registry with DuckDB-parity
oracles, assembled from:

* garamond_jl_spark.plans.testdata_queries  (full-text core, filters,
  joins, aggregations, sorts/top-k, scalar fns — SURVEY.md §2)
* garamond_jl_spark.plans.pipeline_queries  (training-data pipeline ops:
  dedup family, similarity search, text analysis)

Column-naming rule: every computed column is aliased identically in the
Spark program and the SQL so the driver's sorted-column value hash
matches; float measures leave as round(x·1e6) BIGINT.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: batched BM25 top-k with
    hydrated metadata (SURVEY.md §3.1 plan)."""
    from garamond_jl_spark.operators.query import search
    from garamond_jl_spark.plans.testdata_queries import FT_CFG, _ft_index

    idx = _ft_index(spark, "/root/testdata/sf0.001")
    return search(spark, idx, ["spark join data", "window batch merge"],
                  k=10, hydrate=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from garamond_jl_spark.plans import pipeline_queries, testdata_queries
    out: dict[str, Callable] = {}
    out.update(testdata_queries.QUERIES)
    out.update(pipeline_queries.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    from garamond_jl_spark.plans import pipeline_queries, testdata_queries
    out: dict[str, str] = {}
    out.update(testdata_queries.ORACLES)
    out.update(pipeline_queries.ORACLES)
    return out
