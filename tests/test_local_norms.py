"""weighted_postings_local ≡ the classic window plan.

The shuffle-free weighting path (operators/build.py
weighted_postings_local) must produce the same (term, doc_id) → (w,
norm, wnorm) mapping as the two-shuffle plan, including when a
document's postings straddle a partition boundary (the parquet
re-read case the edge-repair side job exists for).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from garamond_jl_spark.config import EngineConfig
from garamond_jl_spark.operators.build import (POSTINGS_SCHEMA, build_index,
                                               term_stats,
                                               tokenize_to_postings,
                                               weighted_postings,
                                               weighted_postings_local)

DOCS = [
    (0, "spark shuffle join window aggregate spark"),
    (1, "broadcast join skew salt"),
    (2, "window window window rank"),
    (3, "tokenize arrow batch spark broadcast"),
    (4, "varbyte delta block max wand"),
    (5, "singleton"),
]


def _all_paths(spark, postings, cfg):
    """classic window plan + every shuffle-light strategy."""
    n_docs = postings.select("doc_id").distinct().count()
    total = postings.agg(F.sum("tf")).collect()[0][0]
    avgdl = total / n_docs
    terms = term_stats(postings, n_docs, cfg).persist()
    classic = weighted_postings(postings, terms, avgdl, cfg)
    variants = {
        "bidf_window": weighted_postings(postings, terms, avgdl, cfg,
                                         broadcast_idf=True,
                                         norms="window"),
        "broadcast": weighted_postings(postings, terms, avgdl, cfg,
                                       broadcast_idf=True,
                                       norms="broadcast"),
        "arrow": weighted_postings_local(postings, terms, avgdl, cfg),
    }
    return classic, variants


def _as_map(df):
    return {(r["term"], r["doc_id"]):
            (r["w"], r["norm"], r["wnorm"], r["tf"], r["doclen"], r["idf"])
            for r in df.collect()}


def _assert_identical(classic, local):
    a, b = _as_map(classic), _as_map(local)
    assert a.keys() == b.keys()
    for k, va in a.items():
        vb = b[k]
        for x, y in zip(va, vb):
            assert x == pytest.approx(y, abs=1e-12), (k, va, vb)


def test_all_norm_strategies_match_window_on_tokenize_output(spark):
    cfg = EngineConfig()
    docs = spark.createDataFrame(DOCS, "doc_id LONG, content STRING") \
        .repartition(3)
    postings = tokenize_to_postings(docs, cfg,
                                    tokenizer=lambda s: s.split()).persist()
    classic, variants = _all_paths(spark, postings, cfg)
    for name, df in variants.items():
        _assert_identical(classic, df)


def test_local_norms_repair_doc_straddling_partition_edge(spark):
    """doc 1's run is split across two partitions (union concatenates
    partition lists); interior runs stay contiguous.  The edge-repair
    side job must restore doc 1's exact global norm."""
    cfg = EngineConfig()
    part1 = [("alpha", 0, 2, 5), ("beta", 0, 3, 5),
             ("gamma", 1, 1, 4)]               # doc 1: first half
    part2 = [("delta", 1, 3, 4),               # doc 1: second half
             ("alpha", 2, 1, 1)]
    # RDD-backed single-partition frames: Catalyst would merge two
    # createDataFrame LocalRelations into ONE partition, defeating the
    # straddle setup
    p1 = spark.createDataFrame(
        spark.sparkContext.parallelize(part1, 1), POSTINGS_SCHEMA)
    p2 = spark.createDataFrame(
        spark.sparkContext.parallelize(part2, 1), POSTINGS_SCHEMA)
    postings = p1.union(p2)
    assert postings.rdd.getNumPartitions() == 2
    classic, variants = _all_paths(spark, postings, cfg)
    _assert_identical(classic, variants["arrow"])


def test_build_index_uses_local_norms_and_stores_n_terms(spark):
    docs = spark.createDataFrame(DOCS, "doc_id LONG, content STRING")
    idx = build_index(spark, docs, EngineConfig(),
                      tokenizer=lambda s: s.split())
    assert idx.meta["n_terms"] == idx.terms.count()
    # wnorm is L2-normalized per doc: Σ wnorm² = 1 for every doc
    sums = (idx.postings.groupBy("doc_id")
            .agg(F.sum(F.col("wnorm") * F.col("wnorm")).alias("s"))
            .collect())
    for r in sums:
        assert r["s"] == pytest.approx(1.0, abs=1e-9)


def test_build_default_norm_plan_is_window(spark):
    """Regression pin for the round-4 default flip (BENCH.md
    "Full-build A/B overturns the broadcast-norms default"): the
    broadcast tier double-evaluates the probe lineage (norm agg +
    join-back each re-run scan → idf join → weight projection), so the
    build default must stay on the single-shuffle window plan.  The
    window's signature in the optimized plan is a Window operator over
    doc_id; the broadcast tier instead shows an Aggregate joined back
    on doc_id and no Window."""
    docs = spark.createDataFrame(DOCS, "doc_id LONG, content STRING")
    idx = build_index(spark, docs, EngineConfig(),
                      tokenizer=lambda s: s.split())
    plan = idx.postings._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" in plan, "build default regressed off the window norm plan"
