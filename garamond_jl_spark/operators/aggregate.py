"""Multi-searcher result aggregation (reference A6) and suggestion
squash (A8/F10).

Reference: /root/reference/src/search/results.jl:54-145 — per-doc score
matrix over searchers, weighted by ``score_weight · custom_weight``,
reduced by one of {mean, min, max, median, product}; zero-score docs
dropped; re-sorted descending; trimmed to max_matches.  Default strategy
:mean (src/config/defaults.jl:29).

Spark mapping: union of per-index hit DataFrames → groupBy(doc_id) with
the strategy's aggregate.  Median uses exact ``percentile`` (hit sets
are k-bounded); product uses sign-aware exp(sum(log|x|)) — scores here
are positive so the simple form suffices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STRATEGIES = ("mean", "min", "max", "median", "product")


def aggregate_results(hit_sets: list[tuple[DataFrame, float]],
                      strategy: str = "mean", max_matches: int = 1000,
                      custom_weights: dict[int, float] | None = None,
                      ranked: bool = True) -> DataFrame:
    """hit_sets: [(hits(query_id?, doc_id, score), score_weight)] — one
    per searcher sharing an id_aggregation (results.jl:54-66).
    Returns (doc_id, score, rank); with ``ranked=False`` returns the
    unranked (doc_id, score) aggregate after the zero-score drop, so a
    caller can merge in dense-knn fill rows before its own top-k (the
    lifecycle sparse path)."""
    if strategy not in STRATEGIES:
        strategy = "mean"
    custom_weights = custom_weights or {}
    parts = []
    for i, (hits, weight) in enumerate(hit_sets):
        w = weight * custom_weights.get(i, 1.0)
        parts.append(hits.select(
            "doc_id", (F.col("score") * F.lit(w)).alias("wscore")))
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    g = unioned.groupBy("doc_id")
    if strategy == "mean":
        agg = g.agg(F.avg("wscore").alias("score"))
    elif strategy == "min":
        agg = g.agg(F.min("wscore").alias("score"))
    elif strategy == "max":
        agg = g.agg(F.max("wscore").alias("score"))
    elif strategy == "median":
        agg = g.agg(F.expr("percentile(wscore, 0.5)").alias("score"))
    else:  # product (scores > 0 in the reference transform's range)
        agg = g.agg(F.exp(F.sum(F.log("wscore"))).alias("score"))
    dropped = agg.where(F.col("score") > 0)       # zero-score drop
    if not ranked:
        return dropped.select("doc_id", "score")
    # distributed top-k (TakeOrdered) before the ≤max_matches ranking
    # window — keeps the global sort off a single partition
    trimmed = (dropped
               .orderBy(F.col("score").desc(), F.col("doc_id").asc())
               .limit(max_matches))               # trim (results.jl:137-144)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (trimmed.withColumn("rank", F.row_number().over(w))
            .select("doc_id", "score", "rank"))
