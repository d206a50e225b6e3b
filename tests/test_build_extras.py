"""P1 embeddable-field projection + sampler hook coverage."""

import pytest
from pyspark.sql import functions as F

from garamond_jl_spark.config import EngineConfig
from garamond_jl_spark.operators.build import build_index, project_embeddable


def test_project_embeddable_concat_and_missing(spark):
    df = spark.createDataFrame(
        [(1, "alpha", 7), (2, None, 9)], "doc_id LONG, a STRING, b LONG")
    out = project_embeddable(df, ["a", "b", "nope"], "content") \
        .select("doc_id", "content").collect()
    got = {r["doc_id"]: r["content"] for r in out}
    # stringify + space-concat; NULL and missing column → empty string
    assert got[1] == "alpha 7"
    assert got[2] == "9"  # concat_ws skips only NULL; coalesce makes ''


def test_build_with_embeddable_fields(spark):
    df = spark.createDataFrame(
        [(0, "spark join", "fast"), (1, "window", "slow batch")],
        "doc_id LONG, title STRING, body STRING")
    idx = build_index(spark, df, EngineConfig(), id_col="doc_id",
                      embeddable_fields=["title", "body"],
                      tokenizer=lambda s: s.split())
    terms = {r["term"] for r in idx.terms.collect()}
    assert {"spark", "join", "fast", "window", "slow", "batch"} <= terms
    doclens = {r["doc_id"]: r["doclen"] for r in
               idx.postings.select("doc_id", "doclen").distinct().collect()}
    assert doclens == {0: 3, 1: 3}
