"""Champion-list impact-ordered top-k (operators/impact.py): provable
rank identity with the exact plan, with and without certificate
failures (fallback path)."""

import pytest
from pyspark.sql import functions as F

from garamond_jl_spark.config import EngineConfig
from garamond_jl_spark.corpus import corpus_df, query_set
from garamond_jl_spark.operators.build import build_index
from garamond_jl_spark.operators.impact import champion_lists, impact_topk
from garamond_jl_spark.operators.query import embed_queries, topk_plan

K = 10


@pytest.fixture(scope="module")
def idx(spark):
    docs = corpus_df(spark, 2000, seed=42, partitions=8)
    ix = build_index(spark, docs, EngineConfig(), id_col=None)
    ix.postings.count()
    return ix


@pytest.fixture(scope="module")
def queries():
    return query_set(seed=7, n=24)


def _ranked(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"]))
    return {q: sorted(v) for q, v in out.items()}


def _assert_identical(got, expect):
    assert set(got) == set(expect)
    for q in expect:
        assert [t[:2] for t in got[q]] == [t[:2] for t in expect[q]], q
        for (_, _, sg), (_, _, se) in zip(got[q], expect[q]):
            assert abs(sg - se) < 1e-9


@pytest.mark.parametrize("p", [8, 256])
def test_impact_rank_identity(spark, idx, queries, p):
    """Small p forces certificate failures (fallback exercised); large p
    certifies most queries — both must be rank-identical to exact."""
    exact = _ranked(topk_plan(idx, embed_queries(spark, idx, queries), K))
    stats = {}
    got = _ranked(impact_topk(spark, idx, queries, k=K, p=p, stats=stats))
    _assert_identical(got, exact)
    assert len(stats["certified"]) + len(stats["fallback"]) == len(exact)
    if p == 256:
        assert len(stats["certified"]) > 0, stats
    if p == 8:
        # with an 8-doc prefix over a 2000-doc corpus at k=10 the bound
        # cannot certify (fewer champions than k per term)
        assert len(stats["fallback"]) > 0, stats


def test_champion_lists_bounded(spark, idx):
    p = 16
    ch = champion_lists(idx, p)
    over = ch.groupBy("term").count().where(F.col("count") > p).count()
    assert over == 0
    # prefix is impact-ordered: rank 1 carries the term max
    mx = (ch.where(F.col("imp_rank") == 1)
          .join(idx.postings.groupBy("term")
                .agg(F.max("wnorm").alias("m")), "term")
          .where(F.abs(F.col("wnorm") - F.col("m")) > 1e-12).count())
    assert mx == 0


def test_impact_certified_path_matches_with_rounding(spark, idx, queries):
    """tiebreak_round parity semantics: rounded-rank output identical."""
    exact = _ranked(topk_plan(idx, embed_queries(spark, idx, queries), K,
                              tiebreak_round=6))
    got = _ranked(impact_topk(spark, idx, queries, k=K, p=256,
                              tiebreak_round=6))
    _assert_identical(got, exact)


def test_search_plan_dispatch(spark, idx, queries):
    """search(plan=) returns identical (query_id, doc_id, rank) for
    exact and impact strategies."""
    from garamond_jl_spark.operators.query import search
    sub = queries[:6]
    exact = _ranked(search(spark, idx, sub, k=K, hydrate=False,
                           pad_to_k=False))
    impact = _ranked(search(spark, idx, sub, k=K, hydrate=False,
                            pad_to_k=False, plan="impact"))
    _assert_identical(impact, exact)
    with pytest.raises(ValueError):
        search(spark, idx, sub, plan="nope")


def test_partial_champions_table_falls_back(spark, idx, queries):
    """A caller-supplied champions table that entirely OMITS some of a
    query's terms must not certify: the missing term's posting mass is
    fully hidden (θ = +inf), so those queries take the exact fallback
    and the output stays rank-identical to topk_plan (regression: a
    missing term used to default to θ = 0 — 'fully covered' — and
    could silently certify a wrong top-k)."""
    qs = queries[:6]
    qterms = embed_queries(spark, idx, qs)
    terms = sorted({r["term"] for r in qterms.select("term").collect()})
    assert len(terms) >= 2
    # champions built over only half the query vocabulary
    partial = champion_lists(idx, p=256).where(
        F.col("term").isin(terms[: len(terms) // 2]))
    stats: dict = {}
    got = _ranked(impact_topk(spark, idx, qs, k=K, champions=partial,
                              stats=stats))
    exact = _ranked(topk_plan(idx, embed_queries(spark, idx, qs), K))
    _assert_identical(got, exact)
    # at least the queries touching an omitted term fell back
    assert len(stats["fallback"]) >= 1
