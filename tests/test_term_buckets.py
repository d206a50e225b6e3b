"""Term-bucket-partitioned postings: pruned scans, identical results.

build_persistent(term_buckets=N) partitions the postings parquet by
_tb = pmod(xxhash64(term), N); operators/query.pruned_postings then
restricts query scans to the buckets holding the batch's terms.
"""

from __future__ import annotations

import contextlib
import io

from garamond_jl_spark.config import EngineConfig
from garamond_jl_spark.corpus import corpus_df
from garamond_jl_spark.operators.build import assign_dense_ids
from garamond_jl_spark.operators.persist import build_persistent, load_index
from garamond_jl_spark.operators.query import (embed_queries,
                                               pruned_postings, search)

QUERIES = ["main run", "free_4 decode_7", "parse_0 parse_1 emit_2"]


def _rows(df):
    return sorted((r["query_id"], r["doc_id"], round(r["score"], 9),
                   r["rank"]) for r in df.collect())


def test_bucketed_index_matches_flat_and_prunes(spark, tmp_path):
    cfg = EngineConfig()
    docs = assign_dense_ids(corpus_df(spark, 400, seed=7, partitions=4),
                            ["repo", "path", "commit"]).persist()
    out_b, out_u = str(tmp_path / "idx_b"), str(tmp_path / "idx_u")
    build_persistent(spark, docs, cfg, out_b, n_buckets=2,
                     champion_p=64, term_buckets=8)
    build_persistent(spark, docs, cfg, out_u, n_buckets=2, champion_p=64)
    ib, iu = load_index(spark, out_b), load_index(spark, out_u)
    assert "_tb" in ib.postings.columns
    assert ib.meta["term_buckets"] == 8

    for plan in ("exact", "impact"):
        rb = search(spark, ib, QUERIES, k=5, hydrate=False, plan=plan)
        ru = search(spark, iu, QUERIES, k=5, hydrate=False, plan=plan)
        assert _rows(rb) == _rows(ru), plan

    # the pruned scan carries a partition filter on _tb
    qt = embed_queries(spark, ib, QUERIES)
    pruned = pruned_postings(ib, qt)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain(mode="formatted")
    plan_str = buf.getvalue()
    assert "PartitionFilters" in plan_str
    assert "_tb" in plan_str
    # and it is a real restriction: fewer buckets than the full table
    n_pruned = pruned.select("_tb").distinct().count()
    assert 0 < n_pruned < 8


def test_bucketed_layout_survives_append_and_compact(spark, tmp_path):
    """Delta segments carry _tb (pruning keeps working on the live
    union) and compact's fold re-establishes the partitioned layout."""
    import glob
    import os

    from garamond_jl_spark.streaming.incremental import (append_docs,
                                                         compact,
                                                         load_live_index)

    cfg = EngineConfig()
    docs = assign_dense_ids(corpus_df(spark, 300, seed=11, partitions=4),
                            ["repo", "path", "commit"]).persist()
    base, extra = docs.where("doc_id < 250"), docs.where("doc_id >= 250")
    out_b, out_u = str(tmp_path / "live_b"), str(tmp_path / "live_u")
    build_persistent(spark, base, cfg, out_b, n_buckets=2, champion_p=0,
                     term_buckets=8)
    build_persistent(spark, base, cfg, out_u, n_buckets=2, champion_p=0)
    for out in (out_b, out_u):
        append_docs(spark, out, extra)

    # the delta segment itself is _tb-partitioned
    delta_parts = glob.glob(os.path.join(out_b, "delta", "*", "postings",
                                         "_tb=*"))
    assert delta_parts, "bucketed delta should carry _tb partition dirs"

    lb, lu = load_live_index(spark, out_b), load_live_index(spark, out_u)
    assert "_tb" in lb.postings.columns
    rb = search(spark, lb, QUERIES, k=5, hydrate=False)
    ru = search(spark, lu, QUERIES, k=5, hydrate=False)
    assert _rows(rb) == _rows(ru)
    # pruning still bites on the live union
    qt = embed_queries(spark, lb, QUERIES)
    assert 0 < pruned_postings(lb, qt).select("_tb").distinct().count() < 8

    # compact's LSM fold keeps the partitioned layout
    compact(spark, out_b)
    snap_parts = glob.glob(os.path.join(out_b, "postings", "_tb=*"))
    assert snap_parts, "compacted store should stay _tb-partitioned"
    cb = load_index(spark, out_b)
    assert cb.meta["term_buckets"] == 8
    rc = search(spark, cb, QUERIES, k=5, hydrate=False)
    assert _rows(rc) == _rows(ru)


def test_unbucketed_index_is_untouched(spark, tmp_path):
    cfg = EngineConfig()
    docs = assign_dense_ids(corpus_df(spark, 120, seed=3, partitions=2),
                            ["repo", "path", "commit"])
    out = str(tmp_path / "idx_flat")
    build_persistent(spark, docs, cfg, out, n_buckets=2, champion_p=0)
    idx = load_index(spark, out)
    assert "_tb" not in idx.postings.columns
    qt = embed_queries(spark, idx, ["main run"])
    assert pruned_postings(idx, qt) is idx.postings
