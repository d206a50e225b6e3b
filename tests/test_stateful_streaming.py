"""applyInPandasWithState first-seen dedup: cross-batch suppression and
checkpoint-restart state persistence (streaming/stateful.py)."""

import os

import pytest

from garamond_jl_spark.streaming.stateful import stream_dedup_first_seen

SCHEMA = "doc_id LONG, text STRING"


def _write_batch(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)


def test_first_seen_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: two distinct texts, one intra-batch duplicate (ids 7, 3)
    _write_batch(spark, src, [(7, "alpha beta"), (3, "alpha beta"),
                              (10, "gamma delta")])
    got = stream_dedup_first_seen(spark, src, SCHEMA, out,
                                  checkpoint_dir=ckpt)
    rows = {r["h"]: r["keep_doc_id"] for r in got.collect()}
    assert len(rows) == 2
    assert 3 in rows.values()       # intra-batch min wins
    assert 10 in rows.values()

    # batch 2 (separate drain, same checkpoint = restart): a LATER
    # duplicate of "alpha beta" must be suppressed by restored state,
    # even with a smaller doc_id; one genuinely new text passes
    _write_batch(spark, src, [(1, "alpha beta"), (20, "epsilon zeta")])
    got2 = stream_dedup_first_seen(spark, src, SCHEMA, out,
                                   checkpoint_dir=ckpt)
    rows2 = {r["h"]: r["keep_doc_id"] for r in got2.collect()}
    assert len(rows2) == 3
    assert set(rows2.values()) == {3, 10, 20}   # 1 never emitted


def test_first_seen_matches_batch_dedup(spark, tmp_path, sf_dir):
    """Single-drain output ≡ the batch dedup_exact survivors on the
    same table (md5 groups, min doc_id)."""
    from pyspark.sql import functions as F
    from garamond_jl_spark.sources.tables import load_testdata

    docs_path = os.path.join(str(sf_dir), "documents.parquet")
    if not os.path.exists(docs_path):
        pytest.skip("no testdata")
    out = str(tmp_path / "out")
    src = tmp_path / "src"          # file source wants a directory
    src.mkdir()
    os.symlink(docs_path, src / "documents.parquet")
    got = stream_dedup_first_seen(spark, str(src), SCHEMA + ", "
                                  "lang STRING, source STRING, n_chars LONG",
                                  out)
    d = load_testdata(spark, str(sf_dir), "documents")
    expect = (d.groupBy(F.md5("text").alias("h"))
              .agg(F.min("doc_id").alias("keep_doc_id")))
    g = {(r["h"], r["keep_doc_id"]) for r in got.collect()}
    e = {(r["h"], r["keep_doc_id"]) for r in expect.collect()}
    assert g == e
