"""Online index maintenance (SURVEY.md §2.9 M1-M4 Spark mapping).

Reference semantics being reproduced:

* ``push!(env, rawdata)`` (/root/reference/src/searchable/
  env_operations.jl:104-143): the embedder model is FROZEN at build time
  — new documents are embedded with the original corpus statistics
  (df/idf/avgdl/n_docs) and appended; existing vectors never change.
  The distributed analog: a delta postings table weighted with the
  frozen stats, unioned at query time (LSM-style).
* OOV terms in pushed docs are dropped (model vocabulary is fixed —
  dtv.jl:34-39 counts against the model vocab).
* ``pop!/deleteat!`` (env_operations.jl:151-201): row-level delete →
  tombstone table consulted at query time until compaction.
* ``pushfirst!`` (id renumbering) is NOT supported — ids are
  append-only (documented capability gap, SURVEY.md §7.4: renumbering
  every id has no sane distributed analog).
* consistency guard (env_operations.jl:115-143): an append commits docs
  + postings together or not at all — staged directory + atomic rename.
* ``env_operator`` reindex (env_operations.jl:9-71): full rebuild into a
  fresh snapshot dir + atomic swap = :func:`compact` with
  ``recompute_stats=True``.

The Structured Streaming entry (:func:`stream_append`) consumes a file
source of new document batches with ``foreachBatch`` → the same append
path; watermarks/session windows have no reference counterpart and are
not required (SURVEY.md §2.9).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from garamond_jl_spark.config import EngineConfig
from garamond_jl_spark.operators.build import InvertedIndex, tokenize_to_postings
from garamond_jl_spark.operators.persist import load_index
from garamond_jl_spark.functions.scoring import weight_expr


def _delta_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "delta_postings")


def _delta_docs_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "delta_docs")


def _tombstones_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "tombstones")


def append_docs(spark: SparkSession, out_dir: str, new_docs: DataFrame,
                id_col: str = "doc_id", text_col: str = "content",
                tokenizer=None, sampler=None) -> int:
    """push! analog: weight new docs with the FROZEN stats model and
    commit docs+postings atomically (staged dir + rename).  Returns the
    number of postings appended.

    ``sampler``: optional DataFrame→DataFrame transform applied to the
    raw pushed records before indexing — the S5 data-sampler hook
    (reference identity/noop/custom samplers,
    /root/reference/src/data/samplers/identity.jl:1-4); None = identity.
    """
    if sampler is not None:
        new_docs = sampler(new_docs)
    with open(os.path.join(out_dir, "meta.json")) as f:
        m = json.load(f)
    cfg = EngineConfig(kappa=m["kappa"], beta=m["beta"],
                       score_alpha=m["score_alpha"],
                       weighting=m["weighting"], block_size=m["block_size"],
                       min_block_df=m.get("min_block_df", 1))
    terms = spark.read.parquet(os.path.join(out_dir, "terms"))

    postings = tokenize_to_postings(new_docs, cfg, id_col, text_col, tokenizer)
    # frozen vocabulary: inner join drops OOV terms (dtv.jl:34-39)
    p = postings.join(terms.select("term", "idf"), "term")
    w = weight_expr(cfg.weighting, F.col("tf").cast("double"),
                    F.col("doclen").cast("double"), F.lit(m["avgdl"]),
                    F.col("idf"), cfg)
    p = p.withColumn("w", w)
    from pyspark.sql import Window
    win = Window.partitionBy("doc_id")
    p = (p.withColumn("norm", F.sqrt(F.sum(F.col("w") * F.col("w")).over(win)))
         .withColumn("wnorm", F.col("w") / F.col("norm")))

    batch = f"batch-{time.strftime('%Y%m%dT%H%M%S')}-{uuid.uuid4().hex[:6]}"
    stage = os.path.join(out_dir, f"_staging_{batch}")
    p_dir, d_dir = os.path.join(stage, "postings"), os.path.join(stage, "docs")
    p.write.parquet(p_dir)
    carry = [c for c in new_docs.columns if c not in (text_col,)]
    doc_stats = p.groupBy("doc_id").agg(F.first("doclen").alias("doclen"),
                                        F.first("norm").alias("norm"))
    new_docs.select(F.col(id_col).alias("doc_id"),
                    *[c for c in carry if c != id_col]) \
        .join(doc_stats, "doc_id", "left") \
        .fillna({"doclen": 0, "norm": 0.0}).write.parquet(d_dir)
    n = spark.read.parquet(p_dir).count()
    # atomic commit: both tables appear together or not at all (M4 guard)
    os.makedirs(_delta_dir(out_dir), exist_ok=True)
    os.makedirs(_delta_docs_dir(out_dir), exist_ok=True)
    os.rename(p_dir, os.path.join(_delta_dir(out_dir), batch))
    os.rename(d_dir, os.path.join(_delta_docs_dir(out_dir), batch))
    shutil.rmtree(stage, ignore_errors=True)
    return n


def delete_docs(spark: SparkSession, out_dir: str, doc_ids: list[int]) -> None:
    """pop!/deleteat! analog: tombstone rows consulted at query time."""
    os.makedirs(_tombstones_dir(out_dir), exist_ok=True)
    spark.createDataFrame([(int(d),) for d in doc_ids], "doc_id LONG") \
        .write.mode("append").parquet(_tombstones_dir(out_dir))


def _read_optional(spark: SparkSession, path: str) -> DataFrame | None:
    if not os.path.exists(path) or not any(
            not e.startswith("_") for e in os.listdir(path)):
        return None
    return spark.read.parquet(os.path.join(path, "*"))


def load_live_index(spark: SparkSession, out_dir: str) -> InvertedIndex:
    """Open the index with deltas unioned and tombstones applied — the
    LSM read path.  Blocks cover only the compacted main postings; the
    exact plan unions deltas, so query via operators.query on this
    object (WAND applies after compaction)."""
    idx = load_index(spark, out_dir)
    delta = _read_optional(spark, _delta_dir(out_dir))
    ddocs = _read_optional(spark, _delta_docs_dir(out_dir))
    tombs = _read_optional(spark, _tombstones_dir(out_dir))
    postings, docs = idx.postings, idx.docs
    n_new = 0
    if delta is not None:
        postings = postings.select(delta.columns).unionByName(delta)
    if ddocs is not None:
        n_new = ddocs.count()
        docs = docs.select(ddocs.columns).unionByName(ddocs)
    if tombs is not None:
        t = tombs.select("doc_id").distinct()
        postings = postings.join(t, "doc_id", "left_anti")
        docs = docs.join(t, "doc_id", "left_anti")
    idx.postings, idx.docs = postings, docs
    idx.meta = dict(idx.meta)
    # meta["n_docs"] stays FROZEN — it feeds query-side idf/bm25 exactly
    # like the reference's build-time SA model stats; only result-size
    # clamping sees the live count.
    idx.meta["n_live_docs"] = idx.meta["n_docs"] + n_new
    return idx


def compact(spark: SparkSession, out_dir: str,
            recompute_stats: bool = False, n_buckets: int = 8) -> str:
    """Merge deltas + tombstones into a fresh snapshot dir and atomically
    swap (env_operator reindex analog).  ``recompute_stats=True`` does a
    full rebuild (new df/idf/avgdl — the reference's 'reindex *'), else
    keeps the frozen model and only rewrites the tables."""
    live = load_live_index(spark, out_dir)
    snap = out_dir.rstrip("/") + f".snapshot-{uuid.uuid4().hex[:6]}"
    if recompute_stats:
        raise NotImplementedError(
            "full reindex requires the source docs table (content column "
            "is not retained in the index); run build_persistent on the "
            "source into a new dir — the swap mechanics below apply")
    os.makedirs(snap, exist_ok=True)
    live.postings.write.parquet(os.path.join(snap, "postings"))
    live.docs.write.parquet(os.path.join(snap, "docs"))
    live.terms.drop("term_max_wnorm").write.parquet(os.path.join(snap, "terms"))
    live.postings.groupBy("term").agg(F.max("wnorm").alias("term_max_wnorm")) \
        .write.parquet(os.path.join(snap, "term_max"))
    from garamond_jl_spark.operators.build import pack_blocks
    pack_blocks(spark.read.parquet(os.path.join(snap, "postings")),
                spark.read.parquet(os.path.join(snap, "terms")),
                live.meta["n_docs"], live.cfg) \
        .write.parquet(os.path.join(snap, "blocks"))
    shutil.copy(os.path.join(out_dir, "meta.json"),
                os.path.join(snap, "meta.json"))
    if os.path.exists(os.path.join(out_dir, "lineage")):
        shutil.copytree(os.path.join(out_dir, "lineage"),
                        os.path.join(snap, "lineage"))
    old = out_dir.rstrip("/") + f".old-{uuid.uuid4().hex[:6]}"
    os.rename(out_dir, old)
    os.rename(snap, out_dir)
    shutil.rmtree(old)
    return out_dir


def stream_append(spark: SparkSession, out_dir: str, source_dir: str,
                  schema: str, id_col: str = "doc_id",
                  text_col: str = "content", tokenizer=None,
                  checkpoint_dir: str | None = None) -> None:
    """Structured Streaming ingestion: file source → foreachBatch →
    the same frozen-stats append path.  Uses Trigger.AvailableNow so a
    single call drains the backlog and stops (testable without a
    long-running daemon); a production deployment drops the trigger."""
    ckpt = checkpoint_dir or os.path.join(out_dir, "_stream_checkpoint")
    stream = (spark.readStream.schema(schema).parquet(source_dir))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_docs(spark, out_dir, batch_df, id_col, text_col, tokenizer)

    (stream.writeStream.foreachBatch(sink)
     .option("checkpointLocation", ckpt)
     .trigger(availableNow=True).start().awaitTermination())
