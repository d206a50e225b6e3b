"""Inverted-index build pipeline (SURVEY.md §3.2 Spark mapping).

Reference counterpart: ``build_search_env`` → ``build_embedder`` →
``build_searcher`` (/root/reference/src/searchable/env.jl:29-83,
src/embedder/interface.jl:59-99, src/searchable/searcher.jl:72-101) —
eager, single-process, in-memory.  This is the distributed re-design:

Shuffle budget (3 wide dependencies, each annotated below):

1. **tokenize + doc-local term counting** — ONE ``mapInPandas`` pass
   emits ``(term, doc_id, tf, doclen)`` with tf complete per document
   (counting happens inside the Arrow batch), so there is *no shuffle at
   all* to form raw postings — the classic map-side combine done at the
   document level.
2. **term statistics** — salted two-stage aggregation
   ``groupBy(term, salt) → groupBy(term)`` to defuse Zipf hot-term skew
   (north rule; AQE alone cannot split a single mega-key inside one
   ``groupBy`` stage, SURVEY.md §4.2).  [shuffle #1: by (term, salt),
   then a tiny by-term merge]
3. **weighting** — postings ⋈ terms on ``term`` (sort-merge; AQE skew
   join) brings idf to each posting; BM25 is a pure column expression
   (whole-stage codegen).  [shuffle #2: by term]
4. **cosine norms** — ``sum(w²) over (partition by doc_id)`` window →
   ``wnorm = w / ‖d‖`` stored per posting, so query time needs NO join
   against doc norms.  [shuffle #3: by doc_id]
5. **block packing** — skew-free bounded groups: per-term stride
   ``stride(t) = 2^ceil(log2(block_size · n_docs / df_t))`` buckets
   ``doc_id div stride`` so every ``groupBy(term, bucket)`` group holds
   ≤ ~block_size postings *regardless of term hotness*; an Arrow
   ``applyInPandas`` packs each group into docID-delta+varbyte blocks
   with block-max scores for WAND.  No windows over hot terms anywhere.

Persistence (``build_persistent``): stages write parquet tables (the
Iceberg stand-in, sources/tables.py) with per-bucket lineage rows
(docs tokenized, postings emitted, bytes packed) and are
checkpoint-resumable: a killed build re-run with ``resume=True`` skips
every bucket whose lineage row and _SUCCESS marker exist.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

from garamond_jl_spark.config import EngineConfig
from garamond_jl_spark.functions.codec import pack_f32, pack_ids, varbyte_encode
from garamond_jl_spark.functions.scoring import idf_expr, weight_expr
from garamond_jl_spark.functions.textprep import tokenize_with_config

POSTINGS_SCHEMA = StructType([
    StructField("term", StringType(), False),
    StructField("doc_id", LongType(), False),
    StructField("tf", IntegerType(), False),
    StructField("doclen", IntegerType(), False),
])

BLOCKS_SCHEMA = StructType([
    StructField("term", StringType(), False),
    StructField("min_doc_id", LongType(), False),
    StructField("max_doc_id", LongType(), False),
    StructField("n", IntegerType(), False),
    StructField("ids", BinaryType(), False),
    StructField("tfs", BinaryType(), False),
    StructField("wnorms", BinaryType(), False),
    StructField("block_max_wnorm", DoubleType(), False),
])


@dataclass
class InvertedIndex:
    """The searchable state: 3-4 tables + scalar meta (the analog of the
    reference ``Searcher``, src/searchable/searcher.jl:8-17)."""

    docs: DataFrame       # doc_id, <carried cols>, doclen, norm
    terms: DataFrame      # term, df, idf, term_max_wnorm
    postings: DataFrame   # term, doc_id, tf, doclen, w, wnorm
    blocks: DataFrame | None = None
    meta: dict = field(default_factory=dict)
    # the tokenizer the index was BUILT with; query embedding must use
    # the same one or query terms miss the vocabulary (None = the
    # canonical prepare_and_tokenize(cfg) pipeline)
    tokenizer: object = None
    # optional per-term impact-ordered prefixes (term, doc_id, wnorm,
    # imp_rank) for the champion-list plan (operators/impact.py);
    # attached by load_index when the persistent index stored them
    champions: "DataFrame | None" = None
    # warm serving posture (operators/resident.py make_resident):
    # driver-held term stats + pad prefixes so a single request costs
    # one Spark job over the persisted postings instead of stats /
    # bucket / pad round-trips.  None = the default lazy posture.
    resident: object = None

    @property
    def cfg(self) -> EngineConfig:
        return self.meta["cfg"]


def assign_dense_ids(df: DataFrame, order_cols: list[str],
                     id_col: str = "doc_id") -> DataFrame:
    """Dense stable 0..n-1 ids (reference id-key contract,
    src/data/db.jl:47-55: must exist, dense, Int).

    ``monotonically_increasing_id`` is sparse; a single global
    ``row_number`` window is a one-partition bottleneck.  Scalable plan:
    range-repartition + in-partition sort by the key, per-partition
    ``row_number``, plus a broadcast map of per-partition row-count
    offsets (tiny driver collect of one count per partition).
    """
    part = df.repartitionByRange(*[F.col(c) for c in order_cols]) \
             .sortWithinPartitions(*order_cols) \
             .withColumn("_pid", F.spark_partition_id())
    # DISK_ONLY: the snapshot is read exactly twice (partition counts,
    # then the offset join) — caching the FULL corpus as in-memory row
    # objects evicted everything else and OOM'd 5g executors at 30M docs
    # (round-3 local-cluster protocol); disk-backed persistence costs
    # one sequential write/read and holds at any corpus size
    from pyspark import StorageLevel
    part = part.persist(StorageLevel.DISK_ONLY)
    # the snapshot stays pinned for the session (the returned plan
    # reads through it); sessions that assign ids repeatedly can
    # release the previous corpus via the handle attached below
    counts = part.groupBy("_pid").count().collect()
    offsets, acc = [], 0
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((r["_pid"], acc))
        acc += r["count"]
    spark = df.sparkSession
    # explicit schema: an EMPTY input yields offsets == [] and
    # schema inference would raise instead of returning an empty result
    off_df = F.broadcast(spark.createDataFrame(
        offsets, "_pid INT, _offset BIGINT"))
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = (part.join(off_df, "_pid")
           .withColumn(id_col, F.row_number().over(w) - 1 + F.col("_offset"))
           .drop("_pid", "_offset"))
    out._dense_ids_snapshot = part       # unpersist handle for callers
    out._dense_ids_total = acc           # exact row count, already paid
    return out


def tokenize_to_postings(docs: DataFrame, cfg: EngineConfig,
                         id_col: str = "doc_id",
                         text_col: str = "content",
                         tokenizer=None) -> DataFrame:
    """Stage 1: doc-local term counting in one Arrow pass (no shuffle).

    Equivalent relational plan would be ``explode → groupBy(term,
    doc_id)`` (shuffle); counting inside the document avoids it entirely
    because tf(t, d) only needs d's own tokens.

    Uses ``mapInArrow`` (RecordBatch in/out) rather than ``mapInPandas``:
    the per-batch pandas construction + pandas→Arrow conversion on the
    ~18-postings-per-doc output was the single largest build cost and is
    pure overhead here — the 1M-doc profile (BENCH.md round 2) measured
    the Arrow-direct emit at 1.9× the pandas path at both 8 and 32
    cores.

    ``tokenizer``: optional ``str -> list[str]`` override (default: the
    canonical prepare+tokenize pipeline under ``cfg``).
    """
    tok = tokenizer or (lambda s: tokenize_with_config(s, cfg))
    import pyarrow as pa
    arrow_schema = pa.schema([("term", pa.string()), ("doc_id", pa.int64()),
                              ("tf", pa.int32()), ("doclen", pa.int32())])

    def count_terms(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for b in batches:
            ids = b.column(b.schema.get_field_index(id_col)).to_pylist()
            texts = b.column(b.schema.get_field_index(text_col)).to_pylist()
            out_term: list[str] = []
            out_doc: list[int] = []
            out_tf: list[int] = []
            out_len: list[int] = []
            ap_t, ap_d, ap_f, ap_l = (out_term.append, out_doc.append,
                                      out_tf.append, out_len.append)
            for doc_id, text in zip(ids, texts):
                toks = tok(text)
                counts: dict[str, int] = {}
                for t in toks:
                    counts[t] = counts.get(t, 0) + 1
                n = len(toks)
                for t, c in counts.items():
                    ap_t(t)
                    ap_d(doc_id)
                    ap_f(c)
                    ap_l(n)
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_term, pa.string()),
                 pa.array(out_doc, pa.int64()),
                 pa.array(out_tf, pa.int32()),
                 pa.array(out_len, pa.int32())],
                schema=arrow_schema)

    return docs.select(id_col, text_col).mapInArrow(count_terms, POSTINGS_SCHEMA)


def term_stats(postings: DataFrame, n_docs: int,
               cfg: EngineConfig) -> DataFrame:
    """Stage 2: dictionary with df/idf via salted two-stage aggregation.

    ``postings`` is unique on (term, doc_id) so df = row count per term.
    Salting bounds the per-reducer key volume for Zipf head terms.

    Also carries ``tf_sum`` (Σ tf per term, exact integer) so corpus
    totals — Σ tf over ALL postings, i.e. avgdl·n_docs — are derivable
    from the vocabulary-sized dictionary without a second pass over the
    postings (r6: build_index folds the avgdl job into the terms job).
    """
    salted = (postings
              .withColumn("_salt", F.pmod(F.xxhash64("doc_id"),
                                          F.lit(cfg.term_salt_buckets)))
              .groupBy("term", "_salt")
              .agg(F.count("*").alias("_partial_df"),
                   F.sum("tf").alias("_partial_tf")))
    terms = (salted.groupBy("term")
             .agg(F.sum("_partial_df").alias("df"),
                  F.sum("_partial_tf").alias("tf_sum"))
             .withColumn("idf", idf_expr(float(n_docs), F.col("df").cast("double"))))
    return terms


WEIGHTED_COLS = ["term", "doc_id", "tf", "doclen", "idf", "w", "norm",
                 "wnorm"]

# norms="broadcast" safety valve: above this corpus size the per-doc
# norms table stops being comfortably broadcastable (~24 B/doc) and the
# plan falls back to the doc_id window
NORM_BROADCAST_MAX_DOCS = 8_000_000


def weighted_postings(postings: DataFrame, terms: DataFrame,
                      avgdl: float, cfg: EngineConfig,
                      local_norms: bool = False,
                      broadcast_idf: bool = False,
                      norms: str = "window",
                      n_docs: int | None = None) -> DataFrame:
    """Stages 3+4: per-posting weight ``w`` (JVM expression) and
    L2-normalized ``wnorm = w/‖d‖``.

    Two independently-chosen physical strategies (all value-identical
    up to float addition order; every parity gate rounds at 1e-6):

    * idf delivery — ``broadcast_idf=False``: postings⋈terms sort-merge
      join (full-postings shuffle by term).  ``broadcast_idf=True``:
      forced broadcast hash join (narrow — the dictionary is
      Heaps-sublinear; callers guard with ``LOCAL_NORMS_MAX_VOCAB``).
    * ``norms`` — ``"window"``: ``sum(w²) over (partition by doc_id)``
      (full-postings shuffle by doc_id); the default.  ``"broadcast"``:
      per-doc Σw² via map-side-combined ``groupBy(doc_id)`` (shuffle of
      ~n_docs tiny rows) then a forced broadcast join back — guarded by
      ``NORM_BROADCAST_MAX_DOCS`` when ``n_docs`` is passed (falls back
      to the window plan above it).  CAVEAT: the probe
      lineage (postings scan → idf join → weight projection) is
      evaluated twice (agg + join back); in full-build A/Bs that
      recompute costs more than the one doc_id shuffle it saves
      (BENCH.md), so it's an opt-in for regimes where shuffle I/O is
      the scarce resource and the postings scan is cheap to repeat.
      ``"arrow"``: zero shuffles, see :func:`weighted_postings_local`
      (requires broadcast_idf's narrow join to preserve tokenize's
      doc-contiguity).

    ``local_norms=True`` is the legacy alias for the arrow plan."""
    if local_norms or norms == "arrow":
        return weighted_postings_local(postings, terms, avgdl, cfg)
    idf = terms.select("term", "idf")
    p = postings.join(F.broadcast(idf) if broadcast_idf else idf, "term")
    w = weight_expr(cfg.weighting, F.col("tf").cast("double"),
                    F.col("doclen").cast("double"), F.lit(avgdl),
                    F.col("idf"), cfg)
    p = p.withColumn("w", w)
    if norms == "broadcast":
        # the safety valve is enforced HERE (not by convention): a
        # forced broadcast of a too-large per-doc norms table hits
        # Spark's broadcast hard limit or OOMs the driver with no
        # graceful fallback.  Callers that know the corpus size pass
        # n_docs; above the valve the plan falls back to the window.
        if n_docs is not None and n_docs > NORM_BROADCAST_MAX_DOCS:
            import warnings
            warnings.warn(
                f"norms='broadcast' requested for {n_docs} docs > "
                f"NORM_BROADCAST_MAX_DOCS={NORM_BROADCAST_MAX_DOCS}; "
                f"falling back to the window plan")
            norms = "window"
    if norms == "broadcast":
        nrm = (p.groupBy("doc_id")
               .agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")))
        p = p.join(F.broadcast(nrm), "doc_id")
    elif norms == "window":
        win = Window.partitionBy("doc_id")
        p = p.withColumn("norm",
                         F.sqrt(F.sum(F.col("w") * F.col("w")).over(win)))
    else:
        raise ValueError(f"unknown norms strategy: {norms!r}")
    return p.withColumn("wnorm", F.col("w") / F.col("norm")) \
        .select(*WEIGHTED_COLS)


WEIGHTED_SCHEMA = StructType([
    StructField("term", StringType(), False),
    StructField("doc_id", LongType(), False),
    StructField("tf", IntegerType(), False),
    StructField("doclen", IntegerType(), False),
    StructField("idf", DoubleType(), False),
    StructField("w", DoubleType(), False),
    StructField("norm", DoubleType(), False),
    StructField("wnorm", DoubleType(), False),
])

# broadcast-idf safety valve: above this vocabulary size the dictionary
# stops being comfortably broadcastable and weighted_postings falls back
# to the classic shuffle plan (callers check; see build_index)
LOCAL_NORMS_MAX_VOCAB = 4_000_000


def weighted_postings_local(postings: DataFrame, terms: DataFrame,
                            avgdl: float, cfg: EngineConfig) -> DataFrame:
    """Shuffle-free stages 3+4.

    The build-scaling investigation (BENCH.md) pinned the build's
    non-scaling fraction on shared memory/IO bandwidth; the two
    full-postings shuffles of the classic plan (59.5M rows × ~40 B
    written+read twice at the 3M-doc protocol) are the largest
    avoidable byte stream.  Both are avoidable because

    * the dictionary is SUBLINEAR in the corpus (Heaps' law) — idf fits
      in a broadcast hash join (narrow; per-partition row order is
      preserved), and
    * :func:`tokenize_to_postings` emits each document's postings as
      one CONTIGUOUS run (each input row is one whole document), so the
      per-doc ``Σw²`` is computable inside one ``mapInArrow`` pass with
      a run-boundary carry across Arrow batches — no doc_id shuffle.

    Contiguity can break only at PARTITION edges (a parquet re-read may
    split a file mid-document; the first/last run of a partition may
    continue in a neighbour).  Those docs are repaired exactly: a tiny
    side job computes the true global ``Σw²`` for the ≤2·n_partitions
    edge doc_ids and the pass substitutes them for the local run sums.
    Interior runs are provably complete.

    Output schema and values match the classic plan (norm addition
    order differs in the last ulps; every parity gate rounds at 1e-6).
    """
    import numpy as np
    import pyarrow as pa

    p = postings.join(F.broadcast(terms.select("term", "idf")), "term")
    w = weight_expr(cfg.weighting, F.col("tf").cast("double"),
                    F.col("doclen").cast("double"), F.lit(avgdl),
                    F.col("idf"), cfg)
    p = p.withColumn("w", w)

    # --- edge docs: the first/last doc_id of every partition ----------
    # (runs on the same scan lineage ⇒ identical partition boundaries)
    def first_last(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        first = last = None
        for b in batches:
            col = b.column(b.schema.get_field_index("doc_id"))
            if len(col):
                if first is None:
                    first = col[0].as_py()
                last = col[len(col) - 1].as_py()
        if first is not None:
            yield pa.RecordBatch.from_arrays(
                [pa.array(sorted({first, last}), pa.int64())], ["doc_id"])

    edge_ids = sorted({r["doc_id"] for r in postings.select("doc_id")
                       .mapInArrow(first_last, "doc_id long").collect()})
    edge_norms: dict[int, float] = {}
    if edge_ids:
        import math
        rows = (p.where(F.col("doc_id").isin(edge_ids))
                .groupBy("doc_id")
                .agg(F.sum(F.col("w") * F.col("w")).alias("ss")).collect())
        edge_norms = {r["doc_id"]: math.sqrt(r["ss"]) for r in rows}

    in_cols = ["term", "doc_id", "tf", "doclen", "idf", "w"]

    def add_norms(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        def flush(tbl: "pa.Table") -> "pa.RecordBatch":
            tbl = tbl.combine_chunks()
            ids = tbl.column("doc_id").to_numpy()
            wv = tbl.column("w").to_numpy()
            starts = np.flatnonzero(
                np.concatenate(([True], ids[1:] != ids[:-1])))
            sums = np.add.reduceat(wv * wv, starts)
            norms = np.sqrt(sums)
            if edge_norms:
                for i, g in enumerate(ids[starts]):
                    hit = edge_norms.get(int(g))
                    if hit is not None:
                        norms[i] = hit
            lens = np.diff(np.append(starts, len(ids)))
            norm_col = np.repeat(norms, lens)
            with np.errstate(divide="ignore", invalid="ignore"):
                wnorm = wv / norm_col
            arrays = [tbl.column(c).combine_chunks() for c in in_cols]
            arrays += [pa.array(norm_col, pa.float64()),
                       pa.array(wnorm, pa.float64())]
            return pa.RecordBatch.from_arrays(arrays, in_cols + ["norm",
                                                                 "wnorm"])

        # the pending (possibly batch-spanning) trailing run is kept as
        # a LIST of tables and concatenated once at flush — re-concat
        # per batch was O(run²) row copies for a doc spanning many
        # Arrow batches.  Invariant: every pend part holds rows of one
        # single doc_id (the current trailing run).
        pend_parts: list["pa.Table"] = []
        for b in batches:
            t = pa.Table.from_batches([b])
            if t.num_rows == 0:
                continue
            ids = t.column("doc_id").to_numpy()
            nz = np.flatnonzero(ids != ids[-1])
            cut = 0 if nz.size == 0 else int(nz[-1]) + 1
            if cut == 0:
                # single-id batch: continues pend, or starts a new run
                if pend_parts and pend_parts[0].column("doc_id")[0] \
                        .as_py() != int(ids[0]):
                    yield flush(pa.concat_tables(pend_parts))
                    pend_parts = []
                pend_parts.append(t)
                continue
            head = t.slice(0, cut)
            if pend_parts:
                if pend_parts[0].column("doc_id")[0].as_py() == int(ids[0]):
                    yield flush(pa.concat_tables(pend_parts + [head]))
                else:       # pend's run ended exactly at the boundary
                    yield flush(pa.concat_tables(pend_parts))
                    yield flush(head)
                pend_parts = []
            else:
                yield flush(head)
            tail = t.slice(cut)
            if tail.num_rows:
                pend_parts = [tail]
        if pend_parts:
            yield flush(pa.concat_tables(pend_parts))

    return p.select(*in_cols).mapInArrow(add_norms, WEIGHTED_SCHEMA)


def block_strides(terms: DataFrame, n_docs: int,
                  cfg: EngineConfig) -> DataFrame:
    """(term, _stride) for every blocked term — the df-adaptive bucket
    stride ``pack_blocks`` groups by.  ONE definition: WAND's flat-path
    scoring recomputes posting → bucket keys with this same expression
    (operators/wand.py), and any drift between packer and query would
    silently mis-map survivors to empty buckets."""
    bs = float(cfg.block_size)
    return terms.where(F.col("df") >= F.lit(cfg.min_block_df)).select(
        "term",
        F.pow(F.lit(2.0), F.ceil(F.log2(
            F.greatest(F.lit(1.0),
                       F.lit(bs) * F.lit(float(n_docs)) / F.col("df"))
        ))).cast("long").alias("_stride"))


def pack_blocks(postings_w: DataFrame, terms: DataFrame, n_docs: int,
                cfg: EngineConfig) -> DataFrame:
    """Stage 5: skew-free posting blocks with block-max scores.

    Bucket by ``doc_id div stride(term)`` with df-adaptive stride so
    groups are bounded near block_size for hot terms and near df for
    rare ones; each group packs independently (embarrassingly parallel,
    no hot-term window).

    Terms with df < cfg.min_block_df are NOT packed: real-code
    dictionaries carry a df≈1 long tail that would dominate the packer's
    group count while those posting lists are too short for block-max
    pruning to ever help.  WAND reads unblocked query terms from the
    flat postings table (operators/wand.py)."""
    strides = block_strides(terms, n_docs, cfg)
    p = (postings_w.join(strides, "term")
         .withColumn("_bucket", (F.col("doc_id") / F.col("_stride")).cast("long")))

    block_size = cfg.block_size

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        term = pdf["term"].iloc[0]
        rows = []
        for s in range(0, len(pdf), block_size):
            chunk = pdf.iloc[s:s + block_size]
            ids = chunk["doc_id"].to_numpy()
            rows.append({
                "term": term,
                "min_doc_id": int(ids[0]),
                "max_doc_id": int(ids[-1]),
                "n": len(chunk),
                "ids": pack_ids(ids),
                "tfs": varbyte_encode(chunk["tf"].to_numpy()),  # plain varbyte (unsorted)
                "wnorms": pack_f32(chunk["wnorm"].to_numpy()),
                "block_max_wnorm": float(chunk["wnorm"].max()),
            })
        return pd.DataFrame(rows)

    return (p.select("term", "doc_id", "tf", "wnorm", "_bucket")
            .groupBy("term", "_bucket")
            .applyInPandas(lambda key, pdf: pack(pdf), BLOCKS_SCHEMA))


def doc_table(docs: DataFrame, postings_w: DataFrame, id_col: str,
              carry_cols: list[str]) -> DataFrame:
    """docs side table: carried metadata + doclen + norm (diagnostics /
    hydration J2; schema per SURVEY.md §1.2)."""
    stats = (postings_w.groupBy("doc_id")
             .agg(F.first("doclen").alias("doclen"),
                  F.first("norm").alias("norm")))
    d = docs.select(F.col(id_col).alias("doc_id"), *carry_cols)
    return (d.join(stats, "doc_id", "left")
            .fillna({"doclen": 0, "norm": 0.0}))


def project_embeddable(docs: DataFrame, fields: list[str],
                       text_col: str = "content") -> DataFrame:
    """P1 field projection for embedding/indexing (reference
    dbentry2text, /root/reference/src/data/db.jl:23-43): select the
    configured embeddable fields, stringify, space-concatenate; missing
    columns contribute the empty string (db.jl:32-38)."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(""))
             if c in docs.columns else F.lit("") for c in fields]
    joined = F.array_join(F.array_remove(F.array(*parts), ""), " ")
    return docs.withColumn(text_col, joined)


def build_index(spark: SparkSession, docs: DataFrame, cfg: EngineConfig,
                id_col: str | None = "doc_id", text_col: str = "content",
                carry_cols: list[str] | None = None,
                with_blocks: bool = False,
                tokenizer=None,
                embeddable_fields: list[str] | None = None) -> InvertedIndex:
    """In-memory (lazy) build — the test/query-dev path.  The persistent,
    checkpoint-resumable variant is :func:`build_persistent`.
    ``embeddable_fields``: build the indexed text by concatenating these
    columns (P1) instead of reading ``text_col`` directly."""
    if embeddable_fields:
        docs = project_embeddable(docs, embeddable_fields, text_col)
    if id_col is None:
        # dense-id assignment needs a deterministic total order; default
        # to the synthetic code-corpus key when present, otherwise any
        # non-text columns — hardcoding the git triple crashed every
        # non-code schema with an unresolved-column error
        order_cols = [c for c in ("repo", "path", "commit")
                      if c in docs.columns]
        if not order_cols:
            order_cols = sorted(c for c in docs.columns if c != text_col)
        if not order_cols:
            raise ValueError(
                "id_col=None needs at least one non-text column to "
                "order dense ids by; pass an explicit id_col")
        docs = assign_dense_ids(docs, order_cols)
        id_col = "doc_id"
    if carry_cols is None:
        carry_cols = [c for c in docs.columns if c not in (id_col, text_col)]
    # note (r6): widening a single-split scan before the tokenize pass
    # (repartition to 2·cores) was measured and REJECTED for this path —
    # interleaved same-JVM A/B at sf0.1: narrow 1.75-2.2 s vs wide
    # 2.55-2.60 s per build.  The extra shuffle plus 128-task stages
    # cost more than the single-task Python tokenize they parallelize;
    # big corpora arrive multi-split and never hit the question.
    postings = tokenize_to_postings(docs, cfg, id_col, text_col, tokenizer)
    # the raw postings are consumed exactly twice (the terms job below
    # and the weighting probe); r6 measurement: building their columnar
    # cache cost ~3× the tokenize pass itself (1.7 s vs 0.5 s at the
    # 50k-doc bench corpus — OPTIMIZATION_r06.md), so the cache is gone
    # and each consumer re-evaluates the cheap tokenize lineage instead
    n_docs = getattr(docs, "_dense_ids_total", None)
    if n_docs is None:
        n_docs = docs.count()
    terms = term_stats(postings, n_docs, cfg).persist()
    # ONE vocabulary-sized job yields n_terms AND the corpus token total
    # (Σ tf == Σ doclen, every token lands in exactly one (term, doc)
    # cell) — this replaces the former postings-wide sum(tf) job and the
    # separate terms.count() job; both values are exact integers so
    # avgdl is bit-identical to the two-job version
    trow = terms.agg(F.count("*").alias("n"),
                     F.sum("tf_sum").alias("s")).collect()[0]
    n_terms = int(trow["n"])
    total_len = int(trow["s"] or 0)
    avgdl = float(total_len) / n_docs if n_docs else 0.0
    # persist WEIGHTED postings: otherwise every query batch would re-run
    # the terms join and the doc_id norm window (a full shuffle) — the
    # persistent index stores wnorm for the same reason.  broadcast_idf
    # kills the postings-by-term shuffle whenever the dictionary fits;
    # norms stay on the window plan: the broadcast tier re-evaluates the
    # probe lineage (scan → idf join → weight projection) TWICE — once
    # for the norm agg, once for the join back — which measured slower
    # than the one doc_id shuffle in every full-build A/B rep
    # (BENCH.md); it remains an explicit weighted_postings(...) opt-in.
    b_idf = n_terms <= LOCAL_NORMS_MAX_VOCAB
    pw = weighted_postings(postings, terms, avgdl, cfg,
                           broadcast_idf=b_idf, norms="window").persist()
    terms_full = terms  # term_max added lazily when blocks are built
    blocks = None
    if with_blocks:
        blocks = pack_blocks(pw, terms, n_docs, cfg)
        terms_full = terms.join(
            pw.groupBy("term").agg(F.max("wnorm").alias("term_max_wnorm")),
            "term")
    dtab = doc_table(docs, pw, id_col, carry_cols)
    # "_aux_persist": build-time caches the returned index holds no
    # column handle to (the id_col=None dense-id DISK_ONLY corpus
    # snapshot; the raw tokenized postings are no longer cached at all)
    # — retire via server/rest._envop or bench._retire_index so
    # reindex/bench loops don't accumulate orphaned cache sets
    aux = []
    snap = getattr(docs, "_dense_ids_snapshot", None)
    if snap is not None:
        aux.append(snap)
    meta = {"_aux_persist": aux,
            "n_docs": n_docs, "avgdl": avgdl, "n_terms": n_terms,
            "cfg": cfg}
    return InvertedIndex(docs=dtab, terms=terms_full, postings=pw,
                         blocks=blocks, meta=meta, tokenizer=tokenizer)
