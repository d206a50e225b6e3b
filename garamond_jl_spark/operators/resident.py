"""Warm serving posture for the classic BM25 index.

The reference is an interactive server: once ``load_search_env`` has
deserialized the environment (src/search/env.jl:31-39) every request is
answered from in-memory state with no per-request I/O.  The lazy Spark
posture re-pays per request what the reference pays once at load:

* ``embed_queries`` runs a Spark job to fetch the query terms' df stats
  (operators/query.py) — one driver round-trip *before* scoring starts;
* ``pruned_postings`` runs a tiny local job to hash query terms into
  postings buckets;
* ``topk_plan``'s dense-knn pad scans the docs table for the 2k lowest
  doc ids — another job;
* the postings/docs scans themselves re-read parquet every request.

:func:`make_resident` mirrors ``HNSWCandidateIndex.load(resident=True)``
(operators/ann.py) for the inverted index: persist + materialize the
index tables once, and collect the *small* serving state to the driver —

* the full ``(term, df[, bucket])`` statistics table.  This is the
  dictionary, not the postings: ~16 bytes + term bytes per row, a few
  hundred MB at a 10^7-term code vocabulary — the same order the
  reference's in-memory lexicon costs, and it is held as two aligned
  numpy arrays behind a ``pandas.Index`` (hash lookup), not Python
  dicts, so 10^7 terms stay compact;
* the ``2·pad_k`` lowest doc ids (with a doclen>0 flag) and, under the
  ``:large_vector`` OOV policy, the ``2·pad_k`` lowest all-OOV doc ids
  — the only rows the pad construction can ever touch for ``k ≤ pad_k``.

After this a single classic request is ONE Spark job (score + window +
hydrate over the cached postings/docs); query embedding and pad
construction are pure driver math.  Result identity: the resident paths
in ``embed_queries`` / ``pruned_postings`` / ``topk_plan`` consume the
same values the lazy paths would have collected, so scores and ranks are
bit-identical (tests/test_resident.py asserts equality and the
zero-job property).

Scope: a resident index is a *frozen serving snapshot* — the posture a
``gars`` server loads with ``--env-cache``.  Incremental live views
(streaming/incremental.py) keep the lazy posture: their stats change
under appends, which is exactly what a driver-held copy cannot track.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from garamond_jl_spark.operators.build import InvertedIndex

# pad prefixes cover any request k ≤ RESIDENT_PAD_K (the engine's
# max_matches ceiling in practice); larger k falls back to the lazy
# docs scan — correctness is never capped by residency
RESIDENT_PAD_K = 1000


@dataclass
class ResidentStats:
    """Driver-held serving state (see module docstring)."""
    terms: pd.Index            # sorted vocabulary (hash-indexed)
    df: np.ndarray             # int64 document frequencies, aligned
    tb: np.ndarray | None      # int32 postings bucket ids, aligned
    low_ids: list[tuple[int, bool]]   # (doc_id, doclen>0), 2·pad_k lowest
    oov_low_ids: list[int]     # lowest all-OOV doc ids (:large_vector)
    pad_k: int

    def df_of(self, terms: list[str]) -> dict[str, int]:
        """In-vocabulary df lookup — the resident replacement for
        ``embed_queries``'s filtered terms-table collect."""
        idx = self.terms.get_indexer(terms)
        return {t: int(self.df[i])
                for t, i in zip(terms, idx) if i >= 0}

    def buckets_of(self, terms: list[str]) -> list[int] | None:
        """Postings-bucket ids of the given terms (None when the index
        is unbucketed).  OOV terms contribute no bucket — their
        postings don't exist anywhere."""
        if self.tb is None:
            return None
        idx = self.terms.get_indexer(terms)
        return sorted({int(self.tb[i]) for i in idx if i >= 0})


def make_resident(spark: SparkSession, index: InvertedIndex,
                  pad_k: int = RESIDENT_PAD_K) -> InvertedIndex:
    """Switch ``index`` to the warm serving posture, in place.

    Persists + materializes docs/terms/postings (and champions when
    present) and collects the driver-held :class:`ResidentStats`.
    Idempotent; returns the same index for chaining."""
    if index.resident is not None:
        return index
    if index.meta.get("live_deltas"):
        raise ValueError(
            "make_resident on an incremental live view: resident stats "
            "would freeze while appends change them — load a frozen "
            "snapshot (operators/persist.load_index) instead")
    def _persist(df):
        lvl = df.storageLevel
        return df if (lvl.useMemory or lvl.useDisk) else df.persist()

    index.docs = _persist(index.docs)
    index.terms = _persist(index.terms)
    index.postings = _persist(index.postings)
    if index.champions is not None:
        index.champions = _persist(index.champions)

    # one scan of the terms table yields df + bucket id per term; the
    # bucket hash MUST match write_bucketed_postings' partitioning
    # expression (pmod(xxhash64(term), nb)) or pruning would read the
    # wrong buckets
    nb = index.meta.get("term_buckets")
    cols = [F.col("term"), F.col("df").cast("long").alias("df")]
    if nb:
        cols.append(F.pmod(F.xxhash64("term"), F.lit(int(nb)))
                    .cast("int").alias("tb"))
    pdf = index.terms.select(*cols).toPandas()
    order = np.argsort(pdf["term"].to_numpy())
    terms_idx = pd.Index(pdf["term"].to_numpy()[order])
    df_arr = pdf["df"].to_numpy()[order]
    tb_arr = pdf["tb"].to_numpy()[order] if nb else None
    if index.meta.get("n_terms") is None:
        index.meta["n_terms"] = int(len(pdf))

    # pad prefixes: exactly the rows topk_plan's lazy scans would read
    low = (index.docs
           .select("doc_id", (F.col("doclen") > 0).alias("pos"))
           .orderBy("doc_id").limit(2 * pad_k).collect())
    low_ids = [(int(r["doc_id"]), bool(r["pos"])) for r in low]
    oov_low_ids: list[int] = []
    if index.cfg.oov_policy == "large_vector":
        oov_low_ids = [int(r["doc_id"]) for r in
                       index.docs.where(F.col("doclen") == 0)
                       .orderBy("doc_id").limit(2 * pad_k)
                       .select("doc_id").collect()]
    # materialize the big tables AFTER the small collects (the collects
    # above already warmed docs; this pins postings)
    index.postings.count()

    index.resident = ResidentStats(terms=terms_idx, df=df_arr, tb=tb_arr,
                                   low_ids=low_ids,
                                   oov_low_ids=oov_low_ids, pad_k=pad_k)
    return index


def make_env_resident(env, pad_k: int = RESIDENT_PAD_K):
    """Warm serving posture for a whole :class:`SearchEnv` — classic
    AND dense/mixed searchers (the multi-searcher analog of
    :func:`make_resident`, VERDICT r4 item 7).

    Classic searchers get the full resident treatment (driver stats +
    pad prefixes).  Dense searchers (``DenseVectorSearcher`` family)
    hold several frames a request re-reads every time — doc_embeddings,
    packed storage, word_vectors, the LSA V table, the SIF lexicon —
    all persisted + materialized here, and the lazily-built doc-norms
    frame is forced and persisted so the first request doesn't pay it.
    RP/LSA searchers embed queries through their backing classic index
    (``embed_queries``), so that index goes resident too — its stats
    lookup then costs no job.  Incremental live-view indexes keep the
    lazy posture (their stats move under appends).

    Idempotent per object; returns ``env`` for chaining."""
    from pyspark.sql import DataFrame
    seen: set[int] = set()

    def _residentify(obj) -> None:
        if obj is None or id(obj) in seen:
            return
        seen.add(id(obj))
        if isinstance(obj, InvertedIndex):
            if obj.resident is None and not obj.meta.get("live_deltas"):
                make_resident(env.spark, obj, pad_k=pad_k)
            return
        frame_attrs = [n for n, v in vars(obj).items()
                       if isinstance(v, DataFrame)]
        owned: list[str] = []
        for n in frame_attrs:
            f = getattr(obj, n)
            if f.storageLevel.useMemory or f.storageLevel.useDisk:
                continue                       # already persisted
            setattr(obj, n, f.persist())
            owned.append(n)
        # record which frames THIS call persisted so shutdown releases
        # exactly those — release_env_resident must not evict caches
        # other code created (ADVICE r5)
        obj._resident_owned = owned
        if hasattr(obj, "_doc_norms"):
            norms = obj._doc_norms()
            if not (norms.storageLevel.useMemory
                    or norms.storageLevel.useDisk):
                obj._norms = norms.persist()
                owned.append("_norms")
        _residentify(getattr(obj, "index", None))   # RP/LSA backing
        for n, v in vars(obj).items():
            if isinstance(v, DataFrame):
                v.count()                      # materialize

    for s in [env.index] + [s for s, _ in env.searchers]:
        _residentify(s)
    return env


def release_env_resident(env) -> None:
    """Undo :func:`make_env_resident` (server shutdown path)."""
    from pyspark.sql import DataFrame
    seen: set[int] = set()

    def _release(obj) -> None:
        if obj is None or id(obj) in seen:
            return
        seen.add(id(obj))
        if isinstance(obj, InvertedIndex):
            release_resident(obj)
            return
        owned = getattr(obj, "_resident_owned", None)
        if owned is not None:
            # unpersist only the frames make_env_resident itself
            # persisted (recorded there) — never caches other code
            # created on the same object (ADVICE r5)
            for n in owned:
                v = getattr(obj, n, None)
                if isinstance(v, DataFrame):
                    v.unpersist()
            obj._resident_owned = []
        else:
            for v in vars(obj).values():
                if isinstance(v, DataFrame):
                    v.unpersist()
        _release(getattr(obj, "index", None))

    for s in [env.index] + [s for s, _ in env.searchers]:
        _release(s)


def release_resident(index: InvertedIndex) -> None:
    """Unpersist the resident frames and drop the driver state (the
    shutdown path of a long-lived server)."""
    if index.resident is None:
        return
    for frame in (index.docs, index.terms, index.postings,
                  index.champions):
        if frame is not None:
            frame.unpersist()
    index.resident = None
