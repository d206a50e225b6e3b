"""NumPy reference-semantics oracle for rank identity (SURVEY.md §5.2.3).

Implements the reference's classic-search scoring end-to-end, densely and
single-threaded, exactly as specified in SURVEY.md §2.4.1:

1. corpus → document-term matrix → per-cell BM25 weights
   (/root/reference/src/embedder/interface.jl:79-99, [SA-public] math
   pinned in :mod:`garamond_jl_spark.config`),
2. per-document L2 normalization (vectors arrive normalized at the index,
   src/index/naive.jl:14-32 treats dot products as cosine),
3. query embedded as a pseudo-document against corpus statistics
   (src/embedder/dtv.jl:29-41), L2-normalized,
4. similarity = dot product; distance = 1 − sim (naive.jl:26-31),
5. score = 1 − tanh(alpha · dist) (src/search/index.jl:186-202),
6. stable top-k: score descending, ties by ascending doc index
   (Julia ``sortperm`` stability, naive.jl:30).

An OOV-only / empty query embeds to the zero vector and returns no hits
(src/embedder/dtv.jl:53-58 ``is_embedded`` gate, src/search/index.jl:106-113).

This module is the ground truth that the distributed engine must be
rank-identical to; it is deliberately simple (dense matrices) and only
suitable for small corpora.
"""

from __future__ import annotations

import numpy as np

from garamond_jl_spark.config import EngineConfig, bm25_weight, idf_weight, tf_weight
from garamond_jl_spark.functions.textprep import tokenize_with_config


class OracleIndex:
    """Dense in-memory index with reference scoring semantics."""

    def __init__(self, docs: list[str], cfg: EngineConfig,
                 doc_ids: list[int] | None = None):
        self.cfg = cfg
        self.doc_ids = list(doc_ids) if doc_ids is not None else list(range(len(docs)))
        token_lists = [tokenize_with_config(d, cfg) for d in docs]
        vocab: dict[str, int] = {}
        for toks in token_lists:
            for t in toks:
                vocab.setdefault(t, len(vocab))
        self.vocab = vocab
        n_docs, n_terms = len(docs), len(vocab)
        counts = np.zeros((n_docs, n_terms), dtype=np.float64)
        for i, toks in enumerate(token_lists):
            for t in toks:
                counts[i, vocab[t]] += 1.0
        self.counts = counts
        self.doclen = counts.sum(axis=1)                      # tokens per doc
        self.n_docs = float(n_docs)
        self.avgdl = float(self.doclen.mean()) if n_docs else 0.0
        self.df = (counts > 0).sum(axis=0).astype(np.float64)  # docs per term
        self.weights = self._weigh(counts, self.doclen)
        norms = np.linalg.norm(self.weights, axis=1)
        norms[norms == 0.0] = 1.0
        self.normed = self.weights / norms[:, None]
        if cfg.oov_policy == "large_vector" and n_terms:
            # E8 (dtv.jl:53-58): an all-OOV document embeds as the
            # constant DEFAULT_OOV_VAL vector; after L2 normalization
            # that is 1/√|V| in every component
            for i in np.nonzero(self.doclen == 0)[0]:
                self.normed[i, :] = 1.0 / np.sqrt(n_terms)

    def _weigh(self, counts: np.ndarray, doclen: np.ndarray) -> np.ndarray:
        cfg = self.cfg
        w = np.zeros_like(counts)
        rows, cols = counts.nonzero()
        for i, j in zip(rows, cols):
            if cfg.weighting == "count":
                w[i, j] = counts[i, j]
            elif cfg.weighting == "tf":
                w[i, j] = tf_weight(counts[i, j], doclen[i])
            elif cfg.weighting == "tfidf":
                w[i, j] = tf_weight(counts[i, j], doclen[i]) * idf_weight(self.n_docs, self.df[j])
            else:  # bm25
                w[i, j] = bm25_weight(counts[i, j], doclen[i], self.avgdl,
                                      self.n_docs, self.df[j],
                                      kappa=cfg.kappa, beta=cfg.beta)
        return w

    def embed_query(self, query: str) -> np.ndarray | None:
        """Query as pseudo-document (dtv.jl:29-41): count in-vocab tokens,
        doclen_q = total in-vocab count, same weighting, L2-normalize.
        Returns None when nothing embeds (OOV-only ⇒ 0 hits)."""
        toks = tokenize_with_config(query, self.cfg)
        qcounts = np.zeros(len(self.vocab), dtype=np.float64)
        for t in toks:
            j = self.vocab.get(t)
            if j is not None:
                qcounts[j] += 1.0
        qlen = qcounts.sum()
        if qlen == 0.0:
            return None
        qw = np.zeros_like(qcounts)
        cfg = self.cfg
        for j in qcounts.nonzero()[0]:
            if cfg.weighting == "count":
                qw[j] = qcounts[j]
            elif cfg.weighting == "tf":
                qw[j] = tf_weight(qcounts[j], qlen)
            elif cfg.weighting == "tfidf":
                qw[j] = tf_weight(qcounts[j], qlen) * idf_weight(self.n_docs, self.df[j])
            else:
                qw[j] = bm25_weight(qcounts[j], qlen, self.avgdl,
                                    self.n_docs, self.df[j],
                                    kappa=cfg.kappa, beta=cfg.beta)
        nrm = np.linalg.norm(qw)
        return qw / nrm if nrm > 0 else None

    def search(self, query: str, k: int) -> list[tuple[int, float]]:
        """Top-k (doc_id, score) with the reference score transform and
        stable doc-order tiebreak; empty for OOV-only queries."""
        qvec = self.embed_query(query)
        if qvec is None:
            return []
        sims = self.normed @ qvec                 # cosine (both normalized)
        dists = 1.0 - sims
        scores = 1.0 - np.tanh(self.cfg.score_alpha * dists)
        k = min(k, len(scores))
        # tiebreak on the DOC ID VALUE like the engine's ranking window
        # (positional ties diverge when doc_ids is not monotonic)
        ids = np.asarray(self.doc_ids)
        order = np.lexsort((ids, -scores))[:k]
        return [(self.doc_ids[i], float(scores[i])) for i in order]

    def bm25_additive_topk(self, query: str, k: int) -> list[tuple[int, float]]:
        """Classical additive Okapi BM25 (north-rule k1/b semantics, no
        cosine normalization): score(d) = Σ_{t∈q} bm25(t, d) · qtf(t).
        Kept alongside the cosine path so both scoring contracts are
        oracle-covered."""
        if self.cfg.weighting != "bm25":
            # self.weights follow cfg.weighting — under tf/tfidf this
            # method would silently return additive NON-bm25 scores
            # despite its name, a wrong ground truth for any consumer
            raise ValueError(
                f"bm25_additive_topk needs weighting='bm25' "
                f"(index built with {self.cfg.weighting!r})")
        toks = tokenize_with_config(query, self.cfg)
        qtf: dict[int, float] = {}
        for t in toks:
            j = self.vocab.get(t)
            if j is not None:
                qtf[j] = qtf.get(j, 0.0) + 1.0
        if not qtf:
            return []
        scores = np.zeros(int(self.n_docs))
        for j, qc in qtf.items():
            scores += self.weights[:, j] * qc
        mask = scores > 0
        idxs = np.nonzero(mask)[0]
        ids = np.asarray(self.doc_ids)[idxs]
        order = idxs[np.lexsort((ids, -scores[idxs]))][:k]
        return [(self.doc_ids[i], float(scores[i])) for i in order]
