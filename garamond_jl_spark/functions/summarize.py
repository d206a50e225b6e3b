"""TextRank extractive summarization (reference F5).

Behavior-port of /root/reference/src/data/text.jl:51-74 ``summarize``:
sentences → prepare/filter → tf-idf document-term matrix → unweighted
graph with an edge where the sentence tf-idf dot product is nonzero →
PageRank (α=0.85, 100 iterations, ε=1e-6) → top-``ns`` sentences
re-sorted into document order.  On any degenerate input (no usable
sentences) the original sentences are returned, like the reference's
catch branch.

Distributed shape: summarization is per-document work over a small
per-document sentence set, so the Spark operator is one Arrow-batched
``mapInPandas`` pass — the same boundary as tokenization (no shuffle;
each document is independent).  The per-document math is NumPy.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, StringType, StructField,
                               StructType)

PAGERANK_ALPHA = 0.85   # text.jl:61
PAGERANK_ITERS = 100    # text.jl:62
PAGERANK_EPS = 1.0e-6   # text.jl:63

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")
_TOKEN = re.compile(r"[a-z0-9_]+")
_HAS_ALNUM = re.compile(r"[a-zA-Z0-9]")


def split_sentences(text: str) -> list[str]:
    """Punctuation-boundary sentence split (the reference receives
    pre-split sentences from its loaders; this is the equivalent
    splitter for raw text)."""
    return [s for s in _SENT_SPLIT.split(text or "") if s.strip()]


def pagerank(adj: np.ndarray, alpha: float = PAGERANK_ALPHA,
             n_iter: int = PAGERANK_ITERS,
             eps: float = PAGERANK_EPS) -> np.ndarray:
    """Unweighted PageRank power iteration over a 0/1 adjacency matrix
    (dangling nodes distribute uniformly)."""
    n = adj.shape[0]
    deg = adj.sum(axis=1)
    p = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        spread = np.where(deg > 0, p / np.maximum(deg, 1), 0.0)
        nxt = adj.T @ spread
        dangling = p[deg == 0].sum() / n
        nxt = (1 - alpha) / n + alpha * (nxt + dangling)
        if np.abs(nxt - p).sum() < eps:
            p = nxt
            break
        p = nxt
    return p


def textrank_summary(sentences: list[str], ns: int = 1) -> list[str]:
    """Reference summarize: returns ``ns`` top-ranked sentences in
    document order; degenerate inputs return the sentences unchanged
    (text.jl:70-73 catch branch)."""
    usable = [(i, s) for i, s in enumerate(sentences)
              if _HAS_ALNUM.search(s)]
    if len(usable) == 0:
        return list(sentences)
    if len(usable) <= ns:
        return [s for _, s in usable]
    toks = [_TOKEN.findall(s.lower()) for _, s in usable]
    vocab = sorted({t for ts in toks for t in ts})
    if not vocab:
        return list(sentences)
    v_ix = {t: j for j, t in enumerate(vocab)}
    m = np.zeros((len(usable), len(vocab)))
    for i, ts in enumerate(toks):
        for t in ts:
            m[i, v_ix[t]] += 1.0
    # [SA-public] tf-idf over the sentence DTM: sqrt-tf × (log(n/df)+1)
    dl = np.maximum(m.sum(axis=1, keepdims=True), 1.0)
    tf = np.sqrt(m / dl)
    df = (m > 0).sum(axis=0)
    idf = np.log(len(usable) / (df + 1.0)) + 1.0
    w = tf * idf
    sim = w @ w.T
    np.fill_diagonal(sim, 0.0)
    adj = (sim > 0).astype(float)
    p = pagerank(adj)
    order = sorted(range(len(usable)), key=lambda i: (-p[i], i))[:ns]
    return [usable[i][1] for i in sorted(order)]


def summarize_docs(docs: DataFrame, ns: int = 1, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Distributed F5: (<id_col>, summary array<string>) — one Arrow
    pass, per-document TextRank.  The id field keeps the INPUT column's
    name and type (a string/int id declared as the module's LongType
    default would fail the Arrow schema check)."""
    schema = StructType([docs.schema[id_col],
                         StructField("summary",
                                     ArrayType(StringType()), False)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out_id, out_sum = [], []
            for doc_id, text in zip(b[id_col], b[text_col]):
                out_id.append(doc_id)
                out_sum.append(textrank_summary(split_sentences(text), ns))
            yield pd.DataFrame({id_col: out_id, "summary": out_sum})

    return docs.select(id_col, text_col).mapInPandas(run, schema)
