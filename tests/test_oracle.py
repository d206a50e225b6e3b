"""NumPy oracle sanity: hand-computed 3-doc example + invariants
(SURVEY.md §5.2.3 'unit-tested against hand-computed 3-doc examples')."""

import math

import numpy as np
import pytest

from garamond_jl_spark.config import (EngineConfig, bm25_weight, idf_weight,
                                      tf_weight)
from garamond_jl_spark.oracle import OracleIndex

DOCS = ["apple banana apple", "banana cherry", "cherry cherry cherry apple"]
CFG = EngineConfig(score_alpha=0.4)


def test_pinned_formulas():
    # tf = sqrt(2/3) for 'apple' in doc0 (count 2, len 3)
    assert tf_weight(2, 3) == pytest.approx(math.sqrt(2 / 3))
    # idf = log(3/(2+1)) + 1 = 1 for df=2, n=3
    assert idf_weight(3, 2) == pytest.approx(1.0)
    # bm25 with κ=2, β=0.75: doc0 len 3, avgdl = (3+2+4)/3 = 3
    tf = math.sqrt(2 / 3)
    expected = 1.0 * (3 * tf) / (2 * (1 - 0.75 + 0.75 * 3 / 3) + tf)
    assert bm25_weight(2, 3, 3.0, 3, 2) == pytest.approx(expected)


def test_hand_computed_scores():
    idx = OracleIndex(DOCS, CFG)
    assert idx.n_docs == 3 and idx.avgdl == pytest.approx(3.0)
    assert idx.df[idx.vocab["apple"]] == 2
    assert idx.df[idx.vocab["cherry"]] == 2
    hits = idx.search("apple", k=3)
    # docs 0 and 2 contain 'apple'; doc1 does not — but cosine scoring
    # still assigns doc1 a score (1 - tanh(0.4 * 1.0)) since dist = 1
    assert [h[0] for h in hits][:2] == [0, 2] or [h[0] for h in hits][0] == 0
    # doc0 has higher apple weight share than doc2
    assert hits[0][0] == 0
    # score = 1 - tanh(alpha * (1 - cos)) in (0, 1]
    assert all(0.0 < s <= 1.0 for _, s in hits)


def test_oov_query_empty():
    idx = OracleIndex(DOCS, CFG)
    assert idx.search("durian elderberry", k=5) == []
    assert idx.search("", k=5) == []


def test_tiebreak_stable():
    # two identical docs ⇒ identical scores ⇒ ascending doc index order
    idx = OracleIndex(["x y", "x y", "z"], CFG)
    hits = idx.search("x", k=3)
    assert hits[0][0] == 0 and hits[1][0] == 1
    assert hits[0][1] == pytest.approx(hits[1][1])


def test_additive_bm25_topk():
    idx = OracleIndex(DOCS, CFG)
    hits = idx.bm25_additive_topk("cherry", k=3)
    # doc2 (3×cherry) must outrank doc1 (1×cherry, shorter)
    ids = [h[0] for h in hits]
    assert set(ids) == {1, 2}
    w1 = bm25_weight(1, 2, 3.0, 3, 2)
    w2 = bm25_weight(3, 4, 3.0, 3, 2)
    assert hits[0][0] == (2 if w2 > w1 else 1)


def test_norms_unit():
    idx = OracleIndex(DOCS, CFG)
    norms = np.linalg.norm(idx.normed, axis=1)
    assert np.allclose(norms, 1.0)
