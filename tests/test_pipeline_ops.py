"""LLM-data-pipeline operators: ANN search quality on structured data,
SimHash near-dup behavior, language-ID accuracy on real multilingual
text (the parity gate proves determinism; these prove usefulness)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from garamond_jl_spark.plans.pipeline_queries import ann_lsh_search


def _long_form(spark, mat):
    rows = [(int(vid), int(i) + 1, float(v))
            for vid, vec in enumerate(mat) for i, v in enumerate(vec)]
    return spark.createDataFrame(rows, "vec_id LONG, i INT, v DOUBLE")


def test_ann_clustered_recall(spark):
    """On clustered embeddings (the realistic case — real corpora
    cluster) multiprobe LSH keeps high recall while scanning a fraction
    of the corpus.  Uniform-random vectors are the adversarial case and
    are measured separately in BENCH.md."""
    rng = np.random.default_rng(7)
    n_clusters, per, dim = 20, 25, 16
    centers = rng.normal(size=(n_clusters, dim)) * 3.0
    mat = np.vstack([c + rng.normal(size=(per, dim)) * 0.3 for c in centers])
    u = _long_form(spark, mat)
    query_ids = [0, 25, 50, 250]
    k = 10
    got = ann_lsh_search(u, query_ids, k).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    recalls = []
    for qid in query_ids:
        cos = norm @ norm[qid]
        cos[qid] = -2.0
        order = sorted(range(len(cos)),
                       key=lambda i: (-round(cos[i], 6), i))[:k]
        recalls.append(len(set(order) & set(by_q.get(qid, []))) / k)
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_ivf_clustered_recall(spark):
    """IVF ANN (trained-quantizer path): with the true cluster centers
    as the coarse quantizer and 2 probes, recall on clustered
    embeddings stays high while scanning ~2/20 of the lists."""
    from garamond_jl_spark.plans.pipeline_queries import ann_ivf_search
    rng = np.random.default_rng(7)
    n_clusters, per, dim = 20, 25, 16
    centers = rng.normal(size=(n_clusters, dim)) * 3.0
    mat = np.vstack([c + rng.normal(size=(per, dim)) * 0.3 for c in centers])
    u = _long_form(spark, mat)
    cent = spark.createDataFrame(
        [(int(c), int(i) + 1, float(v)) for c, vec in enumerate(centers)
         for i, v in enumerate(vec)], "cid LONG, i INT, cv DOUBLE")
    query_ids = [0, 25, 50, 250]
    k = 10
    got = ann_ivf_search(u, query_ids, k, n_centroids=n_clusters,
                         n_probe=2, centroids=cent).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    recalls = []
    for qid in query_ids:
        cos = norm @ norm[qid]
        cos[qid] = -2.0
        order = sorted(range(len(cos)),
                       key=lambda i: (-round(cos[i], 6), i))[:k]
        recalls.append(len(set(order) & set(by_q.get(qid, []))) / k)
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_embedding_cosine_dedup_recall_injected(spark):
    """Multiprobe pair recall (the round-2 gap: a true near-dup pair
    split by ONE hyperplane was missed by the same-bucket join).  Inject
    near-identical vector pairs (cos > 0.95) into background noise and
    require >=0.99 recall at tau=0.95 from the DEFAULT probe radius."""
    from garamond_jl_spark.plans.pipeline_queries import \
        embedding_cosine_pairs
    rng = np.random.default_rng(11)
    dim, n_bg, n_pairs = 16, 300, 120
    bg = rng.normal(size=(n_bg, dim))
    base = rng.normal(size=(n_pairs, dim))
    # tiny perturbation => cosine ~0.997+, the near-identical regime
    twin = base + rng.normal(size=(n_pairs, dim)) * 0.03
    mat = np.vstack([bg, base, twin])
    u = _long_form(spark, mat)
    got = {(r["vec_a"], r["vec_b"])
           for r in embedding_cosine_pairs(u, threshold=0.95).collect()}
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    want = set()
    for j in range(n_pairs):
        a, b = n_bg + j, n_bg + n_pairs + j
        if float(norm[a] @ norm[b]) >= 0.95:
            want.add((a, b))
    assert len(want) >= 100            # the injection actually qualifies
    hit = len(want & got)
    assert hit / len(want) >= 0.99, (hit, len(want))
    # no false positives: every reported pair truly clears tau
    for a, b in got:
        assert float(norm[a] @ norm[b]) >= 0.95 - 1e-9


def test_ann_search_rank_matches_exact_on_candidates(spark):
    """Within its candidate set the LSH rerank is EXACT: every returned
    neighbor's cosine matches the NumPy value and ranks descend."""
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(80, 8))
    u = _long_form(spark, mat)
    got = sorted(ann_lsh_search(u, [3], 5).collect(),
                 key=lambda r: r["rnk"])
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for r in got:
        expect = float(norm[3] @ norm[r["vec_id"]])
        assert abs(r["cos_e6"] / 1e6 - expect) < 2e-6
    assert [r["rnk"] for r in got] == list(range(1, len(got) + 1))


def test_lang_id_accuracy_multilingual(spark):
    """The trigram-profile detector must classify real sentences in the
    five testdata languages, return 'und' for gibberish, and 'zh' via
    script detection."""
    from garamond_jl_spark.plans.pipeline_queries import _lang_id_df
    samples = [
        (0, "the cat sat on the mat and it was happy with this one", "en"),
        (1, "der hund ist nicht mit der katze und sie haben ein haus", "de"),
        (2, "le chien est dans la maison avec les enfants pour vous", "fr"),
        (3, "el perro está en la casa con los niños para que este bien", "es"),
        (4, "我们的朋友是一个好人他们了解这个世界", "zh"),
        (5, "xqzk vbnmp fjrd glorp zzyx", "und"),
        (6, "and they were there when all of this had not been done", "en"),
        (7, "nous sommes très heureux avec cette maison mais pas tout", "fr"),
    ]
    d = spark.createDataFrame([(i, t) for i, t, _ in samples],
                              "doc_id LONG, text STRING")
    got = {r["doc_id"]: r["pred_lang"] for r in _lang_id_df(d).collect()}
    expect = {i: lang for i, _, lang in samples}
    hits = sum(got[i] == expect[i] for i in expect)
    assert hits == len(samples), (got, expect)


def test_simhash_pairs_agree_with_minhash(spark):
    """The 64-bit SimHash near-dup pairs should substantially overlap
    the MinHash (Jaccard ≥ 0.8) ground truth on the testdata."""
    from garamond_jl_spark.plans.pipeline_queries import (dedup_minhash_lsh,
                                                          dedup_simhash_pairs)
    sf = "/root/testdata/sf0.01"
    mh = {(r["doc_a"], r["doc_b"]) for r in dedup_minhash_lsh(spark, sf).collect()}
    sh = {(r["doc_a"], r["doc_b"]) for r in dedup_simhash_pairs(spark, sf).collect()}
    assert len(sh & mh) / max(len(mh), 1) >= 0.5  # recall vs jaccard truth
    assert len(sh & mh) / max(len(sh), 1) >= 0.5  # precision


def test_boe_rank_identity_vs_numpy(spark):
    """BOE top-k rank identity vs a NumPy oracle implementing the same
    reference semantics (boe.jl sum-of-word-vectors, cosine knn):
    identical ids, scores within 1e-9."""
    from garamond_jl_spark.corpus import corpus_df
    from garamond_jl_spark.operators.semantic import (
        boe_topk, synthetic_word_vectors, word_vector_component)

    docs = [(r["doc_id"], r["content"]) for r in
            corpus_df(spark, 120, seed=5, partitions=2)
            .withColumn("doc_id", F.monotonically_increasing_id())
            .select("doc_id", "content").collect()]
    d = spark.createDataFrame(docs, "doc_id LONG, content STRING")
    tok = (d.select("doc_id", F.explode(F.split("content", " ")).alias("term"))
           .where(F.col("term") != ""))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dim, seed, k = 16, 0, 8
    wv = synthetic_word_vectors(tf.select("term"), dim=dim, seed=seed)

    # NumPy oracle
    vocab = sorted({t for _, text in docs for t in text.split(" ") if t})
    vecs = {t: np.array([word_vector_component(t, i, seed)
                         for i in range(1, dim + 1)]) for t in vocab}

    def np_topk(query):
        qtoks = [t for t in query.split(" ") if t and t in vecs]
        if not qtoks:
            return []
        qv = np.sum([vecs[t] for t in qtoks], axis=0)
        nq = np.linalg.norm(qv)
        out = []
        for did, text in docs:
            toks = [t for t in text.split(" ") if t in vecs]
            if not toks:
                continue
            dv = np.sum([vecs[t] for t in toks], axis=0)
            out.append((did, float(dv @ qv / (np.linalg.norm(dv) * nq))))
        out.sort(key=lambda x: (-round(x[1], 9), x[0]))
        return out[:k]

    for query in ["main run data", "free_4 decode_7", "get set value",
                  "zzz_oov_only"]:
        got = sorted(boe_topk(spark, tf, wv, query, k=k,
                              tiebreak_round=9).collect(),
                     key=lambda r: r["rank"])
        expect = np_topk(query)
        assert [r["doc_id"] for r in got] == [d_ for d_, _ in expect], query
        for r, (_, s) in zip(got, expect):
            assert abs(r["score"] - s) < 1e-9, (query, r, s)


def test_textrank_summary_goldens():
    from garamond_jl_spark.functions.summarize import (pagerank,
                                                       split_sentences,
                                                       textrank_summary)
    import numpy as np
    # hub sentence (shares vocab with everything) must rank first
    sents = ["alpha beta gamma delta", "alpha beta other words here",
             "gamma delta more tokens now", "unrelated zz qq ww vv"]
    got = textrank_summary(sents, ns=1)
    assert got == ["alpha beta gamma delta"]
    # ns >= n returns all usable sentences, document order kept
    assert textrank_summary(sents, ns=10) == sents
    # degenerate inputs pass through (reference catch branch)
    assert textrank_summary(["...", "!!!"], ns=1) == ["...", "!!!"]
    assert textrank_summary([], ns=1) == []
    # pagerank: symmetric star graph — hub gets the highest mass
    adj = np.array([[0, 1, 1, 1], [1, 0, 0, 0],
                    [1, 0, 0, 0], [1, 0, 0, 0]], dtype=float)
    p = pagerank(adj)
    assert p[0] == max(p) and abs(p.sum() - 1.0) < 1e-6
    assert split_sentences("One two. Three four! Five?") == \
        ["One two.", "Three four!", "Five?"]


def test_summarize_docs_spark(spark):
    from garamond_jl_spark.functions.summarize import summarize_docs
    d = spark.createDataFrame(
        [(1, "alpha beta gamma. alpha beta said more. gamma went on. "
             "nothing related here at all."),
         (2, "solo sentence only")],
        "doc_id LONG, text STRING")
    got = {r["doc_id"]: r["summary"] for r in
           summarize_docs(d, ns=1).collect()}
    assert got[1] == ["alpha beta gamma."]
    assert got[2] == ["solo sentence only"]


def test_loader_sampler_registries(spark):
    """S3: loaders/samplers resolve by name with safe fallbacks, like
    rankers/recommenders (reference custom-symbol dispatch)."""
    from garamond_jl_spark.plugins import (get_loader, get_sampler,
                                           register_sampler)
    assert get_loader("noop_loader")(spark).count() == 0
    assert get_loader(None).__name__ == "parquet_loader"
    assert get_loader("nonexistent").__name__ == "parquet_loader"

    @register_sampler("first_two")
    def first_two(df):
        return df.limit(2)

    d = spark.range(10)
    assert get_sampler("first_two")(d).count() == 2
    assert get_sampler(None)(d).count() == 10  # identity fallback


def test_probe_masks_honor_radius():
    """radius=0 is the plain same-bucket join, radius=3 probes the
    full Hamming-3 ball (the old version forced Hamming-1 in and
    silently capped at 2)."""
    from garamond_jl_spark.plans.pipeline_queries import _probe_masks
    assert _probe_masks(6, 0) == [0]
    r1 = _probe_masks(6, 1)
    assert sorted(r1) == [0, 1, 2, 4, 8, 16, 32]
    import math
    assert len(_probe_masks(6, 2)) == 1 + 6 + math.comb(6, 2)
    assert len(_probe_masks(6, 3)) == 1 + 6 + math.comb(6, 2) + \
        math.comb(6, 3)
    # all masks unique and within the plane width
    m3 = _probe_masks(6, 3)
    assert len(set(m3)) == len(m3) and max(m3) < 2 ** 6
