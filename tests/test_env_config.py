"""Config-file environment build (reference env.jl:29-83 build_search_env
+ config_parser.jl:62-360 validation).

The JSON fixture mirrors the reference's test config shapes
(test/configs/configgenerator.jl): config 1 = one classic searcher;
config 2 = classic + word2vec/BOE searcher aggregated in one env."""

import json

import pytest
from pyspark.sql import functions as F

from garamond_jl_spark.config import EngineConfig
from garamond_jl_spark.plans.env_config import (ConfigError,
                                                build_search_env,
                                                parse_configuration)
from garamond_jl_spark.plans.lifecycle import InternalRequest, SearchEnv
from garamond_jl_spark.plans.lifecycle import search as lsearch

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _write(tmp_path, cfg: dict) -> str:
    p = tmp_path / "env.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def _base_config() -> dict:
    return {
        "data_loader_name": "parquet_loader",
        "data_loader_arguments": [DOCS],
        "data_sampler_name": "identity_sampler",
        "id_key": "doc_id",
        "aggregation": "mean",
        "embedders": [
            {"id": "embedder_1", "vectors": "bm25",
             "embeddable_fields": ["text"]},
        ],
        "searchers": [
            {"id": "searcher_1", "data_embedder": "embedder_1",
             "score_alpha": 0.4, "score_weight": 1.0},
        ],
    }


def test_env_from_json_drives_combined_search_filter(spark, tmp_path):
    """The config-built env answers the combined search+filter request
    (the driver-gate lifecycle query) identically to a directly
    constructed environment over the same data + config."""
    from garamond_jl_spark.operators.build import build_index
    env = build_search_env(spark, _write(tmp_path, _base_config()))
    req = InternalRequest(query='spark join data lang:"en"',
                          max_matches=10, tiebreak_round=6)
    got = sorted(lsearch(env, req).collect(), key=lambda r: r["rank"])

    docs = spark.read.parquet(DOCS)
    idx = build_index(spark, docs, EngineConfig(score_alpha=0.4),
                      id_col="doc_id", text_col="text")
    direct = SearchEnv(spark=spark, index=idx)
    want = sorted(lsearch(direct, req).collect(), key=lambda r: r["rank"])
    assert [(r["doc_id"], r["rank"]) for r in got] == \
        [(r["doc_id"], r["rank"]) for r in want]
    for a, b in zip(got, want):
        assert a["score"] == pytest.approx(b["score"], abs=1e-12)
    assert len(got) == 10


def test_env_from_json_heterogeneous_config2(spark, tmp_path):
    """Config-2 shape from one JSON file: classic BM25 + word2vec/BOE
    under :mean aggregation — identical to the hand-assembled
    heterogeneous env."""
    from garamond_jl_spark.operators.build import build_index
    from garamond_jl_spark.operators.semantic import (
        BOESearcher, synthetic_word_vectors)
    cfg = _base_config()
    cfg["embedders"].append(
        {"id": "embedder_2", "vectors": "word2vec",
         "doc2vec_method": "boe", "vectors_dimension": 16,
         "embeddings_seed": 0, "embeddable_fields": ["text"]})
    cfg["searchers"][0]["score_weight"] = 0.8
    cfg["searchers"].append(
        {"id": "searcher_2", "data_embedder": "embedder_2",
         "score_alpha": 0.4, "score_weight": 0.8})
    env = build_search_env(spark, _write(tmp_path, cfg))
    req = InternalRequest(query="spark join data", max_matches=10,
                          tiebreak_round=6)
    got = sorted(lsearch(env, req).collect(), key=lambda r: r["rank"])

    docs = spark.read.parquet(DOCS)
    idx = build_index(spark, docs, EngineConfig(score_alpha=0.4),
                      id_col="doc_id", text_col="text")
    tok = (docs.select("doc_id", F.explode(F.split("text", " "))
                       .alias("term")).where(F.col("term") != ""))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    wv = synthetic_word_vectors(tf.select("term"), dim=16, seed=0)
    boe = BOESearcher.from_tokens(tf, wv, score_alpha=0.4)
    direct = SearchEnv(spark=spark, index=idx, score_weight=0.8,
                       searchers=[(boe, 0.8)], aggregation="mean")
    want = sorted(lsearch(direct, req).collect(), key=lambda r: r["rank"])
    assert [(r["doc_id"], r["rank"]) for r in got] == \
        [(r["doc_id"], r["rank"]) for r in want]
    for a, b in zip(got, want):
        assert a["score"] == pytest.approx(b["score"], abs=1e-9)


def test_env_from_json_rp_transform_searcher(spark, tmp_path):
    """A bm25+rp embedder (config-2 embedder_1 shape) builds an RP
    dense searcher next to the classic index and the env still answers
    queries."""
    cfg = _base_config()
    cfg["embedders"].append(
        {"id": "embedder_rp", "vectors": "bm25",
         "vectors_transform": "rp", "vectors_dimension": 16,
         "embeddable_fields": ["text"]})
    cfg["searchers"].append(
        {"id": "searcher_rp", "data_embedder": "embedder_rp",
         "score_alpha": 0.4, "score_weight": 0.8})
    env = build_search_env(spark, _write(tmp_path, cfg))
    assert len(env.searchers) == 1
    from garamond_jl_spark.operators.semantic import RPSearcher
    assert isinstance(env.searchers[0][0], RPSearcher)
    req = InternalRequest(query="spark join data", max_matches=5)
    got = lsearch(env, req).collect()
    assert len(got) == 5


# ---- validation: structural errors abort (config_parser.jl:324-360) ----

def test_config_errors(spark, tmp_path):
    c = _base_config()
    c["searchers"] = []
    with pytest.raises(ConfigError, match="No searcher"):
        parse_configuration(_write(tmp_path, c))

    c = _base_config()
    c["embedders"] = []
    with pytest.raises(ConfigError, match="No embedder"):
        parse_configuration(_write(tmp_path, c))

    c = _base_config()
    c["searchers"].append(dict(c["searchers"][0]))
    with pytest.raises(ConfigError, match="not unique"):
        parse_configuration(_write(tmp_path, c))

    c = _base_config()
    c["searchers"][0]["data_embedder"] = "nope"
    with pytest.raises(ConfigError, match="unknown"):
        parse_configuration(_write(tmp_path, c))

    with pytest.raises(ConfigError, match="not found"):
        parse_configuration(str(tmp_path / "missing.json"))

    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    with pytest.raises(ConfigError, match="could not parse"):
        parse_configuration(str(bad))

    c = _base_config()
    c["id_key"] = "no_such_column"
    with pytest.raises(ConfigError, match="id_key"):
        build_search_env(spark, _write(tmp_path, c))


def test_config_soft_defaults_warn(tmp_path):
    """Value-level problems default with a warning, like the reference
    (config_parser.jl @warn + default)."""
    c = _base_config()
    c["embedders"][0]["vectors"] = "quantum"
    c["aggregation"] = "sum"
    with pytest.warns(UserWarning):
        parsed = parse_configuration(_write(tmp_path, c))
    assert parsed["embedders"][0]["vectors"] == "bm25"
    assert parsed["aggregation"] == "mean"


def test_env_custom_id_key(spark, tmp_path):
    """A config whose data id column is NOT named doc_id builds and
    searches: the engine addresses the index docs table uniformly as
    doc_id (build_index renames id_col), while env.id_key records the
    raw column name (the round-3 advice regression: lifecycle used to
    read F.col(env.id_key) off the renamed docs table and every search
    raised an unresolved-column error)."""
    src = str(tmp_path / "renamed.parquet")
    (spark.read.parquet(DOCS)
     .withColumnRenamed("doc_id", "uid").write.parquet(src))
    c = _base_config()
    c["data_loader_arguments"] = [src]
    c["id_key"] = "uid"
    env = build_search_env(spark, _write(tmp_path, c))
    assert env.id_key == "uid"

    # search plan + combined filter plan + filter-only plan all run
    req = InternalRequest(query='spark join data lang:"en"',
                          max_matches=10, tiebreak_round=6)
    got = lsearch(env, req).collect()
    assert len(got) == 10

    base = build_search_env(spark, _write(tmp_path, _base_config()))
    want = lsearch(base, req).collect()
    assert sorted((r["doc_id"], r["rank"]) for r in got) == \
        sorted((r["doc_id"], r["rank"]) for r in want)

    fo = InternalRequest(query='lang:"en"', max_matches=5)
    assert lsearch(env, fo).count() == 5


def test_env_search_index_ann_backed(spark, tmp_path):
    """The search_index config knob (reference configgenerator.jl
    :ivfadc/:hnsw searchers): a semantic searcher built from JSON with
    search_index=hnsw gets sharded HNSW graphs attached (the real
    hnsw.jl counterpart) AND the family's Euclidean rerank
    (hnsw.jl:33) — so with an exhaustive ef the mixed env answers
    identically to a search_index=brutetree env (the exact Euclidean
    full scan, brutetree.jl:20-28); a classic searcher warns and
    ignores the knob; unknown index kwargs soft-default away."""
    from garamond_jl_spark.operators.ann import HNSWCandidateIndex
    cfg = _base_config()
    cfg["embedders"].append(
        {"id": "embedder_2", "vectors": "word2vec",
         "doc2vec_method": "boe", "vectors_dimension": 16,
         "embeddings_seed": 0, "embeddable_fields": ["text"]})
    cfg["searchers"][0]["score_weight"] = 0.8
    cfg["searchers"].append(
        {"id": "searcher_2", "data_embedder": "embedder_2",
         "score_alpha": 0.4, "score_weight": 0.8,
         "search_index": "hnsw",
         "search_index_arguments": {"n_shards": 4, "M": 8,
                                    "ef_construction": 100, "ef": 5000,
                                    "seed": 0, "radius": 3}})
    with pytest.warns(UserWarning, match="radius.*unknown to the hnsw"):
        env = build_search_env(spark, _write(tmp_path, cfg))
    s2 = env.searchers[0][0]
    assert isinstance(s2.candidate_index, HNSWCandidateIndex)
    assert s2.metric == "euclidean"
    assert s2.candidate_index.normalize is False    # euclid graph

    exact_cfg = _base_config()
    exact_cfg["embedders"] = cfg["embedders"]
    exact_cfg["searchers"] = [dict(cfg["searchers"][0]),
                              {"id": "searcher_2",
                               "data_embedder": "embedder_2",
                               "score_alpha": 0.4, "score_weight": 0.8,
                               "search_index": "brutetree"}]
    env_e = build_search_env(spark, _write(tmp_path, exact_cfg))
    assert env_e.searchers[0][0].metric == "euclidean"
    assert env_e.searchers[0][0].candidate_index is None

    req = InternalRequest(query="spark join data", max_matches=10,
                          tiebreak_round=6)
    got = sorted(lsearch(env, req).collect(), key=lambda r: r["rank"])
    want = sorted(lsearch(env_e, req).collect(), key=lambda r: r["rank"])
    assert [(r["doc_id"], r["rank"]) for r in got] == \
        [(r["doc_id"], r["rank"]) for r in want]

    # classic searcher: knob warns + no-ops
    c2 = _base_config()
    c2["searchers"][0]["search_index"] = "ivfadc"
    with pytest.warns(UserWarning, match="dense searchers only"):
        env2 = build_search_env(spark, _write(tmp_path, c2))
    assert not env2.searchers


def test_reindex_searchers_selective(spark, tmp_path):
    """env_operator :reindex (env_operations.jl:35-64): a config-built
    env rebuilds ONE searcher by its config id — the untouched searcher
    object is carried across identically (reference keeps
    env.searchers[i] as-is) — and answers the same afterwards; '*'
    rebuilds everything; unknown ids and non-config envs raise."""
    from garamond_jl_spark.plans.env_config import reindex_searchers
    cfg = _base_config()
    cfg["embedders"].append(
        {"id": "embedder_2", "vectors": "word2vec",
         "doc2vec_method": "boe", "vectors_dimension": 16,
         "embeddings_seed": 0, "embeddable_fields": ["text"]})
    cfg["searchers"].append(
        {"id": "searcher_2", "data_embedder": "embedder_2",
         "score_alpha": 0.4, "score_weight": 0.8})
    env = build_search_env(spark, _write(tmp_path, cfg))
    assert env.searcher_ids == ["searcher_1", "searcher_2"]
    req = InternalRequest(query="spark join data", max_matches=5,
                          tiebreak_round=6)
    before = [(r["doc_id"], r["rank"]) for r in
              sorted(lsearch(env, req).collect(), key=lambda r: r["rank"])]

    kept_boe = env.searchers[0][0]
    new = reindex_searchers(env, "searcher_1")
    assert new.searchers[0][0] is kept_boe        # untouched carried as-is
    assert new.index is not env.index             # selected one rebuilt
    after = [(r["doc_id"], r["rank"]) for r in
             sorted(lsearch(new, req).collect(), key=lambda r: r["rank"])]
    assert after == before

    star = reindex_searchers(env, "*")            # full rebuild
    assert star.searchers[0][0] is not kept_boe
    assert [(r["doc_id"], r["rank"]) for r in
            sorted(lsearch(star, req).collect(),
                   key=lambda r: r["rank"])] == before

    with pytest.raises(ConfigError, match="no searcher with id"):
        reindex_searchers(env, "nope")
    with pytest.raises(ConfigError, match="config-built"):
        reindex_searchers(SearchEnv(spark=spark, index=env.index),
                          "searcher_1")


def test_doc2vec_methods_build_and_search(spark, tmp_path):
    """doc2vec_method ∈ {sif, borep, cpmean, disc} builds the matching
    env searcher class (config_parser.jl:186-214's semantic dispatch —
    these used to soft-default to boe) and each mixed env answers a
    request."""
    from garamond_jl_spark.operators.semantic import (
        BOREPSearcher, CPMeanSearcher, DisCSearcher, SIFSearcher)
    classes = {"sif": SIFSearcher, "borep": BOREPSearcher,
               "cpmean": CPMeanSearcher, "disc": DisCSearcher}
    c = _base_config()
    for m in classes:
        c["embedders"].append(
            {"id": f"e_{m}", "vectors": "word2vec", "doc2vec_method": m,
             "vectors_dimension": 8, "borep_dimension": 12,
             "embeddable_fields": ["text"]})
        c["searchers"].append(
            {"id": f"s_{m}", "data_embedder": f"e_{m}",
             "score_weight": 0.5})
    env = build_search_env(spark, _write(tmp_path, c))
    got = {sid: type(s) for sid, (s, _) in
           zip(env.searcher_ids[1:], env.searchers)}
    for m, cls in classes.items():
        assert got[f"s_{m}"] is cls
    req = InternalRequest(query="spark join data", max_matches=5,
                          tiebreak_round=6)
    assert lsearch(env, req).count() == 5
    # knobs landed on the built searchers
    sif = env.searchers[0][0]
    assert isinstance(sif, SIFSearcher) and sif.alpha == 0.01
    borep = env.searchers[1][0]
    assert (borep.dim_out, borep.pooling) == (12, "sum")
    disc = env.searchers[3][0]
    assert disc.n == 2


def test_new_knob_soft_defaults_warn(tmp_path):
    """Round-4 key coverage: every value-level problem defaults with a
    warning (config_parser.jl's @warn+default), structural ones raise."""
    c = _base_config()
    c["vectors_eltype"] = "Float16"
    c["embedders"][0]["language"] = "klingon"
    c["embedders"][0]["stem_words"] = False
    c["embedders"].append(
        {"id": "e2", "vectors": "word2vec", "doc2vec_method": "wrong",
         "sif_alpha": 0.02, "embedder_kwarguments": "not-a-dict",
         "embeddable_fields": ["text"]})
    c["embedders"].append(
        {"id": "e3", "vectors": "word2vec", "doc2vec_method": "borep",
         "borep_dimension": -3, "borep_pooling_function": "median",
         "embeddable_fields": ["text"]})
    c["embedders"].append(
        {"id": "e4", "vectors": "word2vec", "doc2vec_method": "disc",
         "disc_ngram": 0, "embeddable_fields": ["text"]})
    c["searchers"].append(
        {"id": "s2", "data_embedder": "e2", "heuristic": "soundex",
         "search_index_arguments": [1, 2],
         "search_index_kwarguments": {"n_planes": 4},
         "indexable_fields": "text"})
    with pytest.warns(UserWarning):
        parsed = parse_configuration(_write(tmp_path, c))
    assert parsed["vectors_eltype"] == "Float64"
    e1, e2, e3, e4 = parsed["embedders"]
    assert e1["language"] == "english" and e1["stem_words"] is False
    assert e2["doc2vec_method"] == "boe"          # invalid → default
    assert e2["sif_alpha"] == 0.02                # valid value kept
    assert e2["embedder_kwarguments"] == {}
    # borep/disc knobs validate INSIDE their method branch only
    # (config_parser.jl:199-213)
    assert e3["borep_dimension"] == 1024
    assert e3["borep_pooling_function"] == "sum"
    assert e4["disc_ngram"] == 2
    s2 = parsed["searchers"][1]
    assert s2["heuristic"] is None
    assert s2["search_index_arguments"] == {"n_planes": 4}
    assert s2["indexable_fields"] is None
    assert s2["input_embedder"] == "e2"           # defaults to data


def test_glove_binary_without_vocabulary_drops_embedder(tmp_path):
    """config_parser.jl:192-197: binary GloVe embeddings without a
    vocabulary file error inside the per-embedder try — the embedder is
    IGNORED; a searcher referencing it then fails the structural
    unknown-embedder check."""
    c = _base_config()
    c["embedders"].append(
        {"id": "e_glove", "vectors": "glove", "embeddings_kind": "binary",
         "embeddable_fields": ["text"]})
    with pytest.warns(UserWarning, match="glove_vocabulary"):
        parsed = parse_configuration(_write(tmp_path, c))
    assert [e["id"] for e in parsed["embedders"]] == ["embedder_1"]
    c["searchers"].append({"id": "s_g", "data_embedder": "e_glove"})
    with pytest.warns(UserWarning):
        with pytest.raises(ConfigError, match="unknown"):
            parse_configuration(_write(tmp_path, c))


def test_unknown_input_embedder_is_structural(tmp_path):
    """config_parser.jl:344-350 validates input embedder ids too."""
    c = _base_config()
    c["searchers"][0]["input_embedder"] = "ghost"
    with pytest.raises(ConfigError, match="unknown"):
        parse_configuration(_write(tmp_path, c))


def test_input_embedder_binds_query_side(spark, tmp_path):
    """searcher.jl:163: the QUERY embeds through input_embedder.  A BOE
    data searcher with a SIF input embedder of the same dimensionality
    must produce the SIF query vector; a dimension mismatch warns and
    keeps the data embedder."""
    from garamond_jl_spark.operators.semantic import SIFSearcher
    c = _base_config()
    c["embedders"] += [
        {"id": "e_boe", "vectors": "word2vec", "doc2vec_method": "boe",
         "vectors_dimension": 8, "embeddable_fields": ["text"]},
        {"id": "e_sif", "vectors": "word2vec", "doc2vec_method": "sif",
         "vectors_dimension": 8, "embeddable_fields": ["text"]},
        {"id": "e_wide", "vectors": "word2vec", "doc2vec_method": "boe",
         "vectors_dimension": 4, "embeddable_fields": ["text"]},
    ]
    c["searchers"].append(
        {"id": "s_x", "data_embedder": "e_boe", "input_embedder": "e_sif",
         "score_weight": 0.5})
    env = build_search_env(spark, _write(tmp_path, c))
    xs = env.searchers[0][0]
    # query vector comes from the SIF instance bound over embed_query
    ref = SIFSearcher.from_tokens(
        xs.doc_embeddings.sparkSession.read.parquet(DOCS)
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("doc_id", "term").agg(F.count("*").alias("tf")),
        xs.word_vectors)
    q = "spark join data"
    got = {r["i"]: r["qv"] for r in xs.embed_query(env.spark, q).collect()}
    want = {r["i"]: r["qv"] for r in ref.embed_query(env.spark, q).collect()}
    assert got == pytest.approx(want)
    req = InternalRequest(query=q, max_matches=5, tiebreak_round=6)
    assert lsearch(env, req).count() == 5

    c["searchers"][-1]["input_embedder"] = "e_wide"     # 4 ≠ 8 dims
    with pytest.warns(UserWarning, match="dimensionality"):
        env2 = build_search_env(spark, _write(tmp_path, c))
    ys = env2.searchers[0][0]
    boe_q = {r["i"]: r["qv"]
             for r in ys.embed_query(env2.spark, q).collect()}
    assert set(boe_q) and boe_q != pytest.approx(want)  # fell back to BOE


def test_vectors_eltype_float32_quantizes_storage(spark, tmp_path):
    """vectors_eltype=Float32 quantizes dense doc-embedding storage to
    f32 precision (every stored dv survives a float32 round-trip);
    the default Float64 stores exact doubles."""
    import numpy as np
    c = _base_config()
    c["vectors_eltype"] = "float32"
    c["embedders"].append(
        {"id": "e_b", "vectors": "word2vec", "doc2vec_method": "boe",
         "vectors_dimension": 8, "embeddable_fields": ["text"]})
    c["searchers"].append(
        {"id": "s_b", "data_embedder": "e_b", "score_weight": 0.5})
    env = build_search_env(spark, _write(tmp_path, c))
    vals = [r["dv"] for r in
            env.searchers[0][0].doc_embeddings.limit(200).collect()]
    assert vals and all(float(np.float32(v)) == v for v in vals)


def test_heuristic_gates_suggestions(spark, tmp_path):
    """The primary searcher's ``heuristic`` drives suggestion behavior
    (reference DEFAULT_HEURISTIC=nothing ⇒ NO suggestions even when the
    request asks; an explicit heuristic turns them on with its
    distance)."""
    import json as _json
    from garamond_jl_spark.plans.lifecycle import response_json
    c = _base_config()
    env_off = build_search_env(spark, _write(tmp_path, c))
    assert env_off.suggest_metric is None
    req = InternalRequest(query="spak join", max_suggestions=3)
    out = _json.loads(response_json(env_off, req))
    assert out["suggestions"] == {}

    c["searchers"][0]["heuristic"] = "levenshtein"
    env_on = build_search_env(spark, _write(tmp_path, c))
    assert env_on.suggest_metric == "levenshtein"
    out = _json.loads(response_json(env_on, req))
    assert "spak" in out["suggestions"]


def test_text_strip_flags_names(spark, tmp_path):
    """text_strip_flags as flag NAMES (the portable form of the
    reference's StringAnalysis bitmask, interface.jl:63) drive the
    classic embedder's textprep: strip_numbers removes digit runs from
    the vocabulary; an integer mask warns and is ignored; unknown names
    warn and are dropped."""
    c = _base_config()
    c["embedders"][0]["text_strip_flags"] = [
        "strip_case", "strip_accents", "strip_punctuation",
        "strip_numbers"]
    env = build_search_env(spark, _write(tmp_path, c))
    vocab = [r["term"] for r in env.index.terms.limit(2000).collect()]
    assert vocab and not any(any(ch.isdigit() for ch in t)
                             for t in vocab)

    c["embedders"][0]["text_strip_flags"] = ["strip_case", "strip_html"]
    with pytest.warns(UserWarning, match="unknown text_strip_flags"):
        parsed = parse_configuration(_write(tmp_path, c))
    assert parsed["embedders"][0]["text_strip_flags"] == ["strip_case"]

    c["embedders"][0]["text_strip_flags"] = 0x0f
    with pytest.warns(UserWarning, match="not portable"):
        parsed = parse_configuration(_write(tmp_path, c))
    assert parsed["embedders"][0]["text_strip_flags"] is None


def test_stem_words_builds_stemmed_index(spark, tmp_path):
    """stem_words=true (english) Porter-stems the classic vocabulary at
    build AND query — a query inflection matches documents that only
    contain other inflections of the stem.  Since round 5 german/french
    stem too (Snowball, functions/snowball.py —
    tests/test_stemmer_languages.py); only languages WITHOUT a shipped
    stemmer (romanian/italian/dutch) warn stemming off."""
    c = _base_config()
    c["embedders"][0]["stem_words"] = True
    env = build_search_env(spark, _write(tmp_path, c))
    assert env.index.cfg.stem_words is True
    vocab = {r["term"] for r in env.index.terms.collect()}
    # the testdata corpus contains "windows"/"sorted" style inflections;
    # a stemmed vocabulary must not keep both an -s form and its stem
    assert not any(t.endswith("s") and t[:-1] in vocab for t in vocab
                   if len(t) > 3)

    c["embedders"][0]["language"] = "german"
    parsed = parse_configuration(_write(tmp_path, c))   # no warning now
    assert parsed["embedders"][0]["stem_words"] is True
    c["embedders"][0]["language"] = "italian"
    with pytest.warns(UserWarning, match="no shipped stemmer"):
        parsed = parse_configuration(_write(tmp_path, c))
    assert parsed["embedders"][0]["stem_words"] is False


def test_custom_weights_rescale_searchers(spark, tmp_path):
    """results.jl:79: request-level custom_weights multiply each
    searcher's score_weight by its config id at aggregation — a request
    weighting the dense searcher 2x must equal the env built with the
    doubled score_weight; unknown ids are weight 1."""
    c = _base_config()
    c["embedders"].append(
        {"id": "e_b", "vectors": "word2vec", "doc2vec_method": "boe",
         "vectors_dimension": 8, "embeddable_fields": ["text"]})
    c["searchers"].append(
        {"id": "s_b", "data_embedder": "e_b", "score_weight": 0.4})
    env = build_search_env(spark, _write(tmp_path, c))
    req = InternalRequest(query="spark join data", max_matches=8,
                          tiebreak_round=9,
                          custom_weights={"s_b": 2.0, "ghost": 9.0})
    got = [(r["doc_id"], round(r["score"], 9)) for r in
           sorted(lsearch(env, req).collect(), key=lambda r: r["rank"])]

    c["searchers"][1]["score_weight"] = 0.8
    env2 = build_search_env(spark, _write(tmp_path, c))
    want = [(r["doc_id"], round(r["score"], 9)) for r in
            sorted(lsearch(env2, InternalRequest(
                query="spark join data", max_matches=8,
                tiebreak_round=9)).collect(), key=lambda r: r["rank"])]
    assert got == want


def test_int_embedder_ids_and_missing_data_embedder(spark, tmp_path):
    """Integer ids in the JSON are str()-coerced consistently on both
    the embedder and the reference side; a searcher without
    data_embedder is a clear ConfigError, not a TypeError."""
    cfg = _base_config()
    cfg["embedders"][0]["id"] = 1
    cfg["searchers"][0]["data_embedder"] = 1
    env = build_search_env(spark, _write(tmp_path, cfg))
    assert env.index.meta["n_docs"] > 0

    cfg2 = _base_config()
    del cfg2["searchers"][0]["data_embedder"]
    with pytest.raises(ConfigError, match="data_embedder"):
        parse_configuration(_write(tmp_path, cfg2))


def test_preserved_case_widens_token_pattern(spark, tmp_path):
    """lowercase=false (or text_strip_flags without strip_case) must
    not turn uppercase letters into token separators: 'Hello' indexes
    as one case-preserved token."""
    import pyspark.sql.functions as F
    cfg = _base_config()
    cfg["embedders"][0]["lowercase"] = False
    env = build_search_env(spark, _write(tmp_path, cfg))
    # rebuild over data containing capitalized text via the same cfg
    from garamond_jl_spark.plans.env_config import parse_configuration
    docs = spark.createDataFrame([(1, "Hello World"), (2, "hello world")],
                                 "doc_id LONG, text STRING")
    from garamond_jl_spark.operators.build import build_index
    idx = build_index(spark, docs, env.index.cfg, id_col="doc_id",
                      text_col="text")
    terms = {r["term"] for r in idx.terms.select("term").collect()}
    assert "Hello" in terms and "hello" in terms
    assert "ello" not in terms


def test_semantic_embedder_lowercases_like_reference(spark, tmp_path):
    """The dense path runs the case fold before embedding
    (embedder/interface.jl:171 prepare) — capitalized text must hit
    the lowercase word-vector vocabulary, not go OOV."""
    docs_path = str(tmp_path / "cap_docs.parquet")
    spark.createDataFrame([(1, "Spark Join Data"), (2, "spark join data"),
                           (3, "window merge")],
                          "doc_id LONG, text STRING") \
        .write.parquet(docs_path)
    cfg = _base_config()
    cfg["data_loader_arguments"] = [docs_path]
    cfg["embedders"].append(
        {"id": "sem", "vectors": "word2vec", "doc2vec_method": "boe",
         "vectors_dimension": 8, "embeddings_seed": 0,
         "embeddable_fields": ["text"]})
    cfg["searchers"].append(
        {"id": "s2", "data_embedder": "sem", "score_alpha": 0.4,
         "score_weight": 1.0})
    env = build_search_env(spark, _write(tmp_path, cfg))
    boe = env.searchers[0][0]
    embs = {r["doc_id"] for r in
            boe.doc_embeddings.select("doc_id").distinct().collect()}
    assert embs == {1, 2, 3}        # doc 1 embedded despite the caps
    import numpy as np
    e1 = sorted((r["i"], r["dv"]) for r in
                boe.doc_embeddings.where(F.col("doc_id") == 1).collect())
    e2 = sorted((r["i"], r["dv"]) for r in
                boe.doc_embeddings.where(F.col("doc_id") == 2).collect())
    assert np.allclose([v for _, v in e1], [v for _, v in e2])


def test_external_embeddings_infer_dim_and_kind_gate(spark, tmp_path):
    """An external parquet word-vector table's dim is inferred from its
    components (not the 16 fallback); a binary/text embeddings_kind
    with a path drops the embedder like the reference's per-embedder
    try."""
    wv_path = str(tmp_path / "wv.parquet")
    rows = [(t, i, 0.1 * i) for t in ("spark", "join", "data")
            for i in range(1, 25)]                       # 24-dim table
    spark.createDataFrame(rows, "term STRING, i INT, v DOUBLE") \
        .write.parquet(wv_path)
    cfg = _base_config()
    cfg["embedders"].append(
        {"id": "sem", "vectors": "word2vec", "doc2vec_method": "cpmean",
         "embeddings_path": wv_path, "embeddable_fields": ["text"]})
    cfg["searchers"].append(
        {"id": "s2", "data_embedder": "sem", "score_alpha": 0.4,
         "score_weight": 1.0})
    env = build_search_env(spark, _write(tmp_path, cfg))
    cp = env.searchers[0][0]
    # cpmean lays out 4 power-mean blocks of the TRUE dim
    assert cp.doc_embeddings.agg(F.max("i")).first()[0] == 4 * 24

    cfg2 = _base_config()
    cfg2["embedders"].append(
        {"id": "sem", "vectors": "word2vec", "doc2vec_method": "boe",
         "embeddings_path": wv_path, "embeddings_kind": "binary",
         "embeddable_fields": ["text"]})
    cfg2["searchers"].append(
        {"id": "s2", "data_embedder": "sem", "score_alpha": 0.4,
         "score_weight": 1.0})
    with pytest.raises(ConfigError, match="unknown"):
        # the dropped embedder leaves searcher s2 dangling — the
        # structural check reports it (per-embedder-try semantics)
        parse_configuration(_write(tmp_path, cfg2))
