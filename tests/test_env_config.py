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
    search_index=hnsw gets the LSH candidate index attached (the
    distributed stand-in, SURVEY §7.6) and the mixed env still answers
    the request with the exact top-10 of the full-scan env; a classic
    searcher warns and ignores the knob."""
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
         "search_index_arguments": {"n_planes": 6, "radius": 3,
                                    "seed": 0}})
    env = build_search_env(spark, _write(tmp_path, cfg))
    assert env.searchers[0][0].candidate_index is not None

    exact_cfg = _base_config()
    exact_cfg["embedders"] = cfg["embedders"]
    exact_cfg["searchers"] = [dict(cfg["searchers"][0]),
                              {"id": "searcher_2",
                               "data_embedder": "embedder_2",
                               "score_alpha": 0.4, "score_weight": 0.8}]
    env_e = build_search_env(spark, _write(tmp_path, exact_cfg))

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
