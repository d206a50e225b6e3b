"""S6 REST transport (server/rest.py vs reference src/server/rest.jl):
endpoint routing, body → InternalRequest mapping, envop lifecycle, and
HTTP status semantics (200 / 400 / 501), exercised over a live
ThreadingHTTPServer with real engine responses."""

import json
import urllib.error
import urllib.request

import pytest

from garamond_jl_spark.config import EngineConfig
from garamond_jl_spark.operators.build import build_index
from garamond_jl_spark.plans.lifecycle import (InternalRequest, SearchEnv,
                                               response_json)
from garamond_jl_spark.server.rest import rest_server

SF = "/root/testdata/sf0.001"


def _get(url):
    try:
        with urllib.request.urlopen(url, timeout=30) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def _post(url, body, raw=None):
    data = raw if raw is not None else json.dumps(body).encode()
    req = urllib.request.Request(url, data=data,
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


@pytest.fixture(scope="module")
def env(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    idx = build_index(spark, docs, EngineConfig(score_alpha=0.4),
                      id_col="doc_id", text_col="text",
                      carry_cols=["text", "lang"])
    idx.postings.count()
    return SearchEnv(spark=spark, index=idx)


@pytest.fixture(scope="module")
def srv(env):
    s = rest_server(env)
    yield s
    s.shutdown()


def test_search_endpoint_matches_engine(srv, env):
    body = {"query": "spark join data", "max_matches": 5,
            "tiebreak_round": 6, "return_fields": ["lang"]}
    code, out = _post(f"{srv.url}/api/search", body)
    assert code == 200
    got = json.loads(out)
    want = json.loads(response_json(env, InternalRequest(
        query="spark join data", max_matches=5, tiebreak_round=6,
        return_fields=["lang"])))
    assert got == want
    assert got["results"] and "lang" in got["results"][0]
    assert [r["rank"] for r in got["results"]] == \
        list(range(1, len(got["results"]) + 1))


def test_rank_and_recommend_endpoints(srv):
    code, out = _post(f"{srv.url}/api/rank", {"rank_ids": [3, 1, 7]})
    assert code == 200
    res = json.loads(out)["results"]
    assert [r["doc_id"] for r in res] == [3, 1, 7]
    assert res[0]["score"] == pytest.approx(1.0)

    # return_fields picks the seed-row fields the recommender builds its
    # structured query from (all fields would include text:"<full doc>",
    # which matches only the seed itself)
    code, out = _post(f"{srv.url}/api/recommend",
                      {"recommend_id": 3, "max_matches": 5,
                       "return_fields": ["lang"]})
    assert code == 200
    res = json.loads(out)["results"]
    assert res and all(r["doc_id"] != 3 for r in res)


def test_status_semantics(srv):
    assert _get(f"{srv.url}/api/nope")[0] == 501
    assert _post(f"{srv.url}/api/nope", {})[0] == 501
    assert _post(f"{srv.url}/api/search", None, raw=b"{not json")[0] == 400
    assert _post(f"{srv.url}/api/search", {"max_matches": 5})[0] == 400
    assert _post(f"{srv.url}/api/rank", {"rank_ids": []})[0] == 400
    assert _post(f"{srv.url}/api/envop", {"cmd": "frobnicate"})[0] == 400

    code, out = _get(f"{srv.url}/api/read-configs")
    assert code == 200
    cfg = json.loads(out)
    # reference default κ=2.0 (defaults.jl:19 via REFERENCE_BM25_KAPPA)
    assert cfg["kappa"] == pytest.approx(2.0) and cfg["n_searchers"] == 1


def test_envop_save_load_reindex(srv, env, tmp_path):
    out_dir = str(tmp_path / "env_saved")
    code, out = _post(f"{srv.url}/api/envop",
                      {"cmd": "save", "cmd_argument": out_dir,
                       "text_col": "text"})
    assert code == 200 and json.loads(out)["envop"] == "save"

    n_before = env.index.meta["n_docs"]
    code, out = _post(f"{srv.url}/api/envop",
                      {"cmd": "load", "cmd_argument": out_dir})
    assert code == 200
    assert json.loads(out)["n_docs"] == n_before

    code, out = _post(f"{srv.url}/api/envop",
                      {"cmd": "reindex", "text_col": "text"})
    assert code == 200
    assert json.loads(out)["n_docs"] == n_before

    # the swapped-in env still answers searches identically
    code, out = _post(f"{srv.url}/api/search",
                      {"query": "spark join data", "max_matches": 3,
                       "tiebreak_round": 6})
    assert code == 200 and json.loads(out)["results"]


def test_kill_endpoint(env):
    s = rest_server(env)
    assert _get(f"{s.url}/api/kill")[0] == 200
    import time
    for _ in range(50):                      # server drains then refuses
        try:
            _get(f"{s.url}/api/read-configs")
            time.sleep(0.1)
        except (ConnectionError, urllib.error.URLError, OSError):
            break
    else:
        pytest.fail("server still accepting connections after /api/kill")


def test_envop_selective_reindex_config_env(spark, tmp_path):
    """POST /api/envop cmd=reindex with a searcher id: a config-built
    env rebuilds just that searcher (env_operations.jl:35-64) and keeps
    answering identically; unknown id → 400; non-config env (the module
    `srv` fixture) → 400 for per-searcher args (covered above)."""
    import json as _json

    from garamond_jl_spark.plans.env_config import build_search_env
    cfg = {
        "data_loader_name": "parquet_loader",
        "data_loader_arguments": [f"{SF}/documents.parquet"],
        "data_sampler_name": "identity_sampler",
        "id_key": "doc_id",
        "aggregation": "mean",
        "embedders": [{"id": "embedder_1", "vectors": "bm25",
                       "embeddable_fields": ["text"]}],
        "searchers": [{"id": "searcher_1", "data_embedder": "embedder_1",
                       "score_alpha": 0.4, "score_weight": 1.0}],
    }
    p = tmp_path / "env.json"
    p.write_text(_json.dumps(cfg))
    cenv = build_search_env(spark, str(p))
    s = rest_server(cenv)
    try:
        code, out = _post(f"{s.url}/api/search",
                          {"query": "spark join data", "max_matches": 3,
                           "tiebreak_round": 6})
        assert code == 200
        before = json.loads(out)["results"]

        code, out = _post(f"{s.url}/api/envop",
                          {"cmd": "reindex", "cmd_argument": "searcher_1"})
        assert code == 200
        assert json.loads(out)["searchers"] == "searcher_1"

        code, out = _post(f"{s.url}/api/search",
                          {"query": "spark join data", "max_matches": 3,
                           "tiebreak_round": 6})
        assert code == 200 and json.loads(out)["results"] == before

        code, _ = _post(f"{s.url}/api/envop",
                        {"cmd": "reindex", "cmd_argument": "nope"})
        assert code == 400
    finally:
        s.shutdown()
