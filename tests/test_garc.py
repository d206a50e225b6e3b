"""garc CLI client (tools/garc.py vs reference apps/garc/src/garc.jl):
request construction, socket round-trip over TCP and unix-domain
transports, pretty printing, envop and kill commands, and the
no-query / bad-socket exit paths."""

import io
import json
import os
import sys

import pytest

from garamond_jl_spark.config import EngineConfig
from garamond_jl_spark.operators.build import build_index
from garamond_jl_spark.plans.lifecycle import (InternalRequest, SearchEnv,
                                               response_json)
from garamond_jl_spark.server.socket import socket_server, unix_socket_server

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tools"))
import garc  # noqa: E402

SF = "/root/testdata/sf0.001"


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
    s = socket_server(env)
    yield s
    s.shutdown()


def _run(argv):
    out = io.StringIO()
    rc = garc.real_main(argv, out=out)
    return rc, out.getvalue()


def test_request_json_mirrors_reference_fields():
    # garc.jl:97-129 field set, same names on the wire
    args = garc.build_arg_parser().parse_args(
        ["fox jumps", "--max-matches", "7", "--return-fields", "lang",
         "text", "--sort-reverse", "true", "--search-method", "regex"])
    req = json.loads(garc.construct_json_request(args))
    assert req["operation"] == "search" and req["query"] == "fox jumps"
    assert req["max_matches"] == 7
    assert req["return_fields"] == ["lang", "text"]
    assert req["sort_reverse"] is True
    assert req["search_method"] == "regex"
    assert req["request_id_key"] == "garamond_linear_id"
    for key in ("max_suggestions", "custom_weights", "response_size",
                "response_page", "ranker", "input_parser", "recommender",
                "searchable_filters", "sort_fields"):
        assert key in req


def test_kill_and_envop_requests():
    kill = json.loads(garc.construct_json_request(
        garc.build_arg_parser().parse_args(["--kill"])))
    assert kill["operation"] == "kill"
    envop = json.loads(garc.construct_json_request(
        garc.build_arg_parser().parse_args(
            ["--env-operation", "save", "/tmp/x"])))
    assert envop["operation"] == "envop"
    assert json.loads(envop["query"]) == {"cmd": "save",
                                          "cmd_argument": "/tmp/x"}


def test_tcp_search_matches_engine(srv, env):
    rc, out = _run(["spark join data", "--port", str(srv.port),
                    "--max-matches", "5", "--return-fields", "lang"])
    assert rc == 0
    want = json.loads(response_json(env, InternalRequest(
        query="spark join data", max_matches=5, return_fields=["lang"],
        input_parser="noop_input_parser", ranker="noop_ranker",
        recommender="noop_recommender")))
    assert json.loads(out) == want
    assert want["results"]          # a real hit set, not an empty ack


def test_pretty_print_style(srv):
    rc, out = _run(["spark join data", "--port", str(srv.port),
                    "--max-matches", "3", "--return-fields", "lang",
                    "--pretty"])
    assert rc == 0
    lines = out.strip().splitlines()
    # garc.jl:150-166 style: a summary line, then score-first entries
    assert lines[0].startswith("Search yielded ")
    assert lines[1].startswith("[") and "] ~ " in lines[1]
    assert "lang: " in lines[1] and "rank: " not in lines[1]


def test_envop_reindex_over_garc(srv, env):
    n = env.index.meta["n_docs"]
    rc, out = _run(["--env-operation", "reindex", "*",
                    "--port", str(srv.port)])
    assert rc == 0
    assert json.loads(out) == {"envop": "reindex", "n_docs": n}


def test_unix_socket_and_kill(env, tmp_path):
    path = str(tmp_path / "garamond.sock")
    s = unix_socket_server(env, path)
    try:
        rc, out = _run(["spark join", "--unix-socket", path,
                        "--max-matches", "2"])
        assert rc == 0 and json.loads(out)["results"]
        rc, out = _run(["--kill", "-u", path])
        assert rc == 0 and out.strip() == ""
        import os
        import time
        for _ in range(50):
            if not s._thread.is_alive() and not os.path.exists(path):
                break
            time.sleep(0.1)
        else:
            pytest.fail("server alive or socket file present after kill")
    finally:
        try:
            s.shutdown()
        except Exception:
            pass


def test_empty_query_exits_without_connecting():
    rc, out = _run([])              # no server involved at all
    assert rc == 0 and out == ""


def test_bad_socket_paths_fail_cleanly(tmp_path):
    rc, _ = _run(["q", "--unix-socket", str(tmp_path / "nope.sock")])
    assert rc == 1
    not_a_socket = tmp_path / "plain.txt"
    not_a_socket.write_text("x")
    rc, _ = _run(["q", "--unix-socket", str(not_a_socket)])
    assert rc == 1
    rc, _ = _run(["q"])             # no port, no socket
    assert rc == 1
