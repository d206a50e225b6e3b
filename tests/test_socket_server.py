"""S6 line-socket transports (server/socket.py vs reference
src/server/search.jl:28-127 + unixsocket.jl): newline-framed JSON
request/response, operation dispatch, persistent connections, envop,
ERRORED_REQUEST empty-ack semantics, and the unix-domain variant."""

import json
import socket as pysocket

import pytest

from garamond_jl_spark.config import EngineConfig
from garamond_jl_spark.operators.build import build_index
from garamond_jl_spark.plans.lifecycle import (InternalRequest, SearchEnv,
                                               response_json)
from garamond_jl_spark.server.socket import socket_server, unix_socket_server

SF = "/root/testdata/sf0.001"


def _roundtrip(conn: pysocket.socket, payload) -> str:
    raw = payload if isinstance(payload, bytes) \
        else (json.dumps(payload).encode() if isinstance(payload, dict)
              else payload.encode())
    conn.sendall(raw + b"\n")
    buf = b""
    while not buf.endswith(b"\n"):
        chunk = conn.recv(65536)
        if not chunk:
            break
        buf += chunk
    return buf.decode().rstrip("\n")


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


def _connect(srv):
    c = pysocket.create_connection((srv.host, srv.port), timeout=120)
    c.settimeout(120)
    return c


def test_tcp_search_matches_engine(srv, env):
    with _connect(srv) as c:
        out = _roundtrip(c, {"operation": "search",
                             "query": "spark join data", "max_matches": 5,
                             "tiebreak_round": 6, "return_fields": ["lang"]})
    want = json.loads(response_json(env, InternalRequest(
        query="spark join data", max_matches=5, tiebreak_round=6,
        return_fields=["lang"])))
    assert json.loads(out) == want


def test_persistent_connection_streams_requests(srv):
    # unixsocket.jl front-ends hold one connection open across requests
    with _connect(srv) as c:
        r1 = json.loads(_roundtrip(c, {"operation": "rank",
                                       "query": "3 1 7"}))
        assert [r["doc_id"] for r in r1["results"]] == [3, 1, 7]
        r2 = json.loads(_roundtrip(c, {"operation": "recommend",
                                       "query": "3", "max_matches": 4,
                                       "return_fields": ["lang"]}))
        assert r2["results"] and all(r["doc_id"] != 3 for r in r2["results"])
        cfg = json.loads(_roundtrip(c, {"operation": "read_configs"}))
        assert cfg["kappa"] == pytest.approx(2.0)
        assert cfg["n_searchers"] == 1


def test_errored_and_unknown_requests_get_empty_ack(srv):
    with _connect(srv) as c:
        assert _roundtrip(c, b"{not json") == ""
        assert _roundtrip(c, {"operation": "frobnicate"}) == ""
        # the connection survives an errored request (search.jl:116-118)
        out = json.loads(_roundtrip(c, {"operation": "search",
                                        "query": "spark", "max_matches": 2,
                                        "tiebreak_round": 6}))
        assert out["results"]


def test_envop_over_socket(srv, env):
    n = env.index.meta["n_docs"]
    with _connect(srv) as c:
        out = json.loads(_roundtrip(c, {
            "operation": "envop",
            "query": json.dumps({"cmd": "reindex", "text_col": "text"})}))
    assert out == {"envop": "reindex", "n_docs": n}


def test_unix_socket_and_kill(env, tmp_path):
    path = str(tmp_path / "garamond.sock")
    s = unix_socket_server(env, path)
    try:
        with pysocket.socket(pysocket.AF_UNIX,
                             pysocket.SOCK_STREAM) as c:
            c.settimeout(120)
            c.connect(path)
            out = json.loads(_roundtrip(c, {"operation": "search",
                                            "query": "spark join",
                                            "max_matches": 3,
                                            "tiebreak_round": 6}))
            assert out["results"]
            assert _roundtrip(c, {"operation": "kill"}) == ""
        # poll BOTH conditions: server.shutdown() returns just before
        # the serve thread dies, and the socket file is removed after
        # that by the shutdown thread — either alone races
        import os
        import time
        for _ in range(50):
            if not s._thread.is_alive() and not os.path.exists(path):
                break
            time.sleep(0.1)
        else:
            pytest.fail("server thread alive or socket file present "
                        "after kill")
    finally:
        try:
            s.shutdown()
        except Exception:
            pass
