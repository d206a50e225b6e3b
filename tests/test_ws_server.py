"""S6 WebSocket transport (server/websocket.py vs reference
src/server/websocket.jl): RFC 6455 handshake + frame codec, one
line-JSON request per text message bridged to the search server,
empty-message gate, ping/pong, fragmentation, masking enforcement.

The client side below is hand-rolled too (no websocket lib in the
sandbox) — it doubles as an independent check of the wire format."""

import base64
import hashlib
import json
import socket as pysocket

import pytest

from garamond_jl_spark.config import EngineConfig
from garamond_jl_spark.operators.build import build_index
from garamond_jl_spark.plans.lifecycle import (InternalRequest, SearchEnv,
                                               response_json)
from garamond_jl_spark.server.websocket import (OP_CLOSE, OP_CONT, OP_PING,
                                                OP_PONG, OP_TEXT, accept_key,
                                                web_socket_server)

SF = "/root/testdata/sf0.001"
_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


@pytest.fixture(scope="module")
def env(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    idx = build_index(spark, docs, EngineConfig(score_alpha=0.4),
                      id_col="doc_id", text_col="text",
                      carry_cols=["text", "lang"])
    idx.postings.count()
    return SearchEnv(spark=spark, index=idx)


@pytest.fixture(scope="module")
def ws(env):
    bridge, ss = web_socket_server(env)
    yield bridge
    bridge.shutdown()
    ss.shutdown()


# ---------------------------------------------------------------- client --

def _handshake(host, port, key=None):
    key = key or base64.b64encode(b"0123456789abcdef").decode()
    s = pysocket.create_connection((host, port), timeout=120)
    s.settimeout(120)
    s.sendall((f"GET /ws HTTP/1.1\r\nHost: {host}\r\n"
               f"Upgrade: websocket\r\nConnection: Upgrade\r\n"
               f"Sec-WebSocket-Key: {key}\r\n"
               f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
    buf = b""
    while b"\r\n\r\n" not in buf:
        buf += s.recv(4096)
    head, _, rest = buf.partition(b"\r\n\r\n")
    assert rest == b"", "server spoke before a client frame"
    return s, head.decode("latin-1"), key


def _send(s, payload: bytes, opcode=OP_TEXT, fin=True,
          mask=b"\x11\x22\x33\x44"):
    head = bytes([(0x80 if fin else 0) | opcode])
    n = len(payload)
    if n < 126:
        head += bytes([0x80 | n])
    elif n < 1 << 16:
        head += bytes([0x80 | 126]) + n.to_bytes(2, "big")
    else:
        head += bytes([0x80 | 127]) + n.to_bytes(8, "big")
    body = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
    s.sendall(head + mask + body)


def _recv_exact(s, n):
    buf = b""
    while len(buf) < n:
        chunk = s.recv(n - len(buf))
        assert chunk, "server closed mid-frame"
        buf += chunk
    return buf


def _recv_frame(s):
    b0, b1 = _recv_exact(s, 2)
    fin, opcode = bool(b0 & 0x80), b0 & 0x0F
    assert not (b1 & 0x80), "server frames must not be masked (RFC §5.1)"
    ln = b1 & 0x7F
    if ln == 126:
        ln = int.from_bytes(_recv_exact(s, 2), "big")
    elif ln == 127:
        ln = int.from_bytes(_recv_exact(s, 8), "big")
    return fin, opcode, _recv_exact(s, ln)


def _request(s, payload: dict) -> str:
    _send(s, json.dumps(payload).encode())
    fin, opcode, data = _recv_frame(s)
    assert fin and opcode == OP_TEXT
    return data.decode()


# ----------------------------------------------------------------- tests --

def test_accept_key_is_rfc_vector():
    # the worked example from RFC 6455 §1.3
    assert accept_key("dGhlIHNhbXBsZSBub25jZQ==") == \
        "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="


def test_handshake_101_and_accept(ws):
    s, head, key = _handshake(ws.host, ws.port)
    assert head.startswith("HTTP/1.1 101")
    expect = base64.b64encode(
        hashlib.sha1((key + _GUID).encode()).digest()).decode()
    assert f"Sec-WebSocket-Accept: {expect}" in head
    s.close()


def test_bad_handshake_rejected(ws):
    s = pysocket.create_connection((ws.host, ws.port), timeout=120)
    s.sendall(b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")   # no upgrade/key
    buf = b""
    while b"\r\n\r\n" not in buf:
        chunk = s.recv(4096)
        if not chunk:
            break
        buf += chunk
    assert buf.startswith(b"HTTP/1.1 400")
    s.close()


def test_search_matches_engine(ws, env):
    s, _, _ = _handshake(ws.host, ws.port)
    out = json.loads(_request(s, {"operation": "search",
                                  "query": "spark join data",
                                  "max_matches": 5, "tiebreak_round": 6}))
    direct = json.loads(response_json(env, InternalRequest(
        operation="search", query="spark join data", max_matches=5,
        tiebreak_round=6)))
    assert out == direct
    assert len(out["results"]) == 5
    s.close()


def test_persistent_connection_and_read_configs(ws):
    s, _, _ = _handshake(ws.host, ws.port)
    cfg = json.loads(_request(s, {"operation": "read_configs"}))
    assert cfg["weighting"] == "bm25" and cfg["n_searchers"] == 1
    # second request on the SAME websocket (persistent, unlike the
    # per-message TCP hop behind it)
    out = json.loads(_request(s, {"operation": "search", "query": "merge",
                                  "max_matches": 3, "tiebreak_round": 6}))
    assert out["n_total_results"] == 3
    s.close()


def test_empty_message_ignored(ws):
    s, _, _ = _handshake(ws.host, ws.port)
    _send(s, b"")                      # websocket.jl:31 isempty gate
    _send(s, b"   ")                   # whitespace-only → also empty
    out = json.loads(_request(s, {"operation": "search", "query": "merge",
                                   "max_matches": 2, "tiebreak_round": 6}))
    assert out["n_total_results"] == 2   # and it answered the REAL request
    s.close()


def test_fragmented_request(ws):
    raw = json.dumps({"operation": "search", "query": "spark join data",
                      "max_matches": 4, "tiebreak_round": 6}).encode()
    s, _, _ = _handshake(ws.host, ws.port)
    _send(s, raw[:10], opcode=OP_TEXT, fin=False)
    _send(s, raw[10:20], opcode=OP_CONT, fin=False)
    _send(s, raw[20:], opcode=OP_CONT, fin=True)
    fin, opcode, data = _recv_frame(s)
    assert fin and opcode == OP_TEXT
    assert json.loads(data)["n_total_results"] == 4
    s.close()


def test_ping_pong_and_unknown_op(ws):
    s, _, _ = _handshake(ws.host, ws.port)
    _send(s, b"heartbeat", opcode=OP_PING)
    fin, opcode, data = _recv_frame(s)
    assert fin and opcode == OP_PONG and data == b"heartbeat"
    # unknown operation → empty ack line from the search server → empty
    # websocket message (ERRORED_REQUEST semantics, search.jl:120)
    assert _request(s, {"operation": "no_such_op"}) == ""
    s.close()


def test_unmasked_client_frame_closed_1002(ws):
    s, _, _ = _handshake(ws.host, ws.port)
    payload = b'{"operation": "read_configs"}'
    s.sendall(bytes([0x80 | OP_TEXT, len(payload)]) + payload)  # no mask
    fin, opcode, data = _recv_frame(s)
    assert opcode == OP_CLOSE
    assert int.from_bytes(data[:2], "big") == 1002
    s.close()


def test_close_echo(ws):
    s, _, _ = _handshake(ws.host, ws.port)
    _send(s, (1000).to_bytes(2, "big"), opcode=OP_CLOSE)
    fin, opcode, data = _recv_frame(s)
    assert opcode == OP_CLOSE
    assert int.from_bytes(data[:2], "big") == 1000
    s.close()


def test_kill_through_websocket(env):
    bridge, ss = web_socket_server(env)
    try:
        s, _, _ = _handshake(bridge.host, bridge.port)
        assert _request(s, {"operation": "kill"}) == ""
        import time
        for _ in range(50):
            if not ss._thread.is_alive():
                break
            time.sleep(0.1)
        else:
            pytest.fail("search server still alive after WS kill")
        s.close()
    finally:
        bridge.shutdown()
        try:
            ss.shutdown()
        except Exception:
            pass


def test_pretty_printed_json_is_one_request(ws):
    """A browser's JSON.stringify(req, null, 2) carries interior
    newlines: the bridge must compact it into ONE line-JSON wire
    request instead of splitting it into garbage fragments."""
    s, _, _ = _handshake(ws.host, ws.port)
    pretty = json.dumps({"operation": "search", "query": "spark join data",
                         "max_matches": 3}, indent=2)
    assert "\n" in pretty
    _send(s, pretty.encode())
    fin, opcode, data = _recv_frame(s)
    assert fin and opcode == OP_TEXT
    resp = json.loads(data)
    assert resp["n_total_results"] == 3
    s.close()


def test_oversized_frame_closes_1009(ws):
    """A client-declared 2^40 length is untrusted input — the server
    must close 1009 instead of trying to allocate it."""
    s, _, _ = _handshake(ws.host, ws.port)
    mask = b"\x01\x02\x03\x04"
    head = bytes([0x80 | OP_TEXT, 0x80 | 127]) + (1 << 40).to_bytes(8, "big")
    s.sendall(head + mask)
    fin, opcode, data = _recv_frame(s)
    assert opcode == 0x8 and int.from_bytes(data[:2], "big") == 1009
    s.close()


def test_unmasked_control_frame_rejected(ws):
    """RFC 6455 §5.1: EVERY unmasked client frame — control frames
    included — must close the connection with 1002."""
    s, _, _ = _handshake(ws.host, ws.port)
    s.sendall(bytes([0x80 | 0x9, 0x00]))     # unmasked PING
    fin, opcode, data = _recv_frame(s)
    assert opcode == 0x8 and int.from_bytes(data[:2], "big") == 1002
    s.close()
