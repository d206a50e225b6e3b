"""garw web client (tools/garw.py vs reference apps/garw/src/garw.jl):
page construction (request template + WS endpoint baked in), the
serve-any-path HTTP behavior, the --web-page file override, and the
port-0 exit path."""

import json
import os
import sys
import urllib.request

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tools"))
import garw  # noqa: E402


def _get(url: str) -> tuple[int, str]:
    with urllib.request.urlopen(url, timeout=30) as resp:
        return resp.status, resp.read().decode()


def test_default_page_bakes_ws_endpoint_and_request_template():
    page = garw.default_webpage("10.0.0.5", 4321, fields=["lang", "text"])
    assert "ws://10.0.0.5:4321" in page
    # the reference page's request template values (garw.jl:162-173)
    tpl = page.split("var request_template = ", 1)[1].split(";\n", 1)[0]
    req = json.loads(tpl)
    assert req == {"operation": "search", "query": "",
                   "input_parser": "base_input_parser",
                   "max_matches": 1000, "response_size": 100,
                   "search_method": "exact", "max_suggestions": 0,
                   "return_fields": ["lang", "text"]}
    # renders THIS engine's response shape
    assert "n_total_results" in page and "suggestions" in page


def test_serves_page_on_every_path():
    srv = garw.serve_page(garw.default_webpage("127.0.0.1", 1234))
    try:
        host, port = srv.server_address[:2]
        for path in ("/", "/anything", "/a/b?q=1"):
            status, body = _get(f"http://{host}:{port}{path}")
            assert status == 200
            assert "ws://127.0.0.1:1234" in body
            assert 'id="search_box"' in body
    finally:
        srv.shutdown()
        srv.server_close()


def test_web_page_file_override(tmp_path):
    custom = tmp_path / "page.html"
    custom.write_text("<html><body>custom garamond page</body></html>")
    # real_main blocks; exercise the same resolution path it uses
    args = garw.build_arg_parser().parse_args(
        ["-w", "999", "--web-page", str(custom)])
    assert args.web_page == str(custom)
    srv = garw.serve_page(custom.read_text())
    try:
        host, port = srv.server_address[:2]
        status, body = _get(f"http://{host}:{port}/")
        assert status == 200 and body == custom.read_text()
    finally:
        srv.shutdown()
        srv.server_close()


def test_port_zero_exits_like_reference(capsys):
    # garw.jl:241,262-263: ws_port must be > 0, else warn and exit
    assert garw.real_main([]) == 0
    assert "Wrong web-socket port" in capsys.readouterr().err


def test_head_and_post_also_get_the_page():
    # garw.jl:252-258 answers every request with the page
    srv = garw.serve_page("<html>page</html>")
    try:
        host, port = srv.server_address[:2]
        req = urllib.request.Request(f"http://{host}:{port}/",
                                     method="HEAD")
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.status == 200 and resp.read() == b""
            assert resp.headers["Content-Length"] == "17"
        req = urllib.request.Request(f"http://{host}:{port}/", data=b"x",
                                     method="POST")
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.status == 200
            assert resp.read().decode() == "<html>page</html>"
    finally:
        srv.shutdown()
        srv.server_close()


def test_untrusted_content_is_escaped_in_page_js():
    # the renderer must escape corpus content before innerHTML
    page = garw.default_webpage("127.0.0.1", 1)
    assert "function esc(" in page
    for sink in ('esc(row["score"])', "esc(field)", "esc(row[field])",
                 "esc(keywords[k])"):
        assert sink in page


def test_e2e_page_template_through_ws_bridge(spark):
    """The headless end-to-end: fetch the served page as a browser
    would, extract its embedded request template and WS endpoint, send
    template+query through the RFC 6455 client (reusing
    test_ws_server's hand-rolled frames), and assert the response has
    everything the page's onmessage renders."""
    import test_ws_server as tws

    from garamond_jl_spark.config import EngineConfig
    from garamond_jl_spark.operators.build import build_index
    from garamond_jl_spark.plans.lifecycle import SearchEnv
    from garamond_jl_spark.server.websocket import web_socket_server

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = build_index(spark, docs, EngineConfig(score_alpha=0.4),
                      id_col="doc_id", text_col="text",
                      carry_cols=["lang"])
    idx.postings.count()
    bridge, ss = web_socket_server(SearchEnv(spark=spark, index=idx))
    srv = garw.serve_page(
        garw.default_webpage("127.0.0.1", bridge.port, fields=["lang"]))
    try:
        host, port = srv.server_address[:2]
        _, page = _get(f"http://{host}:{port}/")
        ws_port = int(page.split("ws://127.0.0.1:", 1)[1].split("'", 1)[0])
        assert ws_port == bridge.port
        tpl = json.loads(page.split("var request_template = ", 1)[1]
                         .split(";\n", 1)[0])
        req = dict(tpl)
        req["query"] = "spark join data"       # what onsubmit does
        s, head, _ = tws._handshake("127.0.0.1", ws_port)
        assert "101" in head.splitlines()[0]
        resp = json.loads(tws._request(s, req))
        s.close()
        # everything the page's onmessage reads must be present
        assert resp["n_total_results"] > 0 and "suggestions" in resp
        assert all("score" in r and "lang" in r for r in resp["results"])
    finally:
        srv.shutdown()
        srv.server_close()
        bridge.shutdown()
        ss.shutdown()


def test_missing_web_page_file_falls_back_to_builtin(tmp_path,
                                                     monkeypatch):
    # garw.jl:244-248: page file absent → serve the built-in page
    import threading
    calls = {}

    def fake_serve(webpage, host="127.0.0.1", port=0):
        calls["page"] = webpage

        class _Stub:
            server_address = ("127.0.0.1", 1)

            def shutdown(self):
                pass

            def server_close(self):
                pass
        return _Stub()

    monkeypatch.setattr(garw, "serve_page", fake_serve)
    monkeypatch.setattr(threading.Event, "wait",
                        lambda self, timeout=None: None)
    rc = garw.real_main(["-w", "4321", "--web-page",
                         str(tmp_path / "absent.html")])
    assert rc == 0
    assert "ws://127.0.0.1:4321" in calls["page"]
