"""garw web client (tools/garw.py vs reference apps/garw/src/garw.jl):
page construction (request template + WS endpoint baked in), the
serve-any-path HTTP behavior, the --web-page file override, and the
port-0 exit path."""

import json
import sys
import urllib.request

import pytest

sys.path.insert(0, "/root/repo/tools")
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
