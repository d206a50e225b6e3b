#!/usr/bin/env python
"""garw — the Garamond web client (apps/garw analog).

The reference's third app (/root/reference/apps/garw/src/garw.jl) is a
tiny HTTP server that serves ONE search page whose JavaScript opens a
WebSocket to the engine's WS transport, sends one search-request JSON
per form submit, and renders the response (garw.jl:47-204 page,
222-265 server).  This is that app for the Spark engine: the page's
JS speaks to ``server/websocket.py`` (one line-JSON request per WS
text message) and renders THIS engine's response shape
(lifecycle.response_json: flat rank-ordered ``results`` rows +
``suggestions``) in the reference page's score-first style.

As in the reference: ``--web-socket-port`` must be given (garw.jl
exits on the 0 default), ``--web-page FILE`` overrides the built-in
page, ``--return-fields`` is baked into the page's request template,
and the server answers every path with the page.

Usage (two processes / threads)::

    # engine side
    bridge, ss = web_socket_server(env)          # WS transport
    # client side
    python tools/garw.py -w <bridge.port> -p 8888 --return-fields lang
    # then browse http://127.0.0.1:8888
"""

from __future__ import annotations

import argparse
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def build_arg_parser() -> argparse.ArgumentParser:
    """Flag set of garw.jl:15-40."""
    p = argparse.ArgumentParser(
        prog="garw", description="Garamond web search client")
    p.add_argument("--log-level", default="warn",
                   help="logging level (parity flag)")
    p.add_argument("--web-socket-port", "-w", type=int, default=0,
                   help="WebSocket data communication port")
    p.add_argument("--web-socket-ip", default="127.0.0.1",
                   help="WebSocket data communication IP")
    p.add_argument("--http-port", "-p", type=int, default=8888,
                   help="HTTP port for the page server")
    p.add_argument("--http-host", default="127.0.0.1",
                   help="HTTP bind host (the reference binds localhost)")
    p.add_argument("--web-page", default=None,
                   help="search web page file to serve instead of the "
                        "built-in one")
    p.add_argument("--return-fields", nargs="*", default=[],
                   help="fields to return (baked into the page's "
                        "request template)")
    return p


def default_webpage(ws_ip: str, ws_port: int,
                    fields: list[str] | None = None) -> str:
    """The built-in page (garw.jl:47-204 counterpart, written for this
    engine's wire shapes).  The request template mirrors the reference
    page's (operation/search, base_input_parser, max_matches 1000,
    response_size 100, exact, no suggestions); the renderer walks the
    flat ``results`` list and prints each row score-first, then any
    ``suggestions`` — one block instead of the reference's
    per-searcher-id grouping, which this engine's response (already
    aggregated across searchers) does not carry."""
    request_template = json.dumps({
        "operation": "search",
        "query": "",
        "input_parser": "base_input_parser",
        "max_matches": 1000,
        "response_size": 100,
        "search_method": "exact",
        "max_suggestions": 0,
        "return_fields": list(fields or []),
    })
    return f"""<!doctype html>
<html>
<head>
  <meta charset="utf-8">
  <title>~ Garamond Search ~ (garamond_jl_spark)</title>
  <style>
    body {{ font-family: Georgia, 'Times New Roman', serif;
            margin: 2em auto; max-width: 52em; }}
    #search_box_txt {{ width: 22em; padding: 6px 10px; }}
    #search_box_button {{ padding: 6px 18px; }}
    #search_results {{ margin-top: 2em; font-size: 14px; }}
    .score {{ font-weight: bold; }}
  </style>
</head>
<body>
  <form id="search_box">
    <input id="search_box_txt" type="text" placeholder="Search..." required>
    <input id="search_box_button" type="submit" value="Search">
  </form>
  <div id="search_results"></div>
  <script type="text/javascript">
    var connection = new WebSocket('ws://{ws_ip}:{ws_port}');
    var search_results = document.getElementById("search_results");
    var request_template = {request_template};

    connection.onopen = function () {{ console.log("websocket ok"); }};

    // the corpus is untrusted content (source-code text); everything
    // interpolated into innerHTML must be escaped.  (The reference
    // page skips this — a deliberate improvement, not a deviation.)
    function esc(v) {{
      return String(v).replace(/&/g, "&amp;").replace(/</g, "&lt;")
                      .replace(/>/g, "&gt;").replace(/"/g, "&quot;");
    }}

    connection.onmessage = function (r) {{
      var jr = JSON.parse(r.data);
      var html = "<p>Found <b>" + esc(jr.n_total_results) +
                 "</b> results.</p>";
      for (var i = 0; i < jr.results.length; i++) {{
        var row = jr.results[i];
        html += "&emsp;<span class=\\"score\\">[" + esc(row["score"]) +
                "]</span> ~ ";
        for (var field in row) {{
          if (field !== "score" && field !== "rank") {{
            html += esc(field) + ": " + esc(row[field]) + " ";
          }}
        }}
        html += "<br>";
      }}
      var keywords = Object.keys(jr.suggestions || {{}});
      if (keywords.length > 0) {{
        html += "<p>" + keywords.length + " suggestions:</p>";
        for (var k = 0; k < keywords.length; k++) {{
          html += "&emsp;\\"" + esc(keywords[k]) + "\\": " +
                  esc(jr.suggestions[keywords[k]].join(", ")) + "<br>";
        }}
      }}
      search_results.innerHTML = html;
    }};

    document.getElementById("search_box").onsubmit = function () {{
      var box = document.getElementById("search_box_txt");
      var req = JSON.parse(JSON.stringify(request_template));
      req.query = box.value;
      connection.send(JSON.stringify(req));
      box.value = "";
      return false;
    }};

    window.onunload = function () {{ connection.close(); }};
  </script>
</body>
</html>"""


class _PageHandler(BaseHTTPRequestHandler):
    def log_message(self, fmt, *args):  # quiet, like rest.py's handler
        pass

    # garw.jl:252-258 answers EVERY request with the page
    def _page(self, send_body: bool = True) -> None:
        body = self.server.webpage.encode()  # type: ignore[attr-defined]
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if send_body:
            self.wfile.write(body)

    def do_GET(self) -> None:  # noqa: N802
        self._page()

    def do_HEAD(self) -> None:  # noqa: N802
        self._page(send_body=False)

    def do_POST(self) -> None:  # noqa: N802
        self._page()


def serve_page(webpage: str, host: str = "127.0.0.1",
               port: int = 0) -> ThreadingHTTPServer:
    """Start the page server on a daemon thread (port=0 → ephemeral;
    read it back from ``server.server_address``).  Call
    ``shutdown()`` + ``server_close()`` when done."""
    import threading
    srv = ThreadingHTTPServer((host, port), _PageHandler)
    srv.webpage = webpage  # type: ignore[attr-defined]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def real_main(argv: list[str] | None = None) -> int:
    """garw.jl:222-265: resolve the page, serve it forever."""
    args = build_arg_parser().parse_args(argv)
    if args.web_socket_port <= 0:
        print(f"Wrong web-socket port value {args.web_socket_port} "
              f"(default is 0). Exiting...", file=sys.stderr)
        return 0
    import os
    if args.web_page and os.path.isfile(args.web_page):
        # garw.jl:244-248: a missing page file falls back to the
        # built-in page rather than erroring
        with open(args.web_page, encoding="utf-8") as fh:
            webpage = fh.read()
    else:
        webpage = default_webpage(args.web_socket_ip,
                                  args.web_socket_port,
                                  fields=args.return_fields)
    srv = serve_page(webpage, host=args.http_host, port=args.http_port)
    host, port = srv.server_address[:2]
    print(f"Serving page on {host}:{port}", file=sys.stderr)
    try:
        import threading
        threading.Event().wait()       # serve until interrupted
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        srv.server_close()
    return 0


if __name__ == "__main__":
    sys.exit(real_main())
