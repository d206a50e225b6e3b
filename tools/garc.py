#!/usr/bin/env python
"""garc — the Garamond CLI client (apps/garc analog).

The reference ships three apps: ``gars`` (the server — here
``garamond_jl_spark.server``), ``garw`` (web client) and ``garc``, a
one-shot command-line client that speaks the line-JSON wire protocol
(/root/reference/apps/garc/src/garc.jl:23-129): parse CLI flags into
the InternalRequest JSON, write ONE newline-terminated request line to
the server socket, read ONE response line back, print it (optionally
pretty).  This is that client for the Spark engine's transports
(``server/socket.py``): the reference's unix-domain socket via
``--unix-socket``, plus ``--host/--port`` for the TCP variant (the
reference client is unix-only; its internal search server is TCP —
garc.jl:33-35, search.jl:28-42).

Differences from the reference, by design:

* ``request_id_key`` is accepted for wire parity but the engine
  addresses documents uniformly as ``doc_id`` (env_config.py posture),
  so the server ignores it.
* The pretty printer renders THIS engine's response shape
  (lifecycle.response_json: flat rank-ordered ``results`` rows +
  ``suggestions`` dict) in the garc.jl:150-175 style — score-first
  entry lines, then suggestion lists — rather than the reference's
  per-searcher-id grouping, which has no counterpart here.

Usage::

    python tools/garc.py "fox jumps" --port 9100 --pretty
    python tools/garc.py --kill --unix-socket /tmp/gar.sock
    python tools/garc.py --env-operation save /tmp/snap --port 9100
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import stat
import sys


def _bool_arg(s: str) -> bool:
    """Strict Bool parse (the reference's arg_type=Bool errors on
    non-boolean input rather than silently defaulting)."""
    if s.lower() in ("true", "false"):
        return s.lower() == "true"
    raise argparse.ArgumentTypeError(f"expected true/false, got {s!r}")


def build_arg_parser() -> argparse.ArgumentParser:
    """Flag set of garc.jl:23-91 (ArgParse table), argparse idiom."""
    p = argparse.ArgumentParser(
        prog="garc", description="Garamond CLI search client")
    p.add_argument("query", nargs="?", default="", help="the search query")
    p.add_argument("--log-level", default="warn",
                   help="logging level (accepted for parity; client is "
                        "quiet unless 'debug')")
    p.add_argument("--unix-socket", "-u", default="",
                   help="UNIX socket for data communication")
    p.add_argument("--host", default="127.0.0.1",
                   help="TCP host of the search server (used when no "
                        "--unix-socket is given)")
    p.add_argument("--port", type=int, default=0,
                   help="TCP port of the search server")
    p.add_argument("--return-fields", nargs="*", default=[],
                   help="list of fields to return (wrong names ignored)")
    p.add_argument("--sort-fields", nargs="*", default=[],
                   help="list of fields to sort by when filtering")
    p.add_argument("--sort-reverse", type=_bool_arg,
                   default=False, help="reverse the filter sort order")
    p.add_argument("--pretty", action="store_true",
                   help="pretty-print the results")
    p.add_argument("--max-matches", type=int, default=10,
                   help="maximum number of results for internal searches "
                        "(CLI default 10, garc.jl:50-53)")
    p.add_argument("--response-size", type=int, default=10,
                   help="maximum number of results to return")
    p.add_argument("--response-page", type=int, default=1,
                   help="index of page with results to return")
    p.add_argument("--search-method", default="exact",
                   help="type of match done during search (exact/regex)")
    p.add_argument("--max-suggestions", type=int, default=0,
                   help="suggestions per mismatched query term")
    p.add_argument("--id-key", default="garamond_linear_id",
                   help="sent as request_id_key for wire parity; the "
                        "engine addresses documents as doc_id")
    p.add_argument("--kill", "-k", action="store_true",
                   help="kill the search engine server")
    p.add_argument("--env-operation", nargs=2, default=[],
                   metavar=("CMD", "ARG"),
                   help="environment operation (save/load/reindex + arg)")
    p.add_argument("--ranker", default="noop_ranker",
                   help="the ranker to use")
    p.add_argument("--input-parser", default="noop_input_parser",
                   help="noop_input_parser or base_input_parser")
    return p


def construct_json_request(args: argparse.Namespace) -> str:
    """garc.jl:97-129: the InternalRequest JSON line.  Every field the
    reference client sends is sent here under the same name (the
    server copies the _PASSTHROUGH subset onto the request and ignores
    the rest)."""
    req = {
        "operation": "",
        "query": "",
        "max_matches": args.max_matches,
        "max_suggestions": args.max_suggestions,
        "search_method": args.search_method,
        "return_fields": args.return_fields,
        "sort_fields": args.sort_fields,
        "sort_reverse": args.sort_reverse,
        "custom_weights": {},
        "request_id_key": args.id_key,
        "response_size": args.response_size,
        "response_page": args.response_page,
        "ranker": args.ranker,
        "input_parser": args.input_parser,
        "recommender": "noop_recommender",
        "searchable_filters": [],
    }
    if args.kill:
        req["operation"] = "kill"
    elif args.env_operation:
        req["operation"] = "envop"
        req["query"] = json.dumps({"cmd": args.env_operation[0],
                                   "cmd_argument": args.env_operation[1]})
    else:
        req["operation"] = "search"
        req["query"] = args.query
    return json.dumps(req)


def iosearch(conn: socket.socket, request: str,
             pretty: bool = False, out=sys.stdout) -> str:
    """garc.jl:138-184: send one line, read one line, print.  Returns
    the raw response line (for tests)."""
    conn.sendall(request.encode("utf-8") + b"\n")
    buf = b""
    while not buf.endswith(b"\n"):
        chunk = conn.recv(65536)
        if not chunk:
            break
        buf += chunk
    data = buf.decode("utf-8", errors="replace").rstrip("\n")
    if pretty:
        try:
            pretty_print(json.loads(data or "null"), out)
        except Exception:
            print("Pretty printing failed, dumping data as is...",
                  file=sys.stderr)
            print(data, file=out)
    else:
        print(data, file=out)
    return data


def pretty_print(jr, out=sys.stdout) -> None:
    """garc.jl:150-175 output style over this engine's response shape
    (lifecycle.response_json)."""
    if not isinstance(jr, dict):
        raise ValueError("response is not a JSON object")
    rows = jr.get("results", [])
    print(f"Search yielded {jr.get('n_total_results', len(rows))} "
          f"results.", file=out)
    for entry in rows:
        parts = [f"[{entry['score']}] ~ "] if "score" in entry else ["~ "]
        parts += [f"{k}: {v} " for k, v in entry.items()
                  if k not in ("score", "rank")]
        print("".join(parts), file=out)
    suggestions = jr.get("suggestions", {})
    if suggestions:
        print(f"{len(suggestions)} suggestions:", file=out)
        for keyword, terms in suggestions.items():
            print(f'  "{keyword}": {", ".join(terms)}', file=out)


def connect(args: argparse.Namespace) -> socket.socket:
    """Unix socket when given (after the reference's issocket check,
    garc.jl:217); else TCP host:port."""
    if args.unix_socket:
        st = os.stat(args.unix_socket)  # raises if absent, like issocket
        if not stat.S_ISSOCK(st.st_mode):
            raise OSError(f"{args.unix_socket} is not a UNIX socket")
        conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        conn.connect(args.unix_socket)
        return conn
    if not args.port:
        raise OSError("no --unix-socket and no --port given")
    return socket.create_connection((args.host, args.port))


def real_main(argv: list[str] | None = None, out=sys.stdout) -> int:
    """garc.jl:201-233."""
    args = build_arg_parser().parse_args(argv)
    if not args.query and not args.kill and not args.env_operation:
        print("Empty query, nothing to search. Exiting...", file=sys.stderr)
        return 0
    try:
        conn = connect(args)
    except OSError as exc:
        print(f"Connection failed: {exc}. Exiting...", file=sys.stderr)
        return 1
    try:
        request = construct_json_request(args)
        if args.log_level.lower() == "debug":
            print(f">>> {request}", file=sys.stderr)
        iosearch(conn, request, args.pretty, out=out)
    finally:
        conn.close()
    return 0


if __name__ == "__main__":
    sys.exit(real_main())
