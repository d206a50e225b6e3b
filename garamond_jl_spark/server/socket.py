"""S6 line-socket transports: the reference's TCP / unix-socket servers
(/root/reference/src/server/search.jl:28-127 dispatch loop,
src/server/unixsocket.jl:1-49 framing) over the lifecycle engine.

Wire protocol (requests.jl:150-157 RESPONSE_TERMINATOR): each request
is ONE newline-terminated JSON object — the serialized InternalRequest
(`request2json`, requests.jl:70-73) — and each response is one
newline-terminated JSON line.  Operations (search.jl:60-123):

* ``search`` / ``recommend`` / ``rank`` — engine ops; recommend seeds
  and rank id lists travel IN ``query`` (the client-side convention —
  the reference's clients serialize them there before sending)
* ``kill``          — empty-line ack, then server shutdown
* ``read_configs``  — the environment's engine config as JSON
* ``envop``         — ``query`` holds the envop JSON
  (``{"cmd": save|load|reindex, "cmd_argument": ...}``); unlike the
  reference (which acks with an empty line and applies the op
  asynchronously, search.jl:106-114) the result dict is returned
  synchronously — same one-writer semantics, strictly more informative
* malformed / unknown — empty line (ERRORED_REQUEST semantics,
  search.jl:116-122)

The reference splits I/O front-end and search server across two
sockets; as with the REST transport (rest.py), on Spark the search
server IS the driver's SparkSession, so the transport is one threaded
stdlib server whose handler threads submit Spark actions directly.
Connections are persistent: a client may stream many request lines on
one connection (the unixsocket.jl front-end holds its client
connection open the same way).
"""

from __future__ import annotations

import json
import os
import socketserver
import threading

from garamond_jl_spark.plans.lifecycle import InternalRequest, response_json
from garamond_jl_spark.server.rest import (_PASSTHROUGH, _configs_payload,
                                           _envop, _snapshot)

_ENGINE_OPS = ("search", "recommend", "rank")


def request_from_wire(d: dict) -> InternalRequest:
    """Deserialize a request2json line (requests.jl:70-73): every field
    present in the JSON object is copied onto the InternalRequest
    (``query``, in _PASSTHROUGH, carries operation-specific payloads
    verbatim)."""
    req = InternalRequest(operation=str(d.get("operation", "")))
    for key in _PASSTHROUGH:
        if key in d:
            setattr(req, key, d[key])
    return req


def respond_line(srv: "SocketServer", line: str) -> tuple[str, bool]:
    """One respond() dispatch (search.jl:45-127): returns
    ``(response_without_terminator, kill_requested)``.  Engine ops run
    against a per-request env snapshot; envops serialize on the
    server's writer lock (see rest.py's _snapshot/_envop notes)."""
    try:
        d = json.loads(line)
        if not isinstance(d, dict):
            raise ValueError("request must be a JSON object")
        op = str(d.get("operation", ""))
        if op == "kill":
            return "", True
        if op == "read_configs":
            return json.dumps(_configs_payload(_snapshot(srv.env)),
                              default=str), False
        if op == "envop":
            body = json.loads(d.get("query") or "{}")
            with srv.envop_lock:          # per-ENV lock (rest.env_lock)
                return json.dumps(_envop(srv.env, body)), False
        if op in _ENGINE_OPS:
            return response_json(_snapshot(srv.env),
                                 request_from_wire(d)), False
        return "", False           # unknown op → empty ack (search.jl:120)
    except Exception:              # ERRORED_REQUEST → empty ack
        return "", False


class _Handler(socketserver.StreamRequestHandler):
    def handle(self) -> None:
        srv: SocketServer = self.server.garamond  # type: ignore[attr-defined]
        while True:
            raw = self.rfile.readline()
            if not raw:            # client closed
                return
            line = raw.decode("utf-8", errors="replace").strip()
            if not line:           # keep-alive blank line (unixsocket.jl:36)
                continue
            response, kill = respond_line(srv, line)
            self.wfile.write(response.encode() + b"\n")
            self.wfile.flush()
            if kill:
                threading.Thread(target=srv.shutdown, daemon=True).start()
                return


class _TCP(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


if hasattr(socketserver, "ThreadingUnixStreamServer"):
    class _Unix(socketserver.ThreadingUnixStreamServer):
        daemon_threads = True
else:                                   # platform without AF_UNIX:
    _Unix = None                        # TCP/REST must still import


class SocketServer:
    """A started line-JSON transport over one :class:`SearchEnv`.

    ``unix_path=None`` → TCP at ``host:port`` (``port=0`` binds an
    ephemeral port, read it back from ``server.port``); a path →
    unix-domain socket (a stale socket file is removed first,
    unixsocket.jl:12-14)."""

    def __init__(self, env, host: str = "127.0.0.1",
                 port: int = 0, unix_path: str | None = None):
        self.env = env
        from garamond_jl_spark.server.rest import env_lock
        self.envop_lock = env_lock(env)   # shared across transports
        self.unix_path = unix_path
        if unix_path is not None:
            if os.path.exists(unix_path):
                os.remove(unix_path)
            if _Unix is None:
                raise OSError("unix-domain sockets are not supported "
                              "on this platform; use the TCP transport")
            self.server = _Unix(unix_path, _Handler)
            self.host, self.port = None, None
        else:
            self.server = _TCP((host, port), _Handler)
            self.host, self.port = self.server.server_address[:2]
        self.server.garamond = self  # type: ignore[attr-defined]
        self._thread = threading.Thread(target=self.server.serve_forever,
                                        daemon=True)

    def start(self) -> "SocketServer":
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self.server.shutdown()
        self.server.server_close()
        if self.unix_path and os.path.exists(self.unix_path):
            os.remove(self.unix_path)


def socket_server(env: SearchEnv, host: str = "127.0.0.1",
                  port: int = 0) -> SocketServer:
    """TCP search-server transport (search.jl:28-42 analog)."""
    return SocketServer(env, host=host, port=port).start()


def unix_socket_server(env: SearchEnv, path: str) -> SocketServer:
    """Unix-socket transport (unixsocket.jl:1-49 analog)."""
    return SocketServer(env, unix_path=path).start()
