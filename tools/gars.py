#!/usr/bin/env python
"""gars — the Garamond search-server CLI app (apps/gars analog).

The reference's first app (/root/reference/apps/gars/src/gars.jl)
parses server flags, validates IPs/ports, builds (or cache-loads) the
search environment, starts the requested I/O front-ends — unix socket,
WebSocket, REST — and blocks on the internal TCP search server.  This
is that launcher for the Spark engine's transports
(``garamond_jl_spark.server``): same flag set (gars.jl:19-52), same
validation order and warn-and-exit semantics (gars.jl:82-125), same
two-port topology (front-ends proxy or sit beside the line-JSON search
server on ``--search-server-port``, search.jl:28-42).

Differences from the reference, by design:

* the "search server" is the driver's SparkSession + a line-JSON TCP
  transport (``server/socket.py``) rather than a separate process — on
  Spark the engine state IS the driver, so gars owns one SparkSession
  and every front-end serves the same :class:`SearchEnv`;
* ``--env-cache`` points at a ``build_persistent`` index directory
  (``operators/persist.py`` — the engine's cache format) instead of a
  serialized Julia env;
* one machine-readable readiness line (``gars-ready {...ports...}``)
  is printed after the transports bind, so scripts and tests can
  discover ephemeral ports (the reference logs the same facts as free
  text, docs/src/clientserver.md startup trace).

Usage::

    python tools/gars.py -d env.json -u /tmp/gar.sock -p 9001
    python tools/gars.py -c /path/to/index_dir -w 9100
    python tools/garc.py --kill --port <search-server-port>   # stop it
"""

from __future__ import annotations

import argparse
import ipaddress
import json
import logging
import os
import sys
import time

# the reference activates its project from the script location
# (gars.jl:10-12 Pkg.activate); the argparse analog: make the repo
# root importable when run as ``python tools/gars.py``
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def _uint16(s: str) -> int:
    """The reference's ``arg_type=UInt16`` for the WS port
    (gars.jl:38-40): out-of-range values are rejected at parse time,
    before any expensive work."""
    v = int(s)
    if not 0 <= v <= 65535:
        raise argparse.ArgumentTypeError(
            f"port must be 0-65535, got {v}")
    return v


def build_arg_parser() -> argparse.ArgumentParser:
    """Flag set of gars.jl:19-52 (ArgParse table), argparse idiom."""
    p = argparse.ArgumentParser(
        prog="gars", description="Garamond search server")
    p.add_argument("--data-config", "-d", default=None,
                   help="data configuration file")
    p.add_argument("--env-cache", "-c", default=None,
                   help="search environment cache (persistent index dir)")
    p.add_argument("--log-level", default="info", help="logging level")
    p.add_argument("--log", "-l", default="stdout",
                   help="logging stream (stdout|stderr|<file path>)")
    p.add_argument("--unix-socket", "-u", default=None,
                   help="UNIX socket for data communication")
    p.add_argument("--web-socket-port", "-w", type=_uint16, default=None,
                   help="WEB socket data communication port")
    p.add_argument("--web-socket-ip", default="127.0.0.1",
                   help="WEB socket data communication IP")
    p.add_argument("--http-port", "-p", type=int, default=None,
                   help="HTTP port for REST services")
    p.add_argument("--http-ip", default="0.0.0.0",
                   help="HTTP IP for REST services")
    p.add_argument("--search-server-port", "-i", type=int, default=9000,
                   help="internal TCP port for the search server")
    # engine flag (no reference counterpart — the reference env is
    # in-memory by construction): gars is a long-lived server, so a
    # cache-loaded index defaults to the warm resident posture
    # (operators/resident.py); --no-resident keeps the lazy tables
    p.add_argument("--no-resident", action="store_true",
                   help="skip the warm resident posture for -c loads")
    return p


def isvalidip(ip: str) -> bool:
    """gars.jl:58-66's usable-IP gate.  Deviation: only IPv4 literals
    pass — every transport here is an AF_INET stdlib server, so a v6
    address would pass a laxer gate and then crash at bind, exactly
    what the gate exists to catch before the env build."""
    try:
        ipaddress.IPv4Address(ip)
        return True
    except ValueError:
        return False


def normalize_io_port(port: int, log: logging.Logger) -> int:
    """gars.jl:118-121: an out-of-range search-server port warns and
    falls back to the reference default 9000 (the reference tests only
    ``< 0``; >65535 would crash its bind just the same, so both fall
    under the same warn-and-default)."""
    if port < 0 or port > 65535:
        log.warning("Search server I/O port value error. "
                    "Defaulting to 9000.")
        return 9000
    return port


def normalize_http_port(port, log: logging.Logger):
    """The HTTP port is ``arg_type=Int`` in the reference (gars.jl:44)
    with no runtime check — the bind would crash after the env build.
    Fail fast instead: out-of-range warns and drops the REST front-end
    (``None``), consistent with the warn-and-exit gate posture."""
    if port is not None and not 0 <= port <= 65535:
        log.warning("HTTP port value error. Disabling REST services.")
        return None
    return port


def build_logger(stream: str, level: str) -> logging.Logger:
    """build_logger analog (gars.jl:92-94): level string + stdout /
    stderr / file-path destination."""
    log = logging.getLogger("gars")
    log.setLevel(getattr(logging, level.upper(), logging.INFO))
    for old in log.handlers:             # reconfigure without leaking
        old.close()                      # the previous FileHandler fd
    log.handlers.clear()
    if stream == "stdout":
        h: logging.Handler = logging.StreamHandler(sys.stdout)
    elif stream == "stderr":
        h = logging.StreamHandler(sys.stderr)
    else:
        h = logging.FileHandler(stream)
    h.setFormatter(logging.Formatter("[ %(levelname)s | gars ] %(message)s"))
    log.addHandler(h)
    return log


class GarsServers:
    """The running transports: ``search`` (internal line-JSON TCP
    server), plus whichever of ``unix`` / ``bridge`` (WebSocket) /
    ``rest`` the flags requested.  ``wait()`` blocks until a kill
    request lands on the search server or the unix transport
    (search.jl:45-127 kill semantics), then stops everything."""

    def __init__(self, env, search, unix=None, bridge=None, rest=None):
        self.env, self.search = env, search
        self.unix, self.bridge, self.rest = unix, bridge, rest

    @property
    def ports(self) -> dict:
        return {
            "search_server_port": self.search.port,
            "unix_socket": self.unix.unix_path if self.unix else None,
            "web_socket_port": self.bridge.port if self.bridge else None,
            "http_port": self.rest.port if self.rest else None,
        }

    def _killable_threads(self):
        ts = [self.search._thread]
        if self.unix is not None:
            ts.append(self.unix._thread)
        return ts

    def wait(self, poll_s: float = 0.1) -> None:
        try:
            while all(t.is_alive() for t in self._killable_threads()):
                time.sleep(poll_s)
        except KeyboardInterrupt:
            pass
        self.shutdown()

    def shutdown(self) -> None:
        for srv in (self.bridge, self.rest, self.unix, self.search):
            if srv is None:
                continue
            try:
                srv.shutdown()
            except Exception:
                pass                      # already down (kill path)


def real_main(argv, out=sys.stdout, spark=None, block: bool = True):
    """gars.jl:82-138 real_main.  Returns the exit code when
    ``block=True`` (the CLI path); with ``block=False`` returns the
    started :class:`GarsServers` handle (or an int exit code if a
    validation gate fired) — the in-process embedding/tests path.

    ``spark=None`` creates the session via
    :func:`garamond_jl_spark.session.get_spark`; passing one in reuses
    it (never run two local Spark JVMs side by side)."""
    import garamond_jl_spark
    args = build_arg_parser().parse_args(argv)
    log = build_logger(args.log, args.log_level)

    # banner (gars.jl:84 printable_version analog)
    print(f"~ GARAMOND ~ v{garamond_jl_spark.__version__} "
          f"(PySpark engine)", file=out)

    # IP validation, reference order (gars.jl:98-106)
    if not isvalidip(args.web_socket_ip):
        log.warning("Web-socket IP %s is not valid. Exiting...",
                    args.web_socket_ip)
        return 0
    if not isvalidip(args.http_ip):
        log.warning("HTTP IP %s is not valid. Exiting...", args.http_ip)
        return 0

    # port sanity BEFORE the front-end check: a dropped bad HTTP port
    # can leave zero front-ends, which the next gate then catches
    args.http_port = normalize_http_port(args.http_port, log)

    # at least one front-end (gars.jl:112-116)
    if (args.unix_socket is None and args.web_socket_port is None
            and args.http_port is None):
        log.warning("At least a UNIX-socket, WEB-socket port or HTTP "
                    "port have to be specified. Use the -u, -w or -p "
                    "options. Exiting...")
        return 0

    io_port = normalize_io_port(args.search_server_port, log)

    # a data config or a cache (gars.jl:127-131)
    if args.data_config is None and args.env_cache is None:
        log.warning("Specify a data configuration or cache file using "
                    "the -d or -c options. Exiting...")
        return 0

    if spark is None:
        from garamond_jl_spark.session import get_spark
        spark = get_spark("gars")

    # environment: cache load beats rebuild (env.jl:31-39 posture)
    from garamond_jl_spark.plans.lifecycle import SearchEnv
    from garamond_jl_spark.utils import describe
    if args.env_cache is not None:
        from garamond_jl_spark.operators.persist import load_index
        env = SearchEnv(spark=spark,
                        index=load_index(spark, args.env_cache,
                                         resident=not args.no_resident))
    else:
        from garamond_jl_spark.plans.env_config import build_search_env
        env = build_search_env(spark, args.data_config)
        if not args.no_resident:
            # long-lived server: warm the whole env (classic resident
            # stats + persisted dense frames, operators/resident.py)
            from garamond_jl_spark.operators.resident import \
                make_env_resident
            make_env_resident(env)
    for line in describe(env).splitlines():
        log.info("%s", line)
    log.info("Searchers ready.")

    # I/O front-ends (gars.jl:134-141): search server first so the
    # WS bridge has a live io_port to front.  A bind failure midway
    # must not leak the transports already started (they would pin
    # ports/socket files with no handle returned to stop them).
    from garamond_jl_spark.server.socket import SocketServer
    search = SocketServer(env, port=io_port).start()
    unix = bridge = rest = None
    try:
        if args.unix_socket is not None:
            unix = SocketServer(env, unix_path=args.unix_socket).start()
        if args.web_socket_port is not None:
            from garamond_jl_spark.server.websocket import WebSocketBridge
            bridge = WebSocketBridge(io_port=search.port,
                                     host=args.web_socket_ip,
                                     port=args.web_socket_port).start()
        if args.http_port is not None:
            from garamond_jl_spark.server.rest import RestServer
            rest = RestServer(env, host=args.http_ip,
                              port=args.http_port).start()
    except Exception:
        GarsServers(env, search, unix=unix, bridge=bridge,
                    rest=rest).shutdown()
        raise

    servers = GarsServers(env, search, unix=unix, bridge=bridge, rest=rest)
    print("gars-ready " + json.dumps(servers.ports), file=out, flush=True)
    if not block:
        return servers
    servers.wait()
    return 0


if __name__ == "__main__":
    sys.exit(real_main(sys.argv[1:]))
