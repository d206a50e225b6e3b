"""Serving-layer transports (reference src/server/*).

Engine scope ends at :func:`plans.lifecycle.response_json`; this
package holds the thin transports that carry those responses — the
REST/HTTP server (:mod:`rest`, rest.jl analog), the line-JSON
TCP / unix-domain-socket servers (:mod:`socket`, search.jl:28-127 +
unixsocket.jl analogs), and the WebSocket bridge (:mod:`websocket`,
websocket.jl analog — RFC 6455 hand-rolled over the stdlib since the
container ships no websocket library).
"""

from garamond_jl_spark.server.rest import RestServer, rest_server
from garamond_jl_spark.server.socket import (SocketServer, socket_server,
                                             unix_socket_server)
from garamond_jl_spark.server.websocket import (WebSocketBridge,
                                                web_socket_server)

__all__ = ["RestServer", "rest_server", "SocketServer", "socket_server",
           "unix_socket_server", "WebSocketBridge", "web_socket_server"]
