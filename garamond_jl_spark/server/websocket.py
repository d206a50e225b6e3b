"""S6 WebSocket transport — RFC 6455 over the line-JSON search server.

The reference's ``web_socket_server`` (src/server/websocket.jl:25-41) is
a protocol BRIDGE, not a second engine endpoint: every WebSocket text
message carries exactly one line-JSON request, which is forwarded over a
fresh TCP connection to the search server (``connect`` → ``println`` →
``readline`` → ``close``), and the one-line response is written back as
one WebSocket message.  Empty messages are ignored (websocket.jl:31).
This module reproduces that shape 1:1 on top of
:class:`~garamond_jl_spark.server.socket.SocketServer`.

No websocket library ships in this sandbox, so the handshake and frame
codec below implement the public RFC 6455 wire format directly with the
stdlib (sha1 + base64 accept key, 2/8-byte extended lengths, client
masking, ping/pong, continuation frames, close echo).  Like the REST and
raw-socket transports, everything here is driver-side glue: each
forwarded request still executes as a distributed Spark plan.
"""

from __future__ import annotations

import base64
import hashlib
import json
import socket
import socketserver
import threading
from typing import BinaryIO

# RFC 6455 §1.3 — fixed, spec-mandated GUID for the accept-key digest.
_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT, OP_TEXT, OP_BIN = 0x0, 0x1, 0x2
OP_CLOSE, OP_PING, OP_PONG = 0x8, 0x9, 0xA

# largest client frame honored (search requests are <1 KB; this is
# pure DoS headroom) — larger declared lengths close with 1009
MAX_FRAME_BYTES = 8 * 1024 * 1024


class FrameTooBig(Exception):
    def __init__(self, n: int):
        super().__init__(f"frame declares {n} bytes")


def accept_key(client_key: str) -> str:
    """Sec-WebSocket-Accept for a client's Sec-WebSocket-Key (§4.2.2)."""
    digest = hashlib.sha1((client_key + _WS_GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def _read_exact(rfile: BinaryIO, n: int) -> bytes:
    parts = []                 # list-accumulate: += on bytes is O(n^2)
    got = 0
    while got < n:
        chunk = rfile.read(n - got)
        if not chunk:
            raise ConnectionError("peer closed mid-frame")
        parts.append(chunk)
        got += len(chunk)
    return b"".join(parts)


def read_frame(rfile: BinaryIO) -> tuple[bool, int, bool, bytes]:
    """→ (fin, opcode, was_masked, unmasked_payload)  (§5.2)."""
    b0, b1 = _read_exact(rfile, 2)
    fin, opcode = bool(b0 & 0x80), b0 & 0x0F
    masked, ln = bool(b1 & 0x80), b1 & 0x7F
    if ln == 126:
        ln = int.from_bytes(_read_exact(rfile, 2), "big")
    elif ln == 127:
        ln = int.from_bytes(_read_exact(rfile, 8), "big")
    if ln > MAX_FRAME_BYTES:
        # a client-declared length is untrusted input: honoring an
        # arbitrary 2^63 value would let one frame OOM the DRIVER
        # process hosting the SparkSession
        raise FrameTooBig(ln)
    mask = _read_exact(rfile, 4) if masked else b""
    payload = _read_exact(rfile, ln)
    if masked:
        payload = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
    return fin, opcode, masked, payload


def write_frame(wfile: BinaryIO, payload: bytes, opcode: int = OP_TEXT,
                fin: bool = True) -> None:
    """Server→client frame; never masked (§5.1)."""
    head = bytes([(0x80 if fin else 0) | opcode])
    n = len(payload)
    if n < 126:
        head += bytes([n])
    elif n < 1 << 16:
        head += bytes([126]) + n.to_bytes(2, "big")
    else:
        head += bytes([127]) + n.to_bytes(8, "big")
    wfile.write(head + payload)
    wfile.flush()


class _WSHandler(socketserver.StreamRequestHandler):
    def _handshake(self) -> bool:
        request_line = self.rfile.readline(8192).decode("latin-1")
        headers: dict[str, str] = {}
        while True:
            raw = self.rfile.readline(8192)
            if raw in (b"\r\n", b"\n", b""):
                break
            name, _, value = raw.decode("latin-1").partition(":")
            headers[name.strip().lower()] = value.strip()
        key = headers.get("sec-websocket-key")
        if ("websocket" not in headers.get("upgrade", "").lower()
                or not key or not request_line.startswith("GET")):
            self.wfile.write(b"HTTP/1.1 400 Bad Request\r\n"
                             b"Connection: close\r\n\r\n")
            return False
        self.wfile.write(
            b"HTTP/1.1 101 Switching Protocols\r\n"
            b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
            b"Sec-WebSocket-Accept: " + accept_key(key).encode()
            + b"\r\n\r\n")
        self.wfile.flush()
        return True

    def _forward(self, line: str) -> str:
        """One request/response against the search server — a fresh TCP
        connection per message, exactly websocket.jl:33-37."""
        bridge: WebSocketBridge = self.server.bridge  # type: ignore[attr-defined]
        with socket.create_connection((bridge.io_host, bridge.io_port),
                                      timeout=bridge.io_timeout) as conn:
            conn.sendall(line.encode() + b"\n")
            buf = b""
            while not buf.endswith(b"\n"):
                chunk = conn.recv(65536)
                if not chunk:            # server closed (e.g. after kill)
                    break
                buf += chunk
        return buf.decode().rstrip("\n")

    def handle(self) -> None:
        if not self._handshake():
            return
        message = b""
        try:
            while True:
                fin, opcode, masked, payload = read_frame(self.rfile)
                if not masked:
                    # EVERY client frame (control included) must be
                    # masked; close 1002 before any opcode handling
                    # (RFC 6455 para 5.1)
                    write_frame(self.wfile, (1002).to_bytes(2, "big"),
                                OP_CLOSE)
                    return
                if opcode == OP_PING:
                    write_frame(self.wfile, payload, OP_PONG)
                    continue
                if opcode == OP_PONG:
                    continue
                if opcode == OP_CLOSE:
                    write_frame(self.wfile, payload[:2], OP_CLOSE)
                    return
                if opcode in (OP_TEXT, OP_BIN):
                    message = payload
                elif opcode == OP_CONT:
                    if len(message) + len(payload) > MAX_FRAME_BYTES:
                        # the per-frame cap must also bound the
                        # ASSEMBLED message or fragmentation bypasses
                        # the OOM guard
                        raise FrameTooBig(len(message) + len(payload))
                    message += payload
                else:                    # reserved opcode → protocol error
                    write_frame(self.wfile, (1002).to_bytes(2, "big"),
                                OP_CLOSE)
                    return
                if not fin:
                    continue
                text = message.decode("utf-8", errors="replace").strip()
                message = b""
                if not text:             # isempty(request) gate (ws.jl:31)
                    continue
                if "\n" in text:
                    # the io wire is newline-framed: a pretty-printed
                    # JSON message would be split into one garbage
                    # request per line — compact it first
                    try:
                        text = json.dumps(json.loads(text))
                    except ValueError:
                        text = " ".join(text.split())
                write_frame(self.wfile, self._forward(text).encode(),
                            OP_TEXT)
        except FrameTooBig:
            try:                         # 1009 Message Too Big
                write_frame(self.wfile, (1009).to_bytes(2, "big"), OP_CLOSE)
            except OSError:
                pass
            return
        except ConnectionError:
            return                       # client went away mid-frame
        except OSError:                  # search server unreachable → 1011
            try:
                write_frame(self.wfile, (1011).to_bytes(2, "big"), OP_CLOSE)
            except OSError:
                pass


class _TCP(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


class WebSocketBridge:
    """RFC 6455 endpoint forwarding each text message to the line-JSON
    search server at ``io_host:io_port`` (the reference's two-port
    topology: web_socket_server(port, io_port), websocket.jl:11-13)."""

    def __init__(self, io_port: int, io_host: str = "127.0.0.1",
                 host: str = "127.0.0.1", port: int = 0,
                 io_timeout: float = 600.0):
        self.io_host, self.io_port, self.io_timeout = \
            io_host, io_port, io_timeout
        self.server = _TCP((host, port), _WSHandler)
        self.server.bridge = self  # type: ignore[attr-defined]
        self.host, self.port = self.server.server_address[:2]
        self._thread = threading.Thread(target=self.server.serve_forever,
                                        daemon=True)

    def start(self) -> "WebSocketBridge":
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self.server.shutdown()
        self.server.server_close()


def web_socket_server(env, host: str = "127.0.0.1",
                      port: int = 0) -> tuple[WebSocketBridge, object]:
    """Convenience single-process topology: start a private line-JSON
    search server for ``env`` plus the WebSocket bridge in front of it.
    Returns ``(bridge, socket_server)``; shut down both when done."""
    from garamond_jl_spark.server.socket import socket_server
    ss = socket_server(env)
    bridge = WebSocketBridge(io_port=ss.port, io_host=ss.host,
                             host=host, port=port).start()
    return bridge, ss
