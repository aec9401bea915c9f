"""Browser push for topic streams — the reference's WebViewer
transport (system/task_web.py:382-396: a websocket endpoint per topic
that forwards each message as ``{"type": "data", "data": ...}`` and
pause/resume control as ``{"type": "control", "data": {"paused":
...}}``).

The engine analog: :class:`TopicWebSocketServer` is a dependency-free
RFC 6455 websocket server (stdlib sockets + the SHA-1/base64 handshake
from the public spec); :func:`websocket_viewer` starts a streaming
query whose ``foreachBatch`` callback broadcasts every micro-batch row
to the browsers subscribed to that topic, with the reference's exact
message envelope.

Scale posture: a viewer is an EDGE adapter — its entire purpose is to
move a (human-bounded) stream off the cluster to one browser, the same
class as the device-playback collect in media/capture.py. The
per-batch ``toJSON().collect()`` is therefore the point, not a scale
bug; the cluster-side plan upstream of the sink stays distributed, and
a viewer on an unbounded stream should subscribe downstream of a
throttling/windowing operator exactly as the reference UI does.

Protocol scope (deliberate): server→client text frames, close
handshake, and ping→pong. Client→server payloads are read and
discarded (the reference handler also ignores inbound messages —
task_web.py:386). No TLS, no permessage-deflate, no fragmentation
reassembly — browsers never require them for this shape.
"""

from __future__ import annotations

import base64
import hashlib
import json
import socket
import struct
import threading

# fixed GUID from RFC 6455 §1.3 (public spec constant)
_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


def _accept_key(client_key: str) -> str:
    digest = hashlib.sha1((client_key + _WS_GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def encode_text_frame(payload: str) -> bytes:
    """Server→client unmasked text frame (FIN set, opcode 0x1), with
    the three RFC 6455 length encodings."""
    data = payload.encode("utf-8")
    n = len(data)
    if n < 126:
        header = struct.pack("!BB", 0x81, n)
    elif n <= 0xFFFF:
        header = struct.pack("!BBH", 0x81, 126, n)
    else:
        header = struct.pack("!BBQ", 0x81, 127, n)
    return header + data


def _encode_control_frame(opcode: int, payload: bytes = b"") -> bytes:
    return struct.pack("!BB", 0x80 | opcode, len(payload)) + payload


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


def read_frame(sock: socket.socket) -> tuple[int, bytes]:
    """Read one (client→server, masked) frame; returns (opcode,
    unmasked payload)."""
    b1, b2 = _read_exact(sock, 2)
    opcode = b1 & 0x0F
    masked = bool(b2 & 0x80)
    length = b2 & 0x7F
    if length == 126:
        (length,) = struct.unpack("!H", _read_exact(sock, 2))
    elif length == 127:
        (length,) = struct.unpack("!Q", _read_exact(sock, 8))
    if masked:
        mask = _read_exact(sock, 4)
        raw = _read_exact(sock, length)
        payload = bytes(c ^ mask[i % 4] for i, c in enumerate(raw))
    else:
        payload = _read_exact(sock, length)
    return opcode, payload


class _Connection:
    def __init__(self, sock: socket.socket, topic: str,
                 send_timeout: float):
        self.sock = sock
        self.topic = topic
        self.lock = threading.Lock()
        self.alive = True
        self.send_timeout = send_timeout

    def send_text(self, payload: str) -> bool:
        # a stalled browser must never wedge the publishing thread
        # (which is the streaming query's foreachBatch driver thread):
        # once the OS send buffer fills, sendall blocks — bound it with
        # the send timeout and DROP the connection on expiry, the
        # viewer-semantics version of the reference's log-and-continue
        # (task_web.py:392). The timeout is set inside the lock and
        # restored, so the inbound reader (which tolerates timeouts)
        # only transiently shares it.
        try:
            with self.lock:
                self.sock.settimeout(self.send_timeout)
                try:
                    self.sock.sendall(encode_text_frame(payload))
                finally:
                    self.sock.settimeout(None)
            return True
        except OSError:  # includes TimeoutError
            self.alive = False
            try:
                # shutdown (not just close) wakes the reader thread
                # blocked in recv so the connection fully unwinds
                self.sock.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
            try:
                self.sock.close()
            except OSError:
                pass
            return False


class TopicWebSocketServer:
    """Threaded websocket server: a browser GETs ``/topic/<name>`` and
    receives every payload later passed to :meth:`publish` for that
    topic. ``publish`` never blocks on a slow client beyond the OS
    send buffer; a failed send drops the connection (the reference
    logs-and-continues the same way, task_web.py:392)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0, *,
                 send_timeout: float = 5.0):
        self._send_timeout = send_timeout
        self._listener = socket.create_server((host, port))
        self._listener.settimeout(0.2)
        self.host, self.port = self._listener.getsockname()[:2]
        self._conns: list[_Connection] = []
        self._conn_lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._accept_loop, name="ws-viewer-accept", daemon=True
        )
        self._thread.start()

    @property
    def url(self) -> str:
        return f"ws://{self.host}:{self.port}"

    # ------------------------------------------------------ accept path

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                sock, _ = self._listener.accept()
            except TimeoutError:
                continue
            except OSError:
                return
            threading.Thread(
                target=self._handshake_and_serve, args=(sock,), daemon=True
            ).start()

    def _handshake_and_serve(self, sock: socket.socket) -> None:
        try:
            request = b""
            while b"\r\n\r\n" not in request:
                chunk = sock.recv(4096)
                if not chunk:
                    sock.close()
                    return
                request += chunk
            head = request.decode("latin-1")
            lines = head.split("\r\n")
            path = lines[0].split(" ")[1]
            headers = {}
            for ln in lines[1:]:
                if ": " in ln:
                    k, v = ln.split(": ", 1)
                    headers[k.lower()] = v
            key = headers.get("sec-websocket-key")
            if not key or not path.startswith("/topic/"):
                sock.sendall(b"HTTP/1.1 400 Bad Request\r\n\r\n")
                sock.close()
                return
            topic = path[len("/topic/"):]
            sock.sendall(
                (
                    "HTTP/1.1 101 Switching Protocols\r\n"
                    "Upgrade: websocket\r\n"
                    "Connection: Upgrade\r\n"
                    f"Sec-WebSocket-Accept: {_accept_key(key)}\r\n\r\n"
                ).encode()
            )
        except OSError:
            sock.close()
            return
        except Exception:  # malformed request line/headers/encoding
            try:
                sock.sendall(b"HTTP/1.1 400 Bad Request\r\n\r\n")
            except OSError:
                pass
            sock.close()
            return
        conn = _Connection(sock, topic, self._send_timeout)
        with self._conn_lock:
            self._conns.append(conn)
        # inbound loop: answer ping, honor close, discard the rest
        try:
            while conn.alive and not self._stop.is_set():
                try:
                    opcode, payload = read_frame(sock)
                except TimeoutError:
                    # the send path transiently shares its send_timeout
                    # with this socket (send_text restores it inside
                    # the lock); a timeout here is NOT a dead browser —
                    # keep reading
                    continue
                if opcode == 0x8:  # close
                    with conn.lock:
                        sock.sendall(_encode_control_frame(0x8, payload[:2]))
                    break
                if opcode == 0x9:  # ping -> pong
                    with conn.lock:
                        sock.sendall(_encode_control_frame(0xA, payload))
        except (ConnectionError, OSError):
            pass
        finally:
            conn.alive = False
            with self._conn_lock:
                if conn in self._conns:
                    self._conns.remove(conn)
            try:
                sock.close()
            except OSError:
                pass

    # ----------------------------------------------------- publish path

    def publish(self, topic: str, message: dict) -> int:
        """Broadcast one JSON-serializable message to every connection
        subscribed to ``topic``; returns the number of live deliveries.
        NaN is rejected like the reference (allow_nan=False,
        task_web.py:390) so browsers never receive invalid JSON."""
        payload = json.dumps(message, allow_nan=False)
        delivered = 0
        with self._conn_lock:
            conns = [c for c in self._conns if c.topic == topic]
        for c in conns:
            if c.send_text(payload):
                delivered += 1
            else:
                # drop immediately: the reader thread also unwinds via
                # the shutdown, but the subscriber list must not keep
                # counting a dead browser until it does
                with self._conn_lock:
                    if c in self._conns:
                        self._conns.remove(c)
        return delivered

    def connection_count(self, topic: str | None = None) -> int:
        with self._conn_lock:
            return sum(
                1 for c in self._conns if topic is None or c.topic == topic
            )

    def close(self) -> None:
        self._stop.set()
        try:
            self._listener.close()
        except OSError:
            pass
        with self._conn_lock:
            conns, self._conns = self._conns, []
        for c in conns:
            try:
                c.sock.close()
            except OSError:
                pass
        self._thread.join(timeout=2)


def topic_push_batch(server: TopicWebSocketServer, topic: str,
                     pause_col: str | None = None):
    """foreachBatch callback factory producing the reference's exact
    topic behavior (net/__init__.py:285-287 latch; task_web.py:386-391
    envelopes). Without ``pause_col``, every row is a data envelope.
    With it (the pause-as-data convention — pause_state annotates each
    data row with the latched paused flag, operators/stateful.py), the
    viewer behaves like a reference topic: a control envelope
    ``{"paused": ...}`` is pushed at every pause-state TRANSITION in
    row order, data rows are forwarded (flag stripped) only while
    unpaused, and rows during a paused span are suppressed — a paused
    reference topic transmits control, not data. The latch resets per
    micro-batch start: re-announcing the current state to possibly-new
    subscribers is the reference's replay-to-late-joiners behavior."""

    def push(batch_df, _batch_id: int) -> None:
        if pause_col is not None and pause_col in batch_df.columns:
            last_paused = None  # unknown at batch start -> re-announce
            for raw in batch_df.toJSON().collect():
                row = json.loads(raw)
                # toJSON omits NULL columns; treat absent as unpaused
                paused = bool(row.pop(pause_col, False))
                if paused != last_paused:
                    server.publish(
                        topic,
                        {"type": "control", "data": {"paused": paused}},
                    )
                    last_paused = paused
                if not paused:
                    server.publish(topic, {"type": "data", "data": row})
        else:
            for raw in batch_df.toJSON().collect():
                server.publish(
                    topic, {"type": "data", "data": json.loads(raw)}
                )

    return push


def websocket_viewer(df, server: TopicWebSocketServer, topic: str, *,
                     checkpoint: str, pause_col: str | None = None):
    """Start a streaming query that pushes ``df`` to the browsers
    subscribed at ``{server.url}/topic/{topic}`` — the WebViewer sink.
    Composes with sinks.foreach_batch_viewer's transport point."""
    return (
        df.writeStream.foreachBatch(topic_push_batch(server, topic, pause_col))
        .option("checkpointLocation", checkpoint)
        .start()
    )
