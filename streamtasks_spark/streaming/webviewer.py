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

Backpressure contract: ``publish`` never blocks — each connection
owns a BOUNDED outbound queue (default 256 messages) drained by a
per-connection sender thread. A slow browser loses the OLDEST queued
messages first (a viewer wants the latest state, the same trade the
reference UI makes by rendering only what arrives) and the drops are
counted on the connection; a browser that makes zero progress for
``send_timeout`` is disconnected outright. Driver memory is therefore
capped at ``queue_max × max payload`` per connection regardless of how
many micro-batches a stalled client sleeps through.
"""

from __future__ import annotations

import base64
import hashlib
import json
import socket
import struct
import threading
from collections import deque

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


# a client-declared inbound frame larger than this kills the
# connection: inbound payloads are read-and-discarded (module
# docstring), so no legitimate browser frame approaches it, and
# without a cap the 127-length encoding lets one header demand an
# unbounded driver-side buffer
MAX_INBOUND_FRAME = 1 << 20


class _SockReader:
    """Buffered reader whose partial state SURVIVES timeouts: bytes
    already received stay in ``buf`` when ``recv`` raises
    ``TimeoutError`` (the send path transiently sets a timeout on the
    shared socket). :func:`read_frame` parses via non-consuming
    ``fill``/``peek`` and consumes only once the WHOLE frame is
    buffered, so a timeout at ANY point mid-frame — even between
    header and payload — resumes cleanly instead of desyncing the
    stream. Seeded with any bytes the client pipelined after its
    handshake ``\\r\\n\\r\\n`` — a close/ping frame arriving in the
    same segment is no longer dropped.

    ``exact=True`` (the bare-socket compat mode) never requests more
    bytes from the socket than the current ``fill`` target, so a
    throwaway per-call wrapper cannot over-read into the next frame
    and silently discard it on return."""

    def __init__(self, sock: socket.socket, initial: bytes = b"",
                 exact: bool = False):
        self.sock = sock
        self.buf = bytearray(initial)
        self.exact = exact

    def fill(self, n: int) -> None:
        """Grow ``buf`` to ≥ n bytes without consuming anything."""
        while len(self.buf) < n:
            want = (n - len(self.buf)) if self.exact else 65536
            chunk = self.sock.recv(want)  # TimeoutError keeps self.buf
            if not chunk:
                raise ConnectionError("peer closed")
            self.buf += chunk

    def peek_at(self, offset: int, n: int) -> bytes:
        self.fill(offset + n)
        return bytes(self.buf[offset:offset + n])

    def take(self, n: int) -> bytes:
        self.fill(n)
        out = bytes(self.buf[:n])
        del self.buf[:n]
        return out


def read_frame(reader: "_SockReader | socket.socket") -> tuple[int, bytes]:
    """Read one (client→server, masked) frame; returns (opcode,
    unmasked payload). Accepts a :class:`_SockReader` (resumable
    across timeouts) or a bare socket (wrapped per-call in exact mode,
    which never over-reads past the frame — sequential bare-socket
    calls stay lossless). Nothing is consumed until the whole frame is
    buffered. Raises ``ConnectionError`` on a frame whose declared
    length exceeds :data:`MAX_INBOUND_FRAME` (client-controlled
    allocation must not be unbounded)."""
    if isinstance(reader, socket.socket):
        reader = _SockReader(reader, exact=True)
    b1, b2 = reader.peek_at(0, 2)
    opcode = b1 & 0x0F
    masked = bool(b2 & 0x80)
    length = b2 & 0x7F
    off = 2
    if length == 126:
        (length,) = struct.unpack("!H", reader.peek_at(off, 2))
        off += 2
    elif length == 127:
        (length,) = struct.unpack("!Q", reader.peek_at(off, 8))
        off += 8
    if length > MAX_INBOUND_FRAME:
        raise ConnectionError(
            f"inbound frame of {length} bytes exceeds cap {MAX_INBOUND_FRAME}"
        )
    if opcode >= 0x8 and length > 125:
        # RFC 6455 §5.5: control frames carry ≤ 125 payload bytes.
        # Admitting more would make the pong/close echo re-encode an
        # oversize length into the single control length byte
        # (corrupt frame at 126-255, struct.error above).
        raise ConnectionError(
            f"control frame 0x{opcode:x} with {length}-byte payload"
        )
    if masked:
        mask = reader.peek_at(off, 4)
        off += 4
    reader.fill(off + length)  # resumable point: nothing consumed yet
    frame = reader.take(off + length)
    raw = frame[off:]
    if masked:
        payload = bytes(c ^ mask[i % 4] for i, c in enumerate(raw))
    else:
        payload = raw
    return opcode, payload


class _Connection:
    """One subscribed browser. Outbound data rides a BOUNDED deque
    drained by a dedicated sender thread, so ``publish`` (which runs on
    the streaming query's foreachBatch driver thread) never blocks on a
    slow socket. Overflow drops the OLDEST queued message (a viewer
    wants the latest state) and bumps ``dropped``; a socket that makes
    no progress for ``send_timeout`` is disconnected outright — the
    viewer-semantics version of the reference's log-and-continue
    (task_web.py:392)."""

    def __init__(self, sock: socket.socket, topic: str,
                 send_timeout: float, queue_max: int = 256):
        self.sock = sock
        self.topic = topic
        self.lock = threading.Lock()  # guards socket writes
        self.alive = True
        self.send_timeout = send_timeout
        self.queue_max = queue_max
        self.outbox: deque[str] = deque()
        self.dropped = 0
        self._cv = threading.Condition()
        self._sender = threading.Thread(
            target=self._send_loop, name="ws-viewer-send", daemon=True
        )
        self._sender.start()

    def enqueue(self, payload: str) -> bool:
        """Non-blocking hand-off to the sender thread; returns False
        only for a connection already known dead."""
        with self._cv:
            if not self.alive:
                return False
            if len(self.outbox) >= self.queue_max:
                self.outbox.popleft()  # drop-oldest (documented policy)
                self.dropped += 1
            self.outbox.append(payload)
            self._cv.notify()
        return True

    def _send_loop(self) -> None:
        while True:
            with self._cv:
                while self.alive and not self.outbox:
                    self._cv.wait()
                if not self.alive:
                    return
                payload = self.outbox.popleft()
            if not self.send_text(payload):
                return

    def send_text(self, payload: str) -> bool:
        return self.send_raw(encode_text_frame(payload))

    def send_raw(self, data: bytes) -> bool:
        # once the OS send buffer fills, sendall blocks — bound it with
        # the send timeout and DROP the connection on expiry. The
        # timeout is set inside the lock and restored; the inbound
        # reader's _SockReader keeps partial frames across any timeout
        # it catches while sharing the socket. Control replies
        # (pong/close echo) go through here too: an unbounded sendall
        # on those paths would hold ``lock`` forever against a client
        # that pinged and then stalled, wedging the sender thread and
        # defeating the disconnect-on-no-progress contract.
        try:
            with self.lock:
                self.sock.settimeout(self.send_timeout)
                try:
                    self.sock.sendall(data)
                finally:
                    self.sock.settimeout(None)
            return True
        except OSError:  # includes TimeoutError
            self.kill()
            return False

    def kill(self) -> None:
        with self._cv:
            self.alive = False
            self.outbox.clear()
            self._cv.notify()
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


class TopicWebSocketServer:
    """Threaded websocket server: a browser GETs ``/topic/<name>`` and
    receives every payload later passed to :meth:`publish` for that
    topic. ``publish`` never blocks on a slow client beyond the OS
    send buffer; a failed send drops the connection (the reference
    logs-and-continues the same way, task_web.py:392)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0, *,
                 send_timeout: float = 5.0, queue_max: int = 256):
        self._send_timeout = send_timeout
        self._queue_max = queue_max
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
            # bytes the client pipelined after the handshake terminator
            # (e.g. an eager first frame) belong to the frame stream
            request, _, leftover = request.partition(b"\r\n\r\n")
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
        conn = _Connection(sock, topic, self._send_timeout,
                           self._queue_max)
        with self._conn_lock:
            self._conns.append(conn)
        # inbound loop: answer ping, honor close, discard the rest
        reader = _SockReader(sock, leftover)
        try:
            while conn.alive and not self._stop.is_set():
                try:
                    opcode, payload = read_frame(reader)
                except TimeoutError:
                    # the send path transiently shares its send_timeout
                    # with this socket (send_text restores it inside
                    # the lock); a timeout here is NOT a dead browser —
                    # the reader's buffer kept any partial frame, so
                    # just resume
                    continue
                if opcode == 0x8:  # close
                    # RFC 6455 §5.5.1: a close payload is 0 or ≥ 2
                    # bytes (status code); echo empty for a 1-byte one
                    echo = payload[:2] if len(payload) >= 2 else b""
                    conn.send_raw(_encode_control_frame(0x8, echo))
                    break
                if opcode == 0x9:  # ping -> pong
                    if not conn.send_raw(_encode_control_frame(0xA, payload)):
                        break  # stalled pinger: connection was killed
        except (ConnectionError, OSError):
            pass
        finally:
            conn.kill()  # also wakes + terminates the sender thread
            with self._conn_lock:
                if conn in self._conns:
                    self._conns.remove(conn)

    # ----------------------------------------------------- publish path

    def publish(self, topic: str, message: dict) -> int:
        """Broadcast one JSON-serializable message to every connection
        subscribed to ``topic``; returns the number of live hand-offs.
        NEVER blocks: each connection's sender thread drains its own
        bounded queue, so N simultaneously stalled browsers cost this
        (foreachBatch driver) thread O(N) queue appends, not
        N × send_timeout. NaN is rejected like the reference
        (allow_nan=False, task_web.py:390) so browsers never receive
        invalid JSON."""
        payload = json.dumps(message, allow_nan=False)
        delivered = 0
        with self._conn_lock:
            conns = [c for c in self._conns if c.topic == topic]
        for c in conns:
            if c.enqueue(payload):
                delivered += 1
            else:
                # the reader thread also unwinds via the shutdown, but
                # the subscriber list must not keep counting a dead
                # browser until it does
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
            c.kill()
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
        if pause_col is not None and pause_col not in batch_df.columns:
            # a typo'd pause_col must not silently degrade to the
            # plain-data path (rows forwarded with no control
            # envelopes would hide the misconfiguration)
            raise ValueError(
                f"pause_col {pause_col!r} not in batch schema "
                f"{batch_df.columns}"
            )
        if pause_col is not None:
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
    if pause_col is not None and pause_col not in df.columns:
        # fail HERE, synchronously, with a direct stack trace — not as
        # a StreamingQueryException on the first micro-batch (the
        # in-closure check remains for direct topic_push_batch users)
        raise ValueError(
            f"pause_col {pause_col!r} not in stream schema {df.columns}"
        )
    return (
        df.writeStream.foreachBatch(topic_push_batch(server, topic, pause_col))
        .option("checkpointLocation", checkpoint)
        .start()
    )
