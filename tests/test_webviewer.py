"""WebViewer transport tests: an RFC 6455 client implemented on raw
sockets drives the stdlib websocket server end-to-end — handshake,
publish/receive, ping/pong, close — then a Structured Streaming query
pushes real micro-batches through websocket_viewer and the browser
side receives the reference's message envelope (task_web.py:382-396).
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import socket
import struct
import time

import pytest

from streamtasks_spark.streaming.webviewer import (
    TopicWebSocketServer,
    _accept_key,
    encode_text_frame,
    websocket_viewer,
)


# ------------------------------------------------------- raw WS client

def _client_connect(host: str, port: int, topic: str) -> socket.socket:
    s = socket.create_connection((host, port), timeout=10)
    key = base64.b64encode(os.urandom(16)).decode()
    s.sendall(
        (
            f"GET /topic/{topic} HTTP/1.1\r\n"
            f"Host: {host}:{port}\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n"
        ).encode()
    )
    resp = b""
    while b"\r\n\r\n" not in resp:
        resp += s.recv(4096)
    head = resp.decode("latin-1")
    assert "101" in head.split("\r\n")[0], head
    expect = base64.b64encode(
        hashlib.sha1(
            (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").encode()
        ).digest()
    ).decode()
    assert f"Sec-WebSocket-Accept: {expect}" in head
    return s


def _client_read_frame(s: socket.socket) -> tuple[int, bytes]:
    def rx(n):
        buf = b""
        while len(buf) < n:
            chunk = s.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("closed")
            buf += chunk
        return buf

    b1, b2 = rx(2)
    opcode = b1 & 0x0F
    length = b2 & 0x7F
    if length == 126:
        (length,) = struct.unpack("!H", rx(2))
    elif length == 127:
        (length,) = struct.unpack("!Q", rx(8))
    assert not (b2 & 0x80), "server frames must be unmasked"
    return opcode, rx(length)


def _client_send_frame(s: socket.socket, opcode: int, payload: bytes = b""):
    mask = os.urandom(4)
    masked = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
    s.sendall(
        struct.pack("!BB", 0x80 | opcode, 0x80 | len(payload)) + mask + masked
    )


def _recv_json(s: socket.socket) -> dict:
    opcode, payload = _client_read_frame(s)
    assert opcode == 0x1
    return json.loads(payload.decode())


# ------------------------------------------------------------ protocol

def test_accept_key_matches_rfc6455_example():
    # the worked example from RFC 6455 §1.3 (public test vector)
    assert (
        _accept_key("dGhlIHNhbXBsZSBub25jZQ==")
        == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="
    )


def test_frame_length_encodings_roundtrip():
    for n in (0, 1, 125, 126, 4096, 65535, 65536, 70000):
        frame = encode_text_frame("x" * n)
        b1, b2 = frame[0], frame[1]
        assert b1 == 0x81
        if n < 126:
            assert b2 == n and len(frame) == 2 + n
        elif n <= 0xFFFF:
            assert b2 == 126
            assert struct.unpack("!H", frame[2:4])[0] == n
            assert len(frame) == 4 + n
        else:
            assert b2 == 127
            assert struct.unpack("!Q", frame[2:10])[0] == n
            assert len(frame) == 10 + n


def _masked_frame(opcode: int, payload: bytes) -> bytes:
    mask = b"\x01\x02\x03\x04"
    masked = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
    if len(payload) < 126:
        head = struct.pack("!BB", 0x80 | opcode, 0x80 | len(payload))
    else:
        head = struct.pack("!BBH", 0x80 | opcode, 0x80 | 126, len(payload))
    return head + mask + masked


class _FakeSock:
    """Scripted recv source: each entry is bytes to return or an
    exception instance to raise (simulating the send path's transient
    timeout landing mid-frame)."""

    def __init__(self, script):
        self.script = list(script)

    def recv(self, n):
        step = self.script.pop(0)
        if isinstance(step, BaseException):
            raise step
        return step[:n] if n < len(step) else step


def test_read_frame_resumes_after_mid_frame_timeout():
    from streamtasks_spark.streaming.webviewer import _SockReader, read_frame

    frame = _masked_frame(0x9, b"hello-ping")
    # header arrives, then a TimeoutError fires BETWEEN header and
    # payload (the worst spot: bytes already parsed-ahead), then the rest
    reader = _SockReader(_FakeSock([frame[:2], TimeoutError(), frame[2:]]))
    with pytest.raises(TimeoutError):
        read_frame(reader)
    opcode, payload = read_frame(reader)  # resume: nothing was consumed
    assert (opcode, payload) == (0x9, b"hello-ping")


def test_read_frame_rejects_oversized_declared_length():
    from streamtasks_spark.streaming.webviewer import _SockReader, read_frame

    # 127-encoding header declaring 2^40 bytes; no payload ever sent
    head = struct.pack("!BBQ", 0x88, 0x80 | 127, 1 << 40)
    reader = _SockReader(_FakeSock([head]))
    with pytest.raises(ConnectionError, match="exceeds cap"):
        read_frame(reader)


def test_read_frame_rejects_oversized_control_frame():
    # RFC 6455 §5.5 caps control payloads at 125 bytes; admitting a
    # longer ping would make the pong echo re-encode the length into
    # the single control length byte (corrupt frame / struct.error)
    from streamtasks_spark.streaming.webviewer import _SockReader, read_frame

    reader = _SockReader(_FakeSock([_masked_frame(0x9, b"p" * 200)]))
    with pytest.raises(ConnectionError, match="control frame"):
        read_frame(reader)
    # data frames of the same length stay fine
    reader = _SockReader(_FakeSock([_masked_frame(0x1, b"d" * 200)]))
    assert read_frame(reader) == (0x1, b"d" * 200)


def test_close_echo_of_one_byte_payload_is_rfc_valid():
    # §5.5.1: a close payload is 0 or ≥2 bytes; echoing a client's
    # malformed 1-byte close verbatim would itself be protocol-invalid
    srv = TopicWebSocketServer()
    try:
        c = _client_connect(srv.host, srv.port, "oddclose")
        deadline = time.time() + 5
        while srv.connection_count("oddclose") < 1 and time.time() < deadline:
            time.sleep(0.05)
        _client_send_frame(c, 0x8, b"\x03")
        opcode, payload = _client_read_frame(c)
        assert (opcode, payload) == (0x8, b"")
        c.close()
    finally:
        srv.close()


def test_bare_socket_read_frame_is_lossless_across_pipelined_frames():
    """Two frames in one TCP segment, read with two sequential
    bare-socket read_frame calls: exact mode must not over-read frame 2
    into the first call's throwaway buffer."""
    from streamtasks_spark.streaming.webviewer import read_frame

    f1 = _masked_frame(0x1, b"first")
    f2 = _masked_frame(0x1, b"second")
    a, b = socket.socketpair()
    try:
        b.sendall(f1 + f2)
        assert read_frame(a) == (0x1, b"first")
        assert read_frame(a) == (0x1, b"second")
    finally:
        a.close()
        b.close()


def test_websocket_viewer_rejects_bad_pause_col_synchronously(spark):
    from streamtasks_spark.streaming.webviewer import websocket_viewer

    srv = TopicWebSocketServer()
    try:
        stream = (
            spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        )
        with pytest.raises(ValueError, match="pause_col"):
            websocket_viewer(
                stream, srv, "t", checkpoint="/tmp/never-used", pause_col="nope"
            )
    finally:
        srv.close()


def test_publish_reaches_only_subscribed_topic_and_pings_pong():
    srv = TopicWebSocketServer()
    try:
        a = _client_connect(srv.host, srv.port, "alpha")
        b = _client_connect(srv.host, srv.port, "beta")
        deadline = time.time() + 5
        while srv.connection_count() < 2 and time.time() < deadline:
            time.sleep(0.05)
        assert srv.connection_count("alpha") == 1

        delivered = srv.publish("alpha", {"type": "data", "data": {"v": 1}})
        assert delivered == 1
        assert _recv_json(a) == {"type": "data", "data": {"v": 1}}

        # a large payload exercises the 16-bit length path end to end
        big = {"type": "data", "data": {"blob": "y" * 50_000}}
        srv.publish("beta", big)
        assert _recv_json(b) == big

        # ping -> pong with payload echo
        _client_send_frame(a, 0x9, b"hb")
        opcode, payload = _client_read_frame(a)
        assert (opcode, payload) == (0xA, b"hb")

        # close handshake: server echoes close and drops the conn
        _client_send_frame(a, 0x8, struct.pack("!H", 1000))
        opcode, _ = _client_read_frame(a)
        assert opcode == 0x8
        deadline = time.time() + 5
        while srv.connection_count("alpha") and time.time() < deadline:
            time.sleep(0.05)
        assert srv.connection_count("alpha") == 0
        b.close()
    finally:
        srv.close()


def test_publish_rejects_nan_like_reference():
    srv = TopicWebSocketServer()
    try:
        with pytest.raises(ValueError):
            srv.publish("t", {"type": "data", "data": {"v": float("nan")}})
    finally:
        srv.close()


# ----------------------------------------------------------- streaming

def test_websocket_viewer_pushes_micro_batches(spark, tmp_path):
    srv = TopicWebSocketServer()
    try:
        c = _client_connect(srv.host, srv.port, "events")
        deadline = time.time() + 5
        while srv.connection_count("events") < 1 and time.time() < deadline:
            time.sleep(0.05)

        src = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", "5")
            .option("numPartitions", "1")
            .load()
            .selectExpr("value AS v")
        )
        q = websocket_viewer(
            src, srv, "events", checkpoint=str(tmp_path / "ckpt")
        )
        try:
            got = []
            deadline = time.time() + 60
            c.settimeout(60)
            while len(got) < 5 and time.time() < deadline:
                msg = _recv_json(c)
                assert msg["type"] == "data"
                got.append(msg["data"]["v"])
        finally:
            q.stop()
        assert got[:5] == [0, 1, 2, 3, 4]
        c.close()
    finally:
        srv.close()


def test_pipeline_websocket_sink(spark, tmp_path):
    """A deployment graph can name a websocket sink directly (the
    reference deployment's web-UI topic push): stage -> browser,
    subscribed at /topic/<stage name>."""
    from streamtasks_spark.plans.pipeline import Pipeline

    srv = TopicWebSocketServer()
    try:
        c = _client_connect(srv.host, srv.port, "out")
        deadline = time.time() + 5
        while srv.connection_count("out") < 1 and time.time() < deadline:
            time.sleep(0.05)

        p = Pipeline("ws_demo")
        p.source(
            "src",
            lambda s: s.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", "3")
            .option("numPartitions", "1")
            .load(),
        )
        p.stage("out", lambda df: df.selectExpr("value AS v"), "src")
        queries = p.start(
            spark,
            sinks={"out": {"format": "websocket", "server": srv}},
            checkpoint_root=str(tmp_path),
        )
        try:
            got = []
            c.settimeout(60)
            deadline = time.time() + 60
            while len(got) < 3 and time.time() < deadline:
                msg = _recv_json(c)
                got.append(msg["data"]["v"])
        finally:
            p.stop()
        assert got[:3] == [0, 1, 2]
        assert len(queries) == 1
        c.close()
    finally:
        srv.close()


def test_stalled_client_is_dropped_not_wedging_publish():
    """A browser that stops reading must not block publish() (which
    runs on the streaming query's foreachBatch thread) beyond the send
    timeout: once the socket buffers fill, the connection is dropped
    and publish returns 0 deliveries."""
    srv = TopicWebSocketServer(send_timeout=1.0)
    try:
        c = _client_connect(srv.host, srv.port, "slow")
        deadline = time.time() + 5
        while srv.connection_count("slow") < 1 and time.time() < deadline:
            time.sleep(0.05)
        # shrink both buffer sides so the stall trips fast
        with srv._conn_lock:
            srv._conns[0].sock.setsockopt(
                socket.SOL_SOCKET, socket.SO_SNDBUF, 16_384
            )
        c.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 16_384)

        big = {"type": "data", "data": {"blob": "z" * 200_000}}
        t0 = time.time()
        deadline = time.time() + 30
        while srv.connection_count("slow") and time.time() < deadline:
            srv.publish("slow", big)  # client never reads
        elapsed = time.time() - t0
        assert srv.connection_count("slow") == 0, "stalled client kept"
        # each blocked send bounded by the 1s timeout (+ slack)
        assert elapsed < 15, f"publish wedged for {elapsed:.1f}s"
        assert srv.publish("slow", big) == 0
        c.close()
    finally:
        srv.close()


def test_pinging_stalled_client_is_dropped_not_deadlocked():
    """Regression: a client that fills the send buffer and then PINGS
    used to wedge the reader thread forever — the pong reply was a
    naked sendall with no timeout, taken while holding the connection
    lock, so the sender thread could never time out either. The pong
    now rides the timeout-bounded send_raw: the connection must die
    within ~send_timeout instead of leaking both threads."""
    srv = TopicWebSocketServer(send_timeout=1.0)
    try:
        c = _client_connect(srv.host, srv.port, "pinger")
        deadline = time.time() + 5
        while srv.connection_count("pinger") < 1 and time.time() < deadline:
            time.sleep(0.05)
        with srv._conn_lock:
            srv._conns[0].sock.setsockopt(
                socket.SOL_SOCKET, socket.SO_SNDBUF, 16_384
            )
        c.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 16_384)

        # fill the socket's send buffer with data the client never reads
        big = {"type": "data", "data": {"blob": "z" * 200_000}}
        for _ in range(8):
            srv.publish("pinger", big)
        time.sleep(0.2)  # let the sender thread start blocking
        _client_send_frame(c, 0x9, b"hello?")  # ping into the wedge

        deadline = time.time() + 10
        while srv.connection_count("pinger") and time.time() < deadline:
            time.sleep(0.1)
        assert srv.connection_count("pinger") == 0, (
            "pinging stalled client kept alive — pong path wedged"
        )
        c.close()
    finally:
        srv.close()


def test_stalled_client_soak_bounds_driver_memory():
    """Slow-consumer soak: ~1k published batches at a client that never
    reads must neither block publish nor accumulate unbounded driver
    state. The per-connection outbox is a bounded deque (drop-oldest,
    counted) drained by the sender thread, so the driver holds at most
    queue_max payloads per connection no matter how far behind the
    browser falls."""
    srv = TopicWebSocketServer(send_timeout=60.0, queue_max=32)
    try:
        c = _client_connect(srv.host, srv.port, "soak")
        deadline = time.time() + 5
        while srv.connection_count("soak") < 1 and time.time() < deadline:
            time.sleep(0.05)
        # shrink both buffer sides so the client stalls within a few sends
        with srv._conn_lock:
            conn = srv._conns[0]
            conn.sock.setsockopt(socket.SOL_SOCKET, socket.SO_SNDBUF, 16_384)
        c.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 16_384)

        big = {"type": "data", "data": {"blob": "z" * 100_000}}
        n_batches = 1000
        max_seen = 0
        t0 = time.time()
        for _ in range(n_batches):
            srv.publish("soak", big)
            max_seen = max(max_seen, len(conn.outbox))
        elapsed = time.time() - t0

        assert elapsed < 20, f"1k publishes took {elapsed:.1f}s — blocked"
        assert max_seen <= conn.queue_max, (
            f"outbox grew to {max_seen} > cap {conn.queue_max}"
        )
        # nearly everything was dropped-oldest, and the drops were counted:
        # queued + dropped + at-most-a-few-actually-sent == published
        assert conn.dropped >= n_batches - conn.queue_max - 50, (
            f"only {conn.dropped} drops recorded for {n_batches} publishes"
        )
        # the long send_timeout means the stall alone must NOT kill the
        # connection — bounding memory, not dropping the browser, is the
        # policy under soak
        assert srv.connection_count("soak") == 1
        c.close()
    finally:
        srv.close()


def test_pause_as_data_becomes_control_envelopes(spark):
    """pause_state rides the latched paused flag on every data row
    (operators/stateful.py); the viewer must translate that into the
    reference topic behavior: a control envelope per pause TRANSITION,
    data (flag stripped) only while unpaused, paused rows suppressed."""
    from streamtasks_spark.streaming.webviewer import topic_push_batch

    srv = TopicWebSocketServer()
    try:
        c = _client_connect(srv.host, srv.port, "t")
        deadline = time.time() + 5
        while srv.connection_count("t") < 1 and time.time() < deadline:
            time.sleep(0.05)

        batch = spark.createDataFrame(
            [(1, False), (2, False), (3, True), (4, True), (5, False)],
            "v int, paused boolean",
        ).coalesce(1).sortWithinPartitions("v")
        topic_push_batch(srv, "t", "paused")(batch, 0)

        got = [_recv_json(c) for _ in range(6)]
        assert got == [
            {"type": "control", "data": {"paused": False}},
            {"type": "data", "data": {"v": 1}},
            {"type": "data", "data": {"v": 2}},
            {"type": "control", "data": {"paused": True}},
            {"type": "control", "data": {"paused": False}},
            {"type": "data", "data": {"v": 5}},
        ]
        c.close()
    finally:
        srv.close()
