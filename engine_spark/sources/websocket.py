"""RFC 6455 WebSocket support, pure stdlib, plus its Spark bindings.

The container ships no WebSocket library, and the protocol is public
(RFC 6455), so the framing layer here is implemented from the spec:
HTTP/1.1 Upgrade handshake (Sec-WebSocket-Key -> SHA1+base64 accept),
frame encode/decode with 7/16/64-bit payload lengths, client-side
masking (mandatory per §5.1), ping/pong, close handshake, and text
fragmentation reassembly.

Spark bindings (Spark-native, not a bolt-on bridge):

- ``WebSocketDataSource`` — a PySpark Python Data Source
  (`pyspark.sql.datasource`) with a ``SimpleDataSourceStreamReader``:
  the driver holds one WS connection and buffers inbound text messages;
  ``read(start)`` drains them with monotonically increasing offsets,
  ``readBetweenOffsets`` replays from the retained buffer until
  ``commit`` prunes it. Same execution locus as Spark's own socket
  source (driver-side receive, at-least-once until commit).
- ``websocket_sink_writer`` — a ``DataSourceStreamWriter`` whose
  ``write`` runs per-partition ON THE EXECUTORS: each partition opens a
  WS client connection, pushes every row as one JSON text frame, then
  performs the close handshake. No driver collect; scales with the
  number of partitions.

Reference parity (spec only, no code followed): websocket_source.rs
(906 LoC) / websocket_sink.rs (863 LoC).
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import socket
import struct
import threading
from typing import Callable, Iterator, Optional, Tuple

_MAGIC = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT, OP_TEXT, OP_BINARY, OP_CLOSE, OP_PING, OP_PONG = 0x0, 0x1, 0x2, 0x8, 0x9, 0xA


def accept_key(client_key: str) -> str:
    """Sec-WebSocket-Accept for a client's Sec-WebSocket-Key (RFC 6455 §4.2.2)."""
    digest = hashlib.sha1((client_key + _MAGIC).encode("ascii")).digest()
    return base64.b64encode(digest).decode("ascii")


def encode_frame(
    payload: bytes, opcode: int = OP_TEXT, mask: bool = False, fin: bool = True
) -> bytes:
    """One WS frame (RFC 6455 §5.2). Clients MUST mask (§5.1)."""
    head = bytearray()
    head.append((0x80 if fin else 0) | opcode)
    n = len(payload)
    mask_bit = 0x80 if mask else 0
    if n < 126:
        head.append(mask_bit | n)
    elif n < (1 << 16):
        head.append(mask_bit | 126)
        head += struct.pack(">H", n)
    else:
        head.append(mask_bit | 127)
        head += struct.pack(">Q", n)
    if mask:
        key = os.urandom(4)
        head += key
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return bytes(head) + payload


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("websocket peer closed mid-frame")
        buf += chunk
    return buf


def read_frame(sock: socket.socket) -> Tuple[int, bool, bytes]:
    """Read one frame; returns (opcode, fin, unmasked payload)."""
    b0, b1 = _read_exact(sock, 2)
    fin = bool(b0 & 0x80)
    opcode = b0 & 0x0F
    masked = bool(b1 & 0x80)
    n = b1 & 0x7F
    if n == 126:
        (n,) = struct.unpack(">H", _read_exact(sock, 2))
    elif n == 127:
        (n,) = struct.unpack(">Q", _read_exact(sock, 8))
    key = _read_exact(sock, 4) if masked else None
    payload = _read_exact(sock, n) if n else b""
    if key:
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return opcode, fin, payload


class WSConnection:
    """One established WebSocket; handles control frames and fragmentation.

    ``is_client`` controls outbound masking (clients mask, servers don't).
    """

    def __init__(self, sock: socket.socket, is_client: bool):
        self.sock = sock
        self.is_client = is_client
        self._send_lock = threading.Lock()
        self.closed = False

    def send_text(self, text: str) -> None:
        self._send(encode_frame(text.encode("utf-8"), OP_TEXT, mask=self.is_client))

    def send_binary(self, data: bytes) -> None:
        self._send(encode_frame(data, OP_BINARY, mask=self.is_client))

    def _send(self, raw: bytes) -> None:
        with self._send_lock:
            self.sock.sendall(raw)

    def recv_message(self) -> Optional[Tuple[int, bytes]]:
        """Next data message (opcode, payload), transparently answering
        pings and reassembling fragments. None once the close handshake
        completes or the peer disappears."""
        frag_op, frag_buf = None, b""
        while True:
            try:
                opcode, fin, payload = read_frame(self.sock)
            except (ConnectionError, OSError):
                self.closed = True
                return None
            if opcode == OP_PING:
                self._send(encode_frame(payload, OP_PONG, mask=self.is_client))
                continue
            if opcode == OP_PONG:
                continue
            if opcode == OP_CLOSE:
                if not self.closed:
                    try:
                        self._send(encode_frame(payload, OP_CLOSE, mask=self.is_client))
                    except OSError:
                        pass
                self.closed = True
                return None
            if opcode in (OP_TEXT, OP_BINARY):
                if fin:
                    return opcode, payload
                frag_op, frag_buf = opcode, payload
            elif opcode == OP_CONT and frag_op is not None:
                frag_buf += payload
                if fin:
                    return frag_op, frag_buf

    def close(self, code: int = 1000) -> None:
        if self.closed:
            return
        self.closed = True
        try:
            self._send(encode_frame(struct.pack(">H", code), OP_CLOSE, mask=self.is_client))
            self.sock.settimeout(2.0)
            try:
                while True:
                    opcode, _, _ = read_frame(self.sock)
                    if opcode == OP_CLOSE:
                        break
            except (ConnectionError, OSError):
                pass
        except OSError:
            pass
        finally:
            try:
                self.sock.close()
            except OSError:
                pass


def connect(host: str, port: int, path: str = "/", timeout: float = 10.0) -> WSConnection:
    """Client opening handshake (RFC 6455 §4.1) over a fresh TCP socket."""
    sock = socket.create_connection((host, port), timeout=timeout)
    key = base64.b64encode(os.urandom(16)).decode("ascii")
    request = (
        f"GET {path} HTTP/1.1\r\n"
        f"Host: {host}:{port}\r\n"
        "Upgrade: websocket\r\n"
        "Connection: Upgrade\r\n"
        f"Sec-WebSocket-Key: {key}\r\n"
        "Sec-WebSocket-Version: 13\r\n\r\n"
    )
    sock.sendall(request.encode("ascii"))
    response = b""
    while b"\r\n\r\n" not in response:
        chunk = sock.recv(4096)
        if not chunk:
            raise ConnectionError("websocket handshake: server closed")
        response += chunk
    head = response.split(b"\r\n\r\n", 1)[0].decode("latin-1")
    status = head.split("\r\n", 1)[0]
    if " 101 " not in f"{status} ":
        raise ConnectionError(f"websocket handshake refused: {status!r}")
    headers = {
        line.split(":", 1)[0].strip().lower(): line.split(":", 1)[1].strip()
        for line in head.split("\r\n")[1:]
        if ":" in line
    }
    if headers.get("sec-websocket-accept") != accept_key(key):
        raise ConnectionError("websocket handshake: bad Sec-WebSocket-Accept")
    sock.settimeout(None)
    return WSConnection(sock, is_client=True)


class WSServer:
    """Minimal threaded WS server (handshake + frame loop), used by the
    sink's tests and as a loopback broadcast target. ``on_message`` is
    called with (conn, opcode, payload) for every inbound data message."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 0,
        on_message: Optional[Callable[[WSConnection, int, bytes], None]] = None,
    ):
        self.on_message = on_message
        self._listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._listener.bind((host, port))
        self._listener.listen(16)
        self.port = self._listener.getsockname()[1]
        self.connections: list[WSConnection] = []
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                sock, _ = self._listener.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(sock,), daemon=True).start()

    def _serve(self, sock: socket.socket) -> None:
        try:
            request = b""
            while b"\r\n\r\n" not in request:
                chunk = sock.recv(4096)
                if not chunk:
                    return
                request += chunk
            head = request.split(b"\r\n\r\n", 1)[0].decode("latin-1")
            headers = {
                line.split(":", 1)[0].strip().lower(): line.split(":", 1)[1].strip()
                for line in head.split("\r\n")[1:]
                if ":" in line
            }
            key = headers.get("sec-websocket-key")
            if not key:
                sock.sendall(b"HTTP/1.1 400 Bad Request\r\n\r\n")
                return
            sock.sendall(
                (
                    "HTTP/1.1 101 Switching Protocols\r\n"
                    "Upgrade: websocket\r\n"
                    "Connection: Upgrade\r\n"
                    f"Sec-WebSocket-Accept: {accept_key(key)}\r\n\r\n"
                ).encode("ascii")
            )
        except OSError:
            return
        conn = WSConnection(sock, is_client=False)
        self.connections.append(conn)
        while not self._stop.is_set():
            msg = conn.recv_message()
            if msg is None:
                return
            if self.on_message is not None:
                self.on_message(conn, *msg)

    def broadcast_text(self, text: str) -> None:
        for conn in list(self.connections):
            if not conn.closed:
                try:
                    conn.send_text(text)
                except OSError:
                    conn.closed = True

    def stop(self) -> None:
        self._stop.set()
        try:
            self._listener.close()
        except OSError:
            pass
        for conn in list(self.connections):
            try:
                conn.sock.close()
            except OSError:
                pass


# ---------------------------------------------------------------------------
# Spark streaming source: Python Data Source (driver-side, like Spark's
# own socket source) with replayable offset buffer
# ---------------------------------------------------------------------------

class _Pump:
    """Driver-side receive loop: one WS connection draining text messages
    into an offset-indexed buffer (retained until the batch commits)."""

    def __init__(self, host: str, port: int, path: str):
        self.buffer: list[Tuple[int, str]] = []  # (offset, message)
        self.next = 0
        self.lock = threading.Lock()
        self.conn = connect(host, port, path)
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self) -> None:
        while True:
            msg = self.conn.recv_message()
            if msg is None:
                return
            opcode, payload = msg
            text = (
                payload.decode("utf-8", "replace")
                if opcode == OP_TEXT
                else base64.b64encode(payload).decode("ascii")
            )
            with self.lock:
                self.buffer.append((self.next, text))
                self.next += 1


#: live pumps keyed by (host, port, path) — kept OUT of the reader instance:
#: Spark pickles SimpleDataSourceStreamReader into its prefetching wrapper,
#: and sockets/locks/threads don't pickle. The pump lives for the driver
#: process, exactly like the JVM-side state of Spark's own socket source.
_PUMPS: dict = {}
_PUMPS_LOCK = threading.Lock()


def _pump_for(host: str, port: int, path: str) -> _Pump:
    key = (host, port, path)
    with _PUMPS_LOCK:
        pump = _PUMPS.get(key)
        if pump is None or pump.conn.closed:
            pump = _Pump(host, port, path)
            _PUMPS[key] = pump
        return pump


def _register_data_source(spark) -> None:
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    class _Reader(SimpleDataSourceStreamReader):
        """Holds only plain strings (picklable); all live I/O state is in
        the module-level pump registry. After a driver restart the pump
        buffer is gone, so an uncommitted batch replays empty — the same
        no-replay caveat as Spark's built-in socket source; use the
        filequeue source when exactly-once matters."""

        def __init__(self, options):
            self.host = options.get("host", "localhost")
            self.port = int(options.get("port", "9999"))
            self.path = options.get("path", "/")

        def initialOffset(self) -> dict:
            return {"offset": 0}

        def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
            pump = _pump_for(self.host, self.port, self.path)
            lo = start["offset"]
            with pump.lock:
                rows = [(text,) for off, text in pump.buffer if off >= lo]
                end = pump.next
            return iter(rows), {"offset": end}

        def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
            pump = _pump_for(self.host, self.port, self.path)
            lo, hi = start["offset"], end["offset"]
            with pump.lock:
                return iter([(t,) for off, t in pump.buffer if lo <= off < hi])

        def commit(self, end: dict) -> None:
            pump = _pump_for(self.host, self.port, self.path)
            hi = end["offset"]
            with pump.lock:
                pump.buffer = [(off, t) for off, t in pump.buffer if off >= hi]

    class WebSocketDataSource(DataSource):
        """format('websocket'): value STRING rows, one per WS text message."""

        @classmethod
        def name(cls) -> str:
            return "websocket"

        def schema(self) -> str:
            return "value string"

        def simpleStreamReader(self, schema):  # noqa: ARG002 — fixed schema
            return _Reader(self.options)

    spark.dataSource.register(WebSocketDataSource)


def ws_source(spark, opts: dict):
    """Streaming DataFrame of WS text messages (one 'value' column)."""
    _register_data_source(spark)
    return (
        spark.readStream.format("websocket")
        .option("host", opts.get("host", "localhost"))
        .option("port", str(opts.get("port", "9999")))
        .option("path", opts.get("path", "/"))
        .load()
    )


# ---------------------------------------------------------------------------
# Spark streaming sink: executor-side per-partition WS client push
# ---------------------------------------------------------------------------

def _register_sink_source(spark) -> None:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamWriter,
        WriterCommitMessage,
    )

    class _Writer(DataSourceStreamWriter):
        def __init__(self, options):
            self.host = options.get("host", "localhost")
            self.port = int(options.get("port", "9999"))
            self.path = options.get("wspath", "/")

        def write(self, iterator) -> WriterCommitMessage:
            # Runs on the executor, once per partition: one WS connection,
            # one JSON text frame per row, clean close handshake.
            conn = connect(self.host, self.port, self.path)
            n = 0
            try:
                for row in iterator:
                    conn.send_text(json.dumps(row.asDict(), default=str))
                    n += 1
            finally:
                conn.close()
            return WriterCommitMessage()

        def commit(self, messages, batchId) -> None:
            pass

        def abort(self, messages, batchId) -> None:
            pass

    class WebSocketSinkDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "websocket-sink"

        def streamWriter(self, schema, overwrite):  # noqa: ARG002
            return _Writer(self.options)

    spark.dataSource.register(WebSocketSinkDataSource)


def ws_sink_writer(df, opts: dict):
    """writeStream builder pushing each output row as a WS text frame from
    the executors (per-partition connections — no driver collect)."""
    _register_sink_source(df.sparkSession)
    writer = (
        df.writeStream.format("websocket-sink")
        .option("host", opts.get("host", "localhost"))
        .option("port", str(opts.get("port", "9999")))
        .option("wspath", opts.get("path", "/"))
    )
    if "checkpoint" in opts:
        writer = writer.option("checkpointLocation", opts["checkpoint"])
    return writer
