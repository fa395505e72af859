"""AMQP 0-9-1 (RabbitMQ wire protocol), pure stdlib, plus Spark bindings.

The container ships no AMQP library, and the protocol is public (the
AMQP 0-9-1 specification), so the wire layer is implemented from the
spec: framing (method / content-header / body / heartbeat frames,
0xCE frame-end), field tables, PLAIN SASL start/tune/open handshake,
channel open, exchange/queue declare + bind, basic.qos / publish /
consume / deliver / ack, and clean connection close. The client speaks
the same octets a real RabbitMQ broker expects; ``AMQPBroker`` is a
minimal in-process broker (default + direct + fanout exchanges,
ack/requeue semantics) so the protocol path is testable without a
rabbitmq-server binary.

Spark bindings mirror the websocket ones (same execution loci):

- ``amqp_source`` — a PySpark Python Data Source stream reader: the
  driver holds one consuming connection (prefetch-limited, manual-ack)
  and buffers deliveries; ``commit`` sends a multiple-ack up to the
  committed offset, so the broker redelivers anything Spark never
  committed — the at-least-once contract of the reference source's
  ``auto_ack=false`` mode.
- ``amqp_sink_writer`` — per-partition executor-side connections
  publishing one message per row. No driver collect.

Option keys follow the reference (``rabbitmq.host``, ``rabbitmq.queue``,
``rabbitmq.exchange``, ``rabbitmq.routing.key``, ``rabbitmq.username``,
``rabbitmq.password``, ``rabbitmq.vhost``, ``rabbitmq.prefetch``,
``rabbitmq.persistent``, ``rabbitmq.declare.queue``); bare keys (without
the prefix) are accepted too.

Reference parity (spec only, no code followed): rabbitmq_source.rs
(~1,150 LoC) / rabbitmq_sink.rs (~892 LoC).
"""

from __future__ import annotations

import json
import socket
import struct
import threading
import time
from collections import deque
from typing import Iterator, Optional, Tuple

PROTOCOL_HEADER = b"AMQP\x00\x00\x09\x01"
FRAME_METHOD, FRAME_HEADER, FRAME_BODY, FRAME_HEARTBEAT = 1, 2, 3, 8
FRAME_END = 0xCE

# (class-id, method-id) pairs used here — AMQP 0-9-1 §1.x method layouts
CONN_START, CONN_START_OK = (10, 10), (10, 11)
CONN_TUNE, CONN_TUNE_OK = (10, 30), (10, 31)
CONN_OPEN, CONN_OPEN_OK = (10, 40), (10, 41)
CONN_CLOSE, CONN_CLOSE_OK = (10, 50), (10, 51)
CH_OPEN, CH_OPEN_OK = (20, 10), (20, 11)
CH_CLOSE, CH_CLOSE_OK = (20, 40), (20, 41)
EX_DECLARE, EX_DECLARE_OK = (40, 10), (40, 11)
Q_DECLARE, Q_DECLARE_OK = (50, 10), (50, 11)
Q_BIND, Q_BIND_OK = (50, 20), (50, 21)
BASIC_QOS, BASIC_QOS_OK = (60, 10), (60, 11)
BASIC_CONSUME, BASIC_CONSUME_OK = (60, 20), (60, 21)
BASIC_PUBLISH = (60, 40)
BASIC_DELIVER = (60, 60)
BASIC_ACK = (60, 80)


# ---------------------------------------------------------------------------
# wire codec (AMQP 0-9-1 §4.2: integers big-endian, shortstr ≤255,
# longstr 32-bit length, field tables with one-octet type tags)
# ---------------------------------------------------------------------------

class Writer:
    def __init__(self) -> None:
        self.buf = bytearray()

    def octet(self, v: int) -> "Writer":
        self.buf.append(v & 0xFF)
        return self

    def short(self, v: int) -> "Writer":
        self.buf += struct.pack(">H", v)
        return self

    def long(self, v: int) -> "Writer":
        self.buf += struct.pack(">I", v)
        return self

    def longlong(self, v: int) -> "Writer":
        self.buf += struct.pack(">Q", v)
        return self

    def shortstr(self, s: str) -> "Writer":
        raw = s.encode("utf-8")
        if len(raw) > 255:
            raise ValueError("shortstr longer than 255 bytes")
        self.buf.append(len(raw))
        self.buf += raw
        return self

    def longstr(self, raw: bytes) -> "Writer":
        self.buf += struct.pack(">I", len(raw))
        self.buf += raw
        return self

    def bits(self, *flags: bool) -> "Writer":
        # up to 8 booleans packed LSB-first into one octet (§4.2.5.2)
        v = 0
        for i, f in enumerate(flags):
            if f:
                v |= 1 << i
        self.buf.append(v)
        return self

    def table(self, d: dict) -> "Writer":
        inner = Writer()
        for k, v in d.items():
            inner.shortstr(k)
            inner._field(v)
        self.longstr(bytes(inner.buf))
        return self

    def _field(self, v) -> None:
        if isinstance(v, bool):
            self.buf += b"t"
            self.octet(1 if v else 0)
        elif isinstance(v, int):
            self.buf += b"l"
            self.buf += struct.pack(">q", v)
        elif isinstance(v, float):
            self.buf += b"d"
            self.buf += struct.pack(">d", v)
        elif isinstance(v, str):
            self.buf += b"S"
            self.longstr(v.encode("utf-8"))
        elif isinstance(v, bytes):
            self.buf += b"S"
            self.longstr(v)
        elif isinstance(v, dict):
            self.buf += b"F"
            self.table(v)
        elif v is None:
            self.buf += b"V"
        else:
            raise TypeError(f"unsupported field-table value: {type(v)}")


class Reader:
    def __init__(self, raw: bytes) -> None:
        self.raw = raw
        self.pos = 0

    def _take(self, n: int) -> bytes:
        chunk = self.raw[self.pos : self.pos + n]
        if len(chunk) < n:
            raise ValueError("truncated AMQP payload")
        self.pos += n
        return chunk

    def octet(self) -> int:
        return self._take(1)[0]

    def short(self) -> int:
        return struct.unpack(">H", self._take(2))[0]

    def long(self) -> int:
        return struct.unpack(">I", self._take(4))[0]

    def longlong(self) -> int:
        return struct.unpack(">Q", self._take(8))[0]

    def shortstr(self) -> str:
        return self._take(self.octet()).decode("utf-8")

    def longstr(self) -> bytes:
        return self._take(self.long())

    def bits(self, n: int) -> Tuple[bool, ...]:
        v = self.octet()
        return tuple(bool(v & (1 << i)) for i in range(n))

    def table(self) -> dict:
        inner = Reader(self.longstr())
        out = {}
        while inner.pos < len(inner.raw):
            key = inner.shortstr()
            out[key] = inner._field()
        return out

    def _field(self):
        tag = self._take(1)
        if tag == b"t":
            return bool(self.octet())
        if tag == b"b":
            return struct.unpack(">b", self._take(1))[0]
        if tag == b"s":
            return struct.unpack(">h", self._take(2))[0]
        if tag == b"I":
            return struct.unpack(">i", self._take(4))[0]
        if tag == b"l":
            return struct.unpack(">q", self._take(8))[0]
        if tag == b"f":
            return struct.unpack(">f", self._take(4))[0]
        if tag == b"d":
            return struct.unpack(">d", self._take(8))[0]
        if tag == b"D":
            scale = self.octet()
            return struct.unpack(">i", self._take(4))[0] / (10 ** scale)
        if tag == b"S":
            return self.longstr().decode("utf-8", "replace")
        if tag == b"x":
            return self.longstr()
        if tag == b"T":
            return self.longlong()
        if tag == b"F":
            return self.table()
        if tag == b"A":
            inner = Reader(self.longstr())
            items = []
            while inner.pos < len(inner.raw):
                items.append(inner._field())
            return items
        if tag == b"V":
            return None
        raise ValueError(f"unknown field-table type tag {tag!r}")


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("AMQP peer closed mid-frame")
        buf += chunk
    return buf


def send_frame(sock: socket.socket, ftype: int, channel: int, payload: bytes) -> None:
    sock.sendall(
        struct.pack(">BHI", ftype, channel, len(payload)) + payload + bytes([FRAME_END])
    )


def read_frame(sock: socket.socket) -> Tuple[int, int, bytes]:
    ftype, channel, size = struct.unpack(">BHI", _recv_exact(sock, 7))
    payload = _recv_exact(sock, size) if size else b""
    if _recv_exact(sock, 1)[0] != FRAME_END:
        raise ConnectionError("AMQP frame missing 0xCE frame-end octet")
    return ftype, channel, payload


def method_payload(class_method: Tuple[int, int], args: Writer | None = None) -> bytes:
    w = Writer().short(class_method[0]).short(class_method[1])
    if args is not None:
        w.buf += args.buf
    return bytes(w.buf)


def content_header_payload(
    body_size: int, content_type: str = "application/json", delivery_mode: int = 1
) -> bytes:
    # class 60, weight 0, body size, property flags: content-type (bit 15)
    # + delivery-mode (bit 12), then properties in flag order (§2.3.5.2)
    w = Writer().short(60).short(0).longlong(body_size)
    w.short((1 << 15) | (1 << 12))
    w.shortstr(content_type)
    w.octet(delivery_mode)
    return bytes(w.buf)


def parse_content_header(payload: bytes) -> Tuple[int, dict]:
    r = Reader(payload)
    r.short()  # class
    r.short()  # weight
    body_size = r.longlong()
    flags = r.short()
    props = {}
    if flags & (1 << 15):
        props["content_type"] = r.shortstr()
    if flags & (1 << 14):
        props["content_encoding"] = r.shortstr()
    if flags & (1 << 13):
        props["headers"] = r.table()
    if flags & (1 << 12):
        props["delivery_mode"] = r.octet()
    return body_size, props


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------

class Delivery:
    __slots__ = ("delivery_tag", "exchange", "routing_key", "redelivered", "body")

    def __init__(self, delivery_tag, exchange, routing_key, redelivered, body):
        self.delivery_tag = delivery_tag
        self.exchange = exchange
        self.routing_key = routing_key
        self.redelivered = redelivered
        self.body = body


class AMQPClient:
    """One connection + one channel, synchronous RPC, manual-ack consume.

    Speaks AMQP 0-9-1 with PLAIN auth; works against ``AMQPBroker`` below
    and (by construction from the public spec) a real RabbitMQ broker.
    """

    def __init__(
        self,
        host: str = "localhost",
        port: int = 5672,
        username: str = "guest",
        password: str = "guest",
        vhost: str = "/",
        timeout: float = 10.0,
    ):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self._send_lock = threading.Lock()
        self._inbox: deque = deque()  # non-RPC frames seen while awaiting an RPC reply
        self.closed = False
        self.sock.sendall(PROTOCOL_HEADER)

        cm, r = self._wait_method(CONN_START)
        r.octet(), r.octet(), r.table()
        mechanisms = r.longstr().split()
        if b"PLAIN" not in mechanisms:
            raise ConnectionError(f"broker offers no PLAIN auth: {mechanisms}")
        start_ok = (
            Writer()
            .table({"product": "engine-spark", "platform": "python"})
            .shortstr("PLAIN")
            .longstr(f"\0{username}\0{password}".encode("utf-8"))
            .shortstr("en_US")
        )
        self._send_method(0, CONN_START_OK, start_ok)

        cm, r = self._wait_method(CONN_TUNE)
        channel_max, frame_max, _heartbeat = r.short(), r.long(), r.short()
        self.frame_max = min(frame_max or 131072, 131072)
        self._send_method(
            0,
            CONN_TUNE_OK,
            Writer().short(channel_max).long(self.frame_max).short(0),
        )
        self._send_method(0, CONN_OPEN, Writer().shortstr(vhost).shortstr("").bits(False))
        self._wait_method(CONN_OPEN_OK)
        self._send_method(1, CH_OPEN, Writer().shortstr(""))
        self._wait_method(CH_OPEN_OK)
        self.sock.settimeout(None)

    # -- plumbing -----------------------------------------------------------

    def _send_method(self, channel: int, cm: Tuple[int, int], args: Writer | None = None):
        with self._send_lock:
            send_frame(self.sock, FRAME_METHOD, channel, method_payload(cm, args))

    def _wait_method(self, expect: Tuple[int, int]) -> Tuple[Tuple[int, int], Reader]:
        """Read frames until ``expect`` arrives; heartbeats are dropped, a
        server connection.close is honored, anything else (e.g. a deliver
        racing an RPC) is queued for the consume loop."""
        while True:
            ftype, channel, payload = read_frame(self.sock)
            if ftype == FRAME_HEARTBEAT:
                with self._send_lock:
                    send_frame(self.sock, FRAME_HEARTBEAT, 0, b"")
                continue
            if ftype == FRAME_METHOD:
                r = Reader(payload)
                cm = (r.short(), r.short())
                if cm == expect:
                    return cm, r
                if cm == CONN_CLOSE:
                    code, text = r.short(), r.shortstr()
                    self._send_method(0, CONN_CLOSE_OK)
                    self.closed = True
                    raise ConnectionError(f"broker closed connection: {code} {text}")
                self._inbox.append((ftype, channel, payload))
            else:
                self._inbox.append((ftype, channel, payload))

    def _next_frame(self, timeout: Optional[float]) -> Optional[Tuple[int, int, bytes]]:
        if self._inbox:
            return self._inbox.popleft()
        self.sock.settimeout(timeout)
        try:
            return read_frame(self.sock)
        except socket.timeout:
            return None
        finally:
            self.sock.settimeout(None)

    # -- topology -----------------------------------------------------------

    def exchange_declare(self, exchange: str, ex_type: str = "direct", durable: bool = False):
        self._send_method(
            1,
            EX_DECLARE,
            Writer()
            .short(0)
            .shortstr(exchange)
            .shortstr(ex_type)
            .bits(False, durable, False, False, False)
            .table({}),
        )
        self._wait_method(EX_DECLARE_OK)

    def queue_declare(self, queue: str, durable: bool = False) -> Tuple[str, int, int]:
        self._send_method(
            1,
            Q_DECLARE,
            Writer()
            .short(0)
            .shortstr(queue)
            .bits(False, durable, False, False, False)
            .table({}),
        )
        _, r = self._wait_method(Q_DECLARE_OK)
        return r.shortstr(), r.long(), r.long()

    def queue_bind(self, queue: str, exchange: str, routing_key: str):
        self._send_method(
            1,
            Q_BIND,
            Writer()
            .short(0)
            .shortstr(queue)
            .shortstr(exchange)
            .shortstr(routing_key)
            .bits(False)
            .table({}),
        )
        self._wait_method(Q_BIND_OK)

    def basic_qos(self, prefetch_count: int):
        self._send_method(
            1, BASIC_QOS, Writer().long(0).short(prefetch_count).bits(False)
        )
        self._wait_method(BASIC_QOS_OK)

    # -- publish ------------------------------------------------------------

    def publish(
        self,
        body: bytes,
        routing_key: str,
        exchange: str = "",
        content_type: str = "application/json",
        persistent: bool = False,
        mandatory: bool = False,
    ) -> None:
        """basic.publish: method frame + content header + body frames
        (body split at the negotiated frame-max, §4.2.6)."""
        with self._send_lock:
            send_frame(
                self.sock,
                FRAME_METHOD,
                1,
                method_payload(
                    BASIC_PUBLISH,
                    Writer()
                    .short(0)
                    .shortstr(exchange)
                    .shortstr(routing_key)
                    .bits(mandatory, False),
                ),
            )
            send_frame(
                self.sock,
                FRAME_HEADER,
                1,
                content_header_payload(
                    len(body), content_type, 2 if persistent else 1
                ),
            )
            chunk = self.frame_max - 8
            for i in range(0, len(body), chunk):
                send_frame(self.sock, FRAME_BODY, 1, body[i : i + chunk])

    # -- consume ------------------------------------------------------------

    def consume(self, queue: str, consumer_tag: str = "", no_ack: bool = False) -> str:
        self._send_method(
            1,
            BASIC_CONSUME,
            Writer()
            .short(0)
            .shortstr(queue)
            .shortstr(consumer_tag)
            .bits(False, no_ack, False, False, False)
            .table({}),
        )
        _, r = self._wait_method(BASIC_CONSUME_OK)
        return r.shortstr()

    def next_delivery(self, timeout: Optional[float] = None) -> Optional[Delivery]:
        """Next basic.deliver (+ its header and body frames), or None on
        timeout / connection end."""
        deadline = None if timeout is None else time.time() + timeout
        while True:
            remaining = None if deadline is None else max(0.0, deadline - time.time())
            try:
                frame = self._next_frame(remaining)
            except (ConnectionError, OSError):
                self.closed = True
                return None
            if frame is None:
                return None
            ftype, _channel, payload = frame
            if ftype == FRAME_HEARTBEAT:
                with self._send_lock:
                    send_frame(self.sock, FRAME_HEARTBEAT, 0, b"")
                continue
            if ftype != FRAME_METHOD:
                continue
            r = Reader(payload)
            cm = (r.short(), r.short())
            if cm == CONN_CLOSE:
                self._send_method(0, CONN_CLOSE_OK)
                self.closed = True
                return None
            if cm != BASIC_DELIVER:
                continue
            _ctag = r.shortstr()
            delivery_tag = r.longlong()
            (redelivered,) = r.bits(1)
            exchange, routing_key = r.shortstr(), r.shortstr()
            try:
                ftype, _, hpayload = read_frame(self.sock)
                if ftype != FRAME_HEADER:
                    raise ConnectionError("expected content header after deliver")
                body_size, _props = parse_content_header(hpayload)
                body = b""
                while len(body) < body_size:
                    ftype, _, chunk = read_frame(self.sock)
                    if ftype != FRAME_BODY:
                        raise ConnectionError("expected body frame")
                    body += chunk
            except (ConnectionError, OSError):
                self.closed = True
                return None
            return Delivery(delivery_tag, exchange, routing_key, redelivered, body)

    def ack(self, delivery_tag: int, multiple: bool = False) -> None:
        self._send_method(
            1, BASIC_ACK, Writer().longlong(delivery_tag).bits(multiple)
        )

    def close(self) -> None:
        if self.closed:
            return
        self.closed = True
        try:
            self._send_method(0, CONN_CLOSE, Writer().short(200).shortstr("bye").short(0).short(0))
            self.sock.settimeout(2.0)
            try:
                self._wait_method(CONN_CLOSE_OK)
            except (ConnectionError, OSError, ValueError):
                pass
        except OSError:
            pass
        finally:
            try:
                self.sock.close()
            except OSError:
                pass


# ---------------------------------------------------------------------------
# minimal in-process broker (for tests and broker-free deployments)
# ---------------------------------------------------------------------------

class _BrokerConn:
    def __init__(self, sock: socket.socket):
        self.sock = sock
        self.send_lock = threading.Lock()
        self.next_tag = 1
        self.unacked: dict[int, Tuple[str, tuple]] = {}  # tag -> (queue, message)
        self.consumer_queues: list[str] = []
        self.alive = True

    def send_method(self, channel: int, cm, args: Writer | None = None):
        with self.send_lock:
            send_frame(self.sock, FRAME_METHOD, channel, method_payload(cm, args))


class AMQPBroker:
    """In-process AMQP 0-9-1 broker: default/direct/fanout exchanges,
    FIFO queues, manual ack with requeue-on-disconnect. Enough protocol
    surface for the client above and for exercising the Spark source/sink
    end-to-end without a rabbitmq-server binary."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self.queues: dict[str, deque] = {}
        self.exchanges: dict[str, str] = {"": "direct"}
        self.bindings: dict[Tuple[str, str], set] = {}
        self.consumers: dict[str, list[Tuple[_BrokerConn, str]]] = {}
        self._lock = threading.Lock()
        self._listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._listener.bind((host, port))
        self._listener.listen(16)
        self.port = self._listener.getsockname()[1]
        self._stop = threading.Event()
        self._conns: list[_BrokerConn] = []
        threading.Thread(target=self._accept_loop, daemon=True).start()

    # -- lifecycle ----------------------------------------------------------

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                sock, _ = self._listener.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(sock,), daemon=True).start()

    def stop(self) -> None:
        self._stop.set()
        try:
            self._listener.close()
        except OSError:
            pass
        for conn in list(self._conns):
            try:
                conn.sock.close()
            except OSError:
                pass

    def queue_depth(self, queue: str) -> int:
        with self._lock:
            return len(self.queues.get(queue, ()))

    # -- per-connection protocol loop --------------------------------------

    def _serve(self, sock: socket.socket) -> None:
        conn = _BrokerConn(sock)
        self._conns.append(conn)
        try:
            if _recv_exact(sock, 8) != PROTOCOL_HEADER:
                sock.sendall(PROTOCOL_HEADER)  # §4.2.2: answer with supported version
                return
            conn.send_method(
                0,
                CONN_START,
                Writer()
                .octet(0)
                .octet(9)
                .table({"product": "engine-spark-broker"})
                .longstr(b"PLAIN")
                .longstr(b"en_US"),
            )
            self._expect(sock, CONN_START_OK)
            conn.send_method(0, CONN_TUNE, Writer().short(2047).long(131072).short(0))
            self._expect(sock, CONN_TUNE_OK)
            self._expect(sock, CONN_OPEN)
            conn.send_method(0, CONN_OPEN_OK, Writer().shortstr(""))
            self._method_loop(conn)
        except (ConnectionError, OSError, ValueError):
            pass
        finally:
            conn.alive = False
            self._requeue_unacked(conn)
            try:
                sock.close()
            except OSError:
                pass
            if conn in self._conns:
                self._conns.remove(conn)

    def _expect(self, sock: socket.socket, cm: Tuple[int, int]) -> Reader:
        while True:
            ftype, _, payload = read_frame(sock)
            if ftype == FRAME_HEARTBEAT:
                continue
            r = Reader(payload)
            got = (r.short(), r.short())
            if got == cm:
                return r
            raise ConnectionError(f"handshake: expected {cm}, got {got}")

    def _method_loop(self, conn: _BrokerConn) -> None:
        while not self._stop.is_set():
            ftype, channel, payload = read_frame(conn.sock)
            if ftype == FRAME_HEARTBEAT:
                with conn.send_lock:
                    send_frame(conn.sock, FRAME_HEARTBEAT, 0, b"")
                continue
            if ftype != FRAME_METHOD:
                continue
            r = Reader(payload)
            cm = (r.short(), r.short())
            if cm == CH_OPEN:
                conn.send_method(channel, CH_OPEN_OK, Writer().longstr(b""))
            elif cm == CH_CLOSE:
                conn.send_method(channel, CH_CLOSE_OK)
            elif cm == CONN_CLOSE:
                conn.send_method(0, CONN_CLOSE_OK)
                return
            elif cm == EX_DECLARE:
                r.short()
                name, ex_type = r.shortstr(), r.shortstr()
                with self._lock:
                    self.exchanges[name] = ex_type
                conn.send_method(channel, EX_DECLARE_OK)
            elif cm == Q_DECLARE:
                r.short()
                name = r.shortstr() or f"amq.gen-{id(conn)}"
                with self._lock:
                    queue = self.queues.setdefault(name, deque())
                    depth, nconsumers = len(queue), len(self.consumers.get(name, []))
                conn.send_method(
                    channel,
                    Q_DECLARE_OK,
                    Writer().shortstr(name).long(depth).long(nconsumers),
                )
            elif cm == Q_BIND:
                r.short()
                queue, exchange, rk = r.shortstr(), r.shortstr(), r.shortstr()
                with self._lock:
                    self.bindings.setdefault((exchange, rk), set()).add(queue)
                conn.send_method(channel, Q_BIND_OK)
            elif cm == BASIC_QOS:
                conn.send_method(channel, BASIC_QOS_OK)
            elif cm == BASIC_CONSUME:
                r.short()
                queue = r.shortstr()
                ctag = r.shortstr() or f"ctag-{len(self._conns)}-{id(conn) & 0xFFFF}"
                with self._lock:
                    self.queues.setdefault(queue, deque())
                    self.consumers.setdefault(queue, []).append((conn, ctag))
                    conn.consumer_queues.append(queue)
                conn.send_method(channel, BASIC_CONSUME_OK, Writer().shortstr(ctag))
                self._drain_queue(queue)
            elif cm == BASIC_PUBLISH:
                r.short()
                exchange, rk = r.shortstr(), r.shortstr()
                ftype, _, hpayload = read_frame(conn.sock)
                if ftype != FRAME_HEADER:
                    raise ConnectionError("publish: expected content header")
                body_size, props = parse_content_header(hpayload)
                body = b""
                while len(body) < body_size:
                    ftype, _, chunk = read_frame(conn.sock)
                    if ftype != FRAME_BODY:
                        raise ConnectionError("publish: expected body frame")
                    body += chunk
                self._route(exchange, rk, (body, props, exchange, rk))
            elif cm == BASIC_ACK:
                tag = r.longlong()
                (multiple,) = r.bits(1)
                with self._lock:
                    if multiple:
                        for t in [t for t in conn.unacked if t <= tag]:
                            del conn.unacked[t]
                    else:
                        conn.unacked.pop(tag, None)

    # -- routing + delivery -------------------------------------------------

    def _route(self, exchange: str, routing_key: str, message: tuple) -> None:
        with self._lock:
            if exchange == "":
                targets = [routing_key] if routing_key in self.queues else []
            elif self.exchanges.get(exchange) == "fanout":
                targets = sorted(
                    {q for (ex, _), qs in self.bindings.items() if ex == exchange for q in qs}
                )
            else:  # direct
                targets = sorted(self.bindings.get((exchange, routing_key), ()))
            for queue in targets:
                self.queues.setdefault(queue, deque()).append(message)
        for queue in targets:
            self._drain_queue(queue)

    def _drain_queue(self, queue: str) -> None:
        while True:
            with self._lock:
                pending = self.queues.get(queue)
                live = [
                    (c, t) for c, t in self.consumers.get(queue, []) if c.alive
                ]
                self.consumers[queue] = live if queue in self.consumers else []
                if not pending or not live:
                    return
                message = pending.popleft()
                conn, ctag = live[0]
                tag = conn.next_tag
                conn.next_tag += 1
                conn.unacked[tag] = (queue, message)
            if not self._deliver(conn, ctag, tag, message):
                with self._lock:
                    conn.unacked.pop(tag, None)
                    self.queues.setdefault(queue, deque()).appendleft(message)
                return

    def _deliver(self, conn: _BrokerConn, ctag: str, tag: int, message: tuple) -> bool:
        body, props, exchange, rk = message
        try:
            with conn.send_lock:
                send_frame(
                    conn.sock,
                    FRAME_METHOD,
                    1,
                    method_payload(
                        BASIC_DELIVER,
                        Writer()
                        .shortstr(ctag)
                        .longlong(tag)
                        .bits(False)
                        .shortstr(exchange)
                        .shortstr(rk),
                    ),
                )
                send_frame(
                    conn.sock,
                    FRAME_HEADER,
                    1,
                    content_header_payload(
                        len(body),
                        props.get("content_type", "application/octet-stream"),
                        props.get("delivery_mode", 1),
                    ),
                )
                send_frame(conn.sock, FRAME_BODY, 1, body)
            return True
        except OSError:
            conn.alive = False
            return False

    def _requeue_unacked(self, conn: _BrokerConn) -> None:
        with self._lock:
            for queue in conn.consumer_queues:
                self.consumers[queue] = [
                    (c, t) for c, t in self.consumers.get(queue, []) if c is not conn
                ]
            requeue = sorted(conn.unacked.items())
            conn.unacked = {}
            for _tag, (queue, message) in reversed(requeue):
                self.queues.setdefault(queue, deque()).appendleft(message)
        for queue in {q for _t, (q, _m) in requeue}:
            self._drain_queue(queue)


# ---------------------------------------------------------------------------
# Spark bindings
# ---------------------------------------------------------------------------

def _opt(opts: dict, key: str, default=None):
    """Accept both the reference's 'rabbitmq.<key>' names and bare keys."""
    return opts.get(f"rabbitmq.{key}", opts.get(key, default))


class _ConsumerPump:
    """Driver-side consume loop: one manual-ack connection draining
    deliveries into an offset-indexed buffer; commit acks + prunes."""

    def __init__(self, host, port, username, password, vhost, queue, prefetch):
        self.buffer: list[Tuple[int, str, str, int]] = []  # (offset, value, rk, tag)
        self.next = 0
        self.lock = threading.Lock()
        self.client = AMQPClient(host, port, username, password, vhost)
        self.client.queue_declare(queue)
        self.client.basic_qos(prefetch)
        self.client.consume(queue, no_ack=False)
        threading.Thread(target=self._run, daemon=True).start()

    def _run(self) -> None:
        while True:
            d = self.client.next_delivery(timeout=None)
            if d is None:
                return
            with self.lock:
                self.buffer.append(
                    (
                        self.next,
                        d.body.decode("utf-8", "replace"),
                        d.routing_key,
                        d.delivery_tag,
                    )
                )
                self.next += 1


#: live pumps keyed by connection+queue — module-level because Spark
#: pickles the stream reader (sockets/threads don't pickle); same pattern
#: as the websocket source.
_PUMPS: dict = {}
_PUMPS_LOCK = threading.Lock()


def _pump_for(host, port, username, password, vhost, queue, prefetch) -> _ConsumerPump:
    key = (host, port, vhost, queue)
    with _PUMPS_LOCK:
        pump = _PUMPS.get(key)
        if pump is None or pump.client.closed:
            pump = _ConsumerPump(host, port, username, password, vhost, queue, prefetch)
            _PUMPS[key] = pump
        return pump


def _register_source(spark) -> None:
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    class _Reader(SimpleDataSourceStreamReader):
        """At-least-once: deliveries stay unacked (and replayable from the
        pump buffer) until Spark commits the batch, then a multiple-ack
        releases them broker-side — the reference source's
        auto_ack=false contract (rabbitmq_source.rs).

        Ack timing: the engine calls ``commit(end of batch N)`` when it
        constructs batch N+1, so acks lag one batch behind delivery (same
        checkpoint-driven lag as Spark's Kafka source). On crash the
        broker requeues everything unacked, in order, so a restarted
        pump re-receives those messages at the same offsets."""

        def __init__(self, options):
            self.host = _opt(options, "host", "localhost")
            self.port = int(_opt(options, "port", "5672"))
            self.username = _opt(options, "username", "guest")
            self.password = _opt(options, "password", "guest")
            self.vhost = _opt(options, "vhost", "/")
            self.queue = _opt(options, "queue")
            if not self.queue:
                raise ValueError("rabbitmq source requires a 'queue' option")
            self.prefetch = int(_opt(options, "prefetch", "1000"))

        def _pump(self) -> _ConsumerPump:
            return _pump_for(
                self.host, self.port, self.username, self.password,
                self.vhost, self.queue, self.prefetch,
            )

        def initialOffset(self) -> dict:
            return {"offset": 0}

        def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
            pump = self._pump()
            lo = start["offset"]
            with pump.lock:
                rows = [(v, rk) for off, v, rk, _t in pump.buffer if off >= lo]
                end = pump.next
            return iter(rows), {"offset": end}

        def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
            lo, hi = start["offset"], end["offset"]
            if lo >= hi:
                # empty-batch replay (e.g. batch 0) — answering it must not
                # open a competing consumer connection on the executor
                return iter(())
            pump = self._pump()
            with pump.lock:
                return iter(
                    [(v, rk) for off, v, rk, _t in pump.buffer if lo <= off < hi]
                )

        def commit(self, end: dict) -> None:
            hi = end["offset"]
            if hi <= 0:
                return
            pump = self._pump()
            with pump.lock:
                tags = [t for off, _v, _rk, t in pump.buffer if off < hi]
                pump.buffer = [row for row in pump.buffer if row[0] >= hi]
            if tags and not pump.client.closed:
                try:
                    pump.client.ack(max(tags), multiple=True)
                except OSError:
                    pass

    class RabbitMQDataSource(DataSource):
        """format('rabbitmq'): (value STRING, routing_key STRING) rows."""

        @classmethod
        def name(cls) -> str:
            return "rabbitmq"

        def schema(self) -> str:
            return "value string, routing_key string"

        def simpleStreamReader(self, schema):  # noqa: ARG002 — fixed schema
            return _Reader(self.options)

    spark.dataSource.register(RabbitMQDataSource)


def amqp_source(spark, opts: dict):
    """Streaming DataFrame of queue messages (value + routing_key)."""
    if not _opt(opts, "queue"):
        raise ValueError("rabbitmq source requires a 'queue' option")
    _register_source(spark)
    reader = spark.readStream.format("rabbitmq")
    for key in ("host", "port", "username", "password", "vhost", "queue", "prefetch"):
        val = _opt(opts, key)
        if val is not None:
            reader = reader.option(key, str(val))
    return reader.load()


def _register_sink(spark) -> None:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamWriter,
        WriterCommitMessage,
    )

    class _Writer(DataSourceStreamWriter):
        def __init__(self, options):
            self.host = options.get("host", "localhost")
            self.port = int(options.get("port", "5672"))
            self.username = options.get("username", "guest")
            self.password = options.get("password", "guest")
            self.vhost = options.get("vhost", "/")
            self.exchange = options.get("exchange", "")
            self.routing_key = options.get("routing_key", "")
            self.queue = options.get("queue", "")
            self.persistent = options.get("persistent", "false") == "true"
            self.content_type = options.get("content_type", "application/json")

        def write(self, iterator) -> WriterCommitMessage:
            # Executor-side, once per partition: one connection, one
            # basic.publish per row (rabbitmq_sink.rs publish loop).
            client = AMQPClient(
                self.host, self.port, self.username, self.password, self.vhost
            )
            try:
                if self.queue:
                    client.queue_declare(self.queue)
                rk = self.routing_key or self.queue
                for row in iterator:
                    d = row.asDict()
                    body = (
                        d["value"].encode("utf-8")
                        if set(d) == {"value"}
                        else json.dumps(d, default=str).encode("utf-8")
                    )
                    client.publish(
                        body,
                        routing_key=rk,
                        exchange=self.exchange,
                        content_type=self.content_type,
                        persistent=self.persistent,
                    )
            finally:
                client.close()
            return WriterCommitMessage()

        def commit(self, messages, batchId) -> None:
            pass

        def abort(self, messages, batchId) -> None:
            pass

    class RabbitMQSinkDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "rabbitmq-sink"

        def streamWriter(self, schema, overwrite):  # noqa: ARG002
            return _Writer(self.options)

    spark.dataSource.register(RabbitMQSinkDataSource)


def amqp_sink_writer(df, opts: dict):
    """writeStream builder publishing each row from the executors
    (per-partition connections — no driver collect)."""
    _register_sink(df.sparkSession)
    writer = df.writeStream.format("rabbitmq-sink")
    for key, default in (
        ("host", "localhost"),
        ("port", "5672"),
        ("username", "guest"),
        ("password", "guest"),
        ("vhost", "/"),
        ("exchange", ""),
        ("queue", ""),
        ("content_type", "application/json"),
    ):
        writer = writer.option(key, str(_opt(opts, key, default)))
    rk = _opt(opts, "routing.key", _opt(opts, "routing_key"))
    if rk:
        writer = writer.option("routing_key", str(rk))
    if _opt(opts, "persistent", "false") in (True, "true", "True"):
        writer = writer.option("persistent", "true")
    if "checkpoint" in opts:
        writer = writer.option("checkpointLocation", opts["checkpoint"])
    return writer
