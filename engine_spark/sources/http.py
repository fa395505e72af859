"""HTTP connector (source: webhooks + REST polling; sink: webhook POSTs
with exponential-backoff retry), pure stdlib, plus Spark bindings.

The reference lists the HTTP connector as PLANNED, not implemented
(MILESTONES.md M4: "HTTP source (REST API, webhooks); HTTP sink
(webhooks, batch requests); retry with exponential backoff") — this
module implements that surface Spark-first, the way the websocket/amqp/
kafka connectors are built:

- ``http_source`` in **webhook** mode runs a driver-side stdlib
  ``ThreadingHTTPServer`` accepting POST requests and buffering payloads
  into an offset-indexed buffer behind a PySpark Python Data Source
  stream reader (at-least-once: offsets live in Spark's checkpoint,
  ``commit`` prunes the buffer, a replayed range re-reads buffered
  payloads).
- ``http_source`` in **poll** mode GETs a REST endpoint on an interval
  from a thread in the reader's process; each poll's body becomes one
  event (or one per line with ``split.lines``). Poll snapshots are
  point-in-time and cannot be re-issued retroactively, so every poll's
  rows SPILL to disk (atomic tmp+rename segment, the filequeue pattern)
  BEFORE they become visible to ``read`` — a crash after Spark logged a
  batch's offsets replays the identical rows from the spill on restart,
  and ``commit`` prunes segments wholly below the committed offset.
  ``poll.spill.dir`` places the spill (default: a per-URL directory
  under the system temp dir — point it at shared storage when the
  driver can fail over to another host).
- ``http_sink_writer`` POSTs rows from the executors — one JSON object
  per row, or JSON arrays of ``batch.size`` rows ("batch requests") —
  with ``retries`` attempts and exponential backoff starting at
  ``backoff.ms``; exhausted retries raise so Spark's task retry takes
  over (at-least-once). ``compression=gzip`` sends bodies with
  ``Content-Encoding: gzip`` (the standard webhook batching practice),
  and the webhook receiver transparently decompresses gzip-encoded
  inbound POSTs (400 on a malformed body).

Option keys accept the ``http.`` prefix or bare names.
"""

from __future__ import annotations

import hashlib
import http.client
import json
import os
import tempfile
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Iterator, Optional, Tuple
from urllib.parse import urlparse


# ---------------------------------------------------------------------------
# webhook receiver (driver-side)
# ---------------------------------------------------------------------------

class WebhookReceiver:
    """HTTP server buffering POST bodies as (offset, value, path,
    content_type) rows, with a consumer API so the Spark stream reader —
    which runs in a SEPARATE Python worker process — can drain it over
    the wire (same location-independence as the amqp pump connecting to
    its broker):

    - ``POST <any path>``      -> 200, body buffered at the next offset;
      503 when ``max_buffer`` uncommitted events are already held
      (backpressure to the webhook caller — senders retry, nothing is
      silently dropped)
    - ``GET /__events?from=N`` -> {"rows": [[off, value, path, ctype]...],
                                   "next": M}
    - ``POST /__commit`` {"upto": N} -> prunes offsets < N
    - ``GET /health``          -> liveness
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 max_buffer: int = 100_000):
        self.buffer: list[Tuple[int, str, str, str]] = []
        self.next = 0
        self.max_buffer = max_buffer
        self.lock = threading.Lock()
        rx = self

        class _Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # noqa: D102 - silence stderr
                pass

            def _reply(self, body: bytes, ctype="application/json"):
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path.startswith("/__events"):
                    frm = 0
                    if "from=" in self.path:
                        frm = int(self.path.split("from=")[1].split("&")[0])
                    with rx.lock:
                        rows = [list(r) for r in rx.buffer if r[0] >= frm]
                        nxt = rx.next
                    self._reply(
                        json.dumps({"rows": rows, "next": nxt}).encode()
                    )
                    return
                self._reply(b"ok", "text/plain")

            def do_POST(self):
                n = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(n)
                if self.path == "/__commit":
                    upto = int(json.loads(raw or b"{}").get("upto", 0))
                    with rx.lock:
                        rx.buffer = [r for r in rx.buffer if r[0] >= upto]
                    self._reply(b"ok", "text/plain")
                    return
                ctype = self.headers.get("Content-Type",
                                         "application/octet-stream")
                if self.headers.get("Content-Encoding", "") == "gzip":
                    import gzip as _gz

                    try:
                        raw = _gz.decompress(raw)
                    except OSError:
                        self.send_response(400)  # malformed gzip body
                        self.end_headers()
                        return
                with rx.lock:
                    if len(rx.buffer) >= rx.max_buffer:
                        self.send_response(503)  # backpressure: retry
                        self.send_header("Retry-After", "1")
                        self.end_headers()
                        return
                    rx.buffer.append(
                        (rx.next, raw.decode("utf-8", "replace"),
                         self.path, ctype)
                    )
                    rx.next += 1
                self._reply(b"ok", "text/plain")

        self.srv = ThreadingHTTPServer((host, port), _Handler)
        self.port = self.srv.server_address[1]
        self.closed = False
        threading.Thread(target=self.srv.serve_forever, daemon=True).start()

    def stop(self) -> None:
        self.closed = True
        self.srv.shutdown()
        self.srv.server_close()


def default_poll_spill_dir(url: str) -> str:
    """Per-URL spill location under the system temp dir — survives a
    driver-process restart on the same host; cluster failover should set
    ``poll.spill.dir`` to shared storage instead."""
    tag = hashlib.sha1(url.encode()).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), "engine-spark-http-poll", tag)


class _Poller:
    """Driver-side REST poll loop: GET ``url`` every ``interval_s``; each
    response body (or each line of it) becomes one buffered event.
    Polling PAUSES while ``max_buffer`` uncommitted events are held
    (backpressure, not loss) — a stopped consumer otherwise grows the
    buffer forever.

    Replay safety: a poll is a point-in-time snapshot, so its rows write
    to a SPILL SEGMENT (``{first}-{last}.jsonl``, tmp + atomic rename —
    the filequeue pattern) BEFORE they enter the in-memory buffer. Any
    offset Spark could have logged is therefore durable: a restarted
    poller reloads uncommitted rows from the spill (offsets continuing
    where they left off, via the ``committed`` watermark file), so a
    crash-replayed ``readBetweenOffsets`` range re-reads the identical
    rows instead of an empty batch. ``prune`` advances the watermark and
    unlinks segments wholly below it."""

    def __init__(self, url: str, interval_s: float, split_lines: bool,
                 max_buffer: int = 100_000, spill_dir: Optional[str] = None):
        self.buffer: list[Tuple[int, str, str, str]] = []
        self.next = 0
        self.max_buffer = max_buffer
        self.lock = threading.Lock()
        self.url = url
        self.interval_s = interval_s
        self.split_lines = split_lines
        self.spill = spill_dir or default_poll_spill_dir(url)
        os.makedirs(self.spill, exist_ok=True)
        self._load_spill()
        self._etag: Optional[str] = None
        self._last_modified: Optional[str] = None
        self.closed = False
        threading.Thread(target=self._run, daemon=True).start()

    def _load_spill(self) -> None:
        base = 0
        marker = os.path.join(self.spill, "committed")
        if os.path.exists(marker):
            txt = open(marker).read().strip()
            base = int(txt) if txt else 0
        rows = []
        for name in sorted(os.listdir(self.spill)):
            if not name.endswith(".jsonl"):
                continue
            with open(os.path.join(self.spill, name)) as f:
                for line in f:
                    off, v, p, c = json.loads(line)
                    if off >= base:
                        rows.append((off, v, p, c))
        rows.sort(key=lambda r: r[0])
        self.buffer = rows
        self.next = max([base] + [r[0] + 1 for r in rows])

    def _poll_once(self) -> None:
        u = urlparse(self.url)
        conn_cls = (http.client.HTTPSConnection if u.scheme == "https"
                    else http.client.HTTPConnection)
        conn = conn_cls(u.hostname, u.port, timeout=30)
        try:
            # conditional GET: replay the validators the endpoint gave us
            # so an unchanged snapshot answers 304 and emits NOTHING —
            # interval polling otherwise re-ingests the same body forever
            headers = {}
            if self._etag:
                headers["If-None-Match"] = self._etag
            if self._last_modified:
                headers["If-Modified-Since"] = self._last_modified
            conn.request("GET", u.path or "/", headers=headers)
            resp = conn.getresponse()
            body = resp.read().decode("utf-8", "replace")
            ctype = resp.getheader("Content-Type",
                                   "application/octet-stream")
            if resp.status == 304:
                return  # validators matched: snapshot unchanged
            if resp.status != 200:
                return
            self._etag = resp.getheader("ETag")
            self._last_modified = resp.getheader("Last-Modified")
        finally:
            conn.close()
        values = body.splitlines() if self.split_lines else [body]
        if not values:
            return
        with self.lock:
            new = [
                (self.next + i, v, u.path or "/", ctype)
                for i, v in enumerate(values)
            ]
            # durable BEFORE visible: once read() can hand these offsets
            # to Spark, a crash-replay must find the same rows on disk
            seg = os.path.join(
                self.spill, f"{new[0][0]:020d}-{new[-1][0]:020d}.jsonl"
            )
            tmp = seg + ".tmp"
            with open(tmp, "w") as f:
                for r in new:
                    f.write(json.dumps(list(r)) + "\n")
            os.replace(tmp, seg)
            self.buffer.extend(new)
            self.next = new[-1][0] + 1

    def prune(self, upto: int) -> None:
        """Drop rows and spill segments wholly below the committed
        offset; the watermark file advances FIRST (tmp+rename) so a crash
        mid-prune never resurrects committed rows."""
        with self.lock:
            self.buffer = [r for r in self.buffer if r[0] >= upto]
            marker = os.path.join(self.spill, "committed")
            cur = 0
            if os.path.exists(marker):
                txt = open(marker).read().strip()
                cur = int(txt) if txt else 0
            if upto > cur:
                tmp = marker + ".tmp"
                with open(tmp, "w") as f:
                    f.write(str(upto))
                os.replace(tmp, marker)
            for name in os.listdir(self.spill):
                if not name.endswith(".jsonl"):
                    continue
                try:
                    last = int(name[:-6].split("-")[1])
                except (IndexError, ValueError):
                    continue
                if last < upto:
                    try:
                        os.unlink(os.path.join(self.spill, name))
                    except OSError:
                        pass

    def _run(self) -> None:
        while not self.closed:
            with self.lock:
                full = len(self.buffer) >= self.max_buffer
            if not full:
                try:
                    self._poll_once()
                except OSError:
                    pass  # endpoint down: poll again next tick
            time.sleep(self.interval_s)

    def stop(self) -> None:
        self.closed = True


#: live receivers/pollers keyed by their identity — module-level because
#: Spark pickles stream readers (threads/sockets don't pickle); the same
#: pattern as the websocket/amqp sources
_ENDPOINTS: dict = {}
_ENDPOINTS_LOCK = threading.Lock()


def _poller_for(options: dict) -> _Poller:
    key = ("poll", options["url"])
    with _ENDPOINTS_LOCK:
        ep = _ENDPOINTS.get(key)
        if ep is None or ep.closed:
            ep = _Poller(
                options["url"],
                float(options.get("poll.interval.ms", "1000")) / 1000.0,
                options.get("split.lines", "false") == "true",
                spill_dir=options.get("poll.spill.dir"),
            )
            _ENDPOINTS[key] = ep
        return ep


def _rx_call(host: str, port: int, method: str, path: str,
             body: bytes = b"") -> bytes:
    """One request against a WebhookReceiver's consumer API — the stream
    reader runs in its own Python worker process, so it drains the
    receiver over the wire rather than via shared memory."""
    conn = http.client.HTTPConnection(host, port, timeout=30)
    try:
        conn.request(method, path, body=body,
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        out = resp.read()
        if resp.status != 200:
            raise ConnectionError(f"receiver returned HTTP {resp.status}")
        return out
    finally:
        conn.close()


def _opt(opts: dict, key: str, default=None):
    return opts.get(f"http.{key}", opts.get(key, default))


def _register_source(spark) -> None:
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    class _Reader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.options = dict(options)
            self.mode = options.get("mode", "webhook")
            if self.mode == "webhook":
                self.host = options.get("host", "127.0.0.1")
                port = options.get("port")
                if not port:
                    raise ValueError(
                        "http webhook source requires an explicit 'port' "
                        "(the reader drains the receiver over the wire)"
                    )
                self.port = int(port)
            elif self.mode != "poll":
                raise ValueError(
                    f"unknown http source mode {self.mode!r} (webhook | poll)"
                )

        def _fetch(self, frm: int) -> Tuple[list, int]:
            if self.mode == "poll":
                ep = _poller_for(self.options)
                with ep.lock:
                    return ([list(r) for r in ep.buffer if r[0] >= frm],
                            ep.next)
            try:
                raw = _rx_call(self.host, self.port, "GET",
                               f"/__events?from={frm}")
            except OSError:
                return [], frm  # receiver not up yet: empty batch
            data = json.loads(raw)
            return data["rows"], data["next"]

        def initialOffset(self) -> dict:
            return {"offset": 0}

        def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
            lo = start["offset"]
            rows, end = self._fetch(lo)
            return (
                iter([(v, p, c) for _off, v, p, c in rows]),
                {"offset": max(end, lo)},
            )

        def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
            lo, hi = start["offset"], end["offset"]
            if lo >= hi:
                return iter(())
            rows, _ = self._fetch(lo)
            return iter([(v, p, c) for off, v, p, c in rows if off < hi])

        def commit(self, end: dict) -> None:
            hi = end["offset"]
            if self.mode == "poll":
                _poller_for(self.options).prune(hi)
                return
            try:
                _rx_call(self.host, self.port, "POST", "/__commit",
                         json.dumps({"upto": hi}).encode())
            except OSError:
                pass  # receiver gone; nothing to prune

    class HttpDataSource(DataSource):
        """format('http'): (value, path, content_type) rows."""

        @classmethod
        def name(cls) -> str:
            return "http"

        def schema(self) -> str:
            return "value string, path string, content_type string"

        def simpleStreamReader(self, schema):  # noqa: ARG002 — fixed schema
            return _Reader(self.options)

    spark.dataSource.register(HttpDataSource)


def http_source(spark, opts: dict):
    """Streaming DataFrame of webhook POST bodies or REST poll results."""
    mode = _opt(opts, "mode", "webhook")
    if mode == "poll" and not _opt(opts, "url"):
        raise ValueError("http poll source requires a 'url' option")
    if mode == "webhook" and not _opt(opts, "port"):
        raise ValueError(
            "http webhook source requires a 'port' option: start the "
            "endpoint with start_webhook_receiver(port=...) and pass "
            "the same port"
        )
    _register_source(spark)
    reader = spark.readStream.format("http")
    for key in ("mode", "host", "port", "url", "poll.interval.ms",
                "split.lines", "poll.spill.dir", "name"):
        val = _opt(opts, key)
        if val is not None:
            reader = reader.option(key, str(val))
    return reader.load()


def start_webhook_receiver(host: str = "127.0.0.1",
                           port: int = 0) -> WebhookReceiver:
    """Start the webhook endpoint the 'http' source drains. Run it in
    the app's process (any process — the stream reader connects over
    HTTP) and pass its ``.port`` as the source's ``port`` option."""
    return WebhookReceiver(host, port)


# ---------------------------------------------------------------------------
# sink
# ---------------------------------------------------------------------------

def post_with_retry(url: str, payload: bytes, content_type: str,
                    retries: int, backoff_s: float,
                    gzip_body: bool = False) -> int:
    """POST with exponential backoff (the reference's M4 bullet): attempt
    up to ``retries + 1`` times, sleeping backoff_s * 2^attempt between;
    non-2xx and connection errors both count as failures. Returns the
    final status; raises after the last attempt fails. ``gzip_body``
    sends the payload gzip-compressed with ``Content-Encoding: gzip``
    (the standard webhook batching practice — JSON bodies shrink ~10x)."""
    u = urlparse(url)
    headers = {"Content-Type": content_type}
    if gzip_body:
        import gzip as _gz

        payload = _gz.compress(payload)
        headers["Content-Encoding"] = "gzip"
    last: Exception | None = None
    for attempt in range(retries + 1):
        if attempt:
            time.sleep(backoff_s * (2 ** (attempt - 1)))
        try:
            conn_cls = (http.client.HTTPSConnection if u.scheme == "https"
                        else http.client.HTTPConnection)
            conn = conn_cls(u.hostname, u.port, timeout=30)
            try:
                conn.request("POST", u.path or "/", body=payload,
                             headers=headers)
                resp = conn.getresponse()
                resp.read()
                if 200 <= resp.status < 300:
                    return resp.status
                last = ValueError(f"HTTP {resp.status}")
            finally:
                conn.close()
        except OSError as e:
            last = e
    raise ConnectionError(
        f"POST {url} failed after {retries + 1} attempts: {last}"
    )


def _register_sink(spark) -> None:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamWriter,
        WriterCommitMessage,
    )

    class _Writer(DataSourceStreamWriter):
        def __init__(self, options):
            self.url = options["url"]
            self.retries = int(options.get("retries", "3"))
            self.backoff_s = float(options.get("backoff.ms", "100")) / 1000.0
            self.batch_size = int(options.get("batch.size", "1"))
            self.content_type = options.get("content_type",
                                            "application/json")
            self.gzip_body = options.get("compression", "none") == "gzip"

        def write(self, iterator) -> WriterCommitMessage:
            # executor-side, once per partition: single rows POST as JSON
            # objects, batch.size > 1 POSTs JSON arrays ("batch requests")
            batch: list = []

            def flush():
                if not batch:
                    return
                payload = (
                    json.dumps(batch[0], default=str)
                    if self.batch_size <= 1
                    else json.dumps(batch, default=str)
                ).encode("utf-8")
                post_with_retry(self.url, payload, self.content_type,
                                self.retries, self.backoff_s,
                                gzip_body=self.gzip_body)
                batch.clear()

            for row in iterator:
                d = row.asDict()
                batch.append(d["value"] if set(d) == {"value"} else d)
                if len(batch) >= max(1, self.batch_size):
                    flush()
            flush()
            return WriterCommitMessage()

        def commit(self, messages, batchId) -> None:
            pass

        def abort(self, messages, batchId) -> None:
            pass

    class HttpSinkDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "http-sink"

        def streamWriter(self, schema, overwrite):  # noqa: ARG002
            return _Writer(self.options)

    spark.dataSource.register(HttpSinkDataSource)


def http_sink_writer(df, opts: dict):
    """writeStream builder POSTing each micro-batch from the executors
    (per-partition connections, retry + exponential backoff)."""
    if not _opt(opts, "url"):
        raise ValueError("http sink requires a 'url' option")
    _register_sink(df.sparkSession)
    writer = df.writeStream.format("http-sink").option(
        "url", str(_opt(opts, "url"))
    )
    for key, default in (("retries", "3"), ("backoff.ms", "100"),
                         ("batch.size", "1"), ("compression", "none"),
                         ("content_type", "application/json")):
        writer = writer.option(key, str(_opt(opts, key, default)))
    if "checkpoint" in opts:
        writer = writer.option("checkpointLocation", opts["checkpoint"])
    return writer
