"""RFC 6455 WebSocket layer + Spark bindings (reference websocket_source.rs /
websocket_sink.rs — spec parity, stdlib implementation)."""

from __future__ import annotations

import json
import threading
import time

import pytest

from engine_spark.sources import create_sink_writer, create_source
from engine_spark.sources.websocket import (
    OP_BINARY,
    OP_TEXT,
    WSServer,
    accept_key,
    connect,
    encode_frame,
)


def _drain(predicate, timeout=15.0, step=0.1):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(step)
    return False


def test_accept_key_rfc_example():
    # the literal example from RFC 6455 §1.3
    assert accept_key("dGhlIHNhbXBsZSBub25jZQ==") == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="


def test_frame_roundtrip_all_lengths_and_masking():
    import socket as sock_mod

    from engine_spark.sources.websocket import read_frame

    a, b = sock_mod.socketpair()
    try:
        for payload in (b"", b"hi", b"x" * 200, b"y" * 70000):
            for mask in (True, False):
                a.sendall(encode_frame(payload, OP_BINARY, mask=mask))
                opcode, fin, got = read_frame(b)
                assert (opcode, fin, got) == (OP_BINARY, True, payload)
    finally:
        a.close()
        b.close()


def test_client_server_text_echo_and_ping():
    got: list[str] = []

    def on_message(conn, opcode, payload):
        got.append(payload.decode())
        conn.send_text("echo:" + payload.decode())

    server = WSServer(on_message=on_message)
    try:
        client = connect("127.0.0.1", server.port)
        client.send_text("hello")
        op, payload = client.recv_message()
        assert (op, payload) == (OP_TEXT, b"echo:hello")
        # unsolicited ping must be answered transparently by recv loop
        client.send_text("again")
        op, payload = client.recv_message()
        assert payload == b"echo:again"
        assert got == ["hello", "again"]
        client.close()
    finally:
        server.stop()


def test_fragmented_message_reassembly():
    from engine_spark.sources.websocket import OP_CONT

    server = WSServer()
    try:
        client = connect("127.0.0.1", server.port)
        assert _drain(lambda: len(server.connections) == 1)
        conn = server.connections[0]
        # server sends a 3-fragment text message
        conn._send(encode_frame(b"one-", OP_TEXT, fin=False))
        conn._send(encode_frame(b"two-", OP_CONT, fin=False))
        conn._send(encode_frame(b"three", OP_CONT, fin=True))
        op, payload = client.recv_message()
        assert (op, payload) == (OP_TEXT, b"one-two-three")
        client.close()
    finally:
        server.stop()


def test_spark_websocket_source_reads_frames(spark, tmp_path):
    server = WSServer()
    try:
        df = create_source(
            spark, {"extension": "websocket", "host": "127.0.0.1", "port": server.port}
        )
        assert df.isStreaming and df.columns == ["value"]
        query = (
            df.writeStream.format("memory")
            .queryName("ws_in")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            assert _drain(lambda: len(server.connections) == 1)
            for i in range(5):
                server.broadcast_text(f"msg-{i}")
            assert _drain(
                lambda: spark.sql("SELECT * FROM ws_in").count() >= 5
            ), "websocket rows never reached the memory sink"
            vals = {r.value for r in spark.sql("SELECT * FROM ws_in").collect()}
            assert {f"msg-{i}" for i in range(5)} <= vals
        finally:
            query.stop()
    finally:
        server.stop()


def test_spark_websocket_sink_pushes_rows(spark, tmp_path):
    received: list[dict] = []

    def on_message(conn, opcode, payload):
        received.append(json.loads(payload))

    server = WSServer(on_message=on_message)
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(json.dumps({"k": i, "v": f"row{i}"}) for i in range(4))
    )
    try:
        df = spark.readStream.schema("k long, v string").json(str(src))
        writer = create_sink_writer(
            df,
            {
                "extension": "websocket",
                "host": "127.0.0.1",
                "port": str(server.port),
                "checkpoint": str(tmp_path / "ck"),
            },
        )
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination(60)
        assert _drain(lambda: len(received) == 4), f"got {received}"
        assert {r["k"] for r in received} == {0, 1, 2, 3}
        assert {r["v"] for r in received} == {f"row{i}" for i in range(4)}
    finally:
        server.stop()
