"""AMQP 0-9-1 wire layer + RabbitMQ Spark bindings (reference
rabbitmq_source.rs / rabbitmq_sink.rs — spec parity, stdlib implementation)."""

from __future__ import annotations

import json
import time

import pytest

from engine_spark.sources import create_sink_writer, create_source
from engine_spark.sources.amqp import (
    AMQPBroker,
    AMQPClient,
    Reader,
    Writer,
    content_header_payload,
    parse_content_header,
)


def _drain(predicate, timeout=15.0, step=0.1):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(step)
    return False


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------

def test_field_table_roundtrip():
    table = {
        "product": "engine-spark",
        "flag": True,
        "count": 42,
        "ratio": 2.5,
        "nested": {"a": "b"},
        "nothing": None,
    }
    raw = bytes(Writer().table(table).buf)
    assert Reader(raw).table() == table


def test_shortstr_rejects_overlong():
    with pytest.raises(ValueError):
        Writer().shortstr("x" * 256)


def test_content_header_roundtrip():
    payload = content_header_payload(1234, "text/plain", delivery_mode=2)
    body_size, props = parse_content_header(payload)
    assert body_size == 1234
    assert props == {"content_type": "text/plain", "delivery_mode": 2}


def test_bits_pack_lsb_first():
    # §4.2.5.2: consecutive bit fields pack into one octet, LSB first
    raw = bytes(Writer().bits(True, False, True).buf)
    assert raw == bytes([0b101])
    assert Reader(raw).bits(3) == (True, False, True)


# ---------------------------------------------------------------------------
# client ↔ broker protocol
# ---------------------------------------------------------------------------

def test_publish_then_consume_with_ack():
    broker = AMQPBroker()
    try:
        pub = AMQPClient("127.0.0.1", broker.port)
        pub.queue_declare("events")
        for i in range(3):
            pub.publish(f"m{i}".encode(), routing_key="events")
        pub.close()
        assert broker.queue_depth("events") == 3

        sub = AMQPClient("127.0.0.1", broker.port)
        sub.queue_declare("events")
        sub.consume("events")
        got = [sub.next_delivery(timeout=5.0) for _ in range(3)]
        assert [d.body for d in got] == [b"m0", b"m1", b"m2"]
        assert got[0].routing_key == "events"
        sub.ack(got[-1].delivery_tag, multiple=True)
        assert _drain(lambda: not broker._conns[0].unacked if broker._conns else True)
        sub.close()
    finally:
        broker.stop()


def test_direct_exchange_routing_and_fanout():
    broker = AMQPBroker()
    try:
        client = AMQPClient("127.0.0.1", broker.port)
        client.exchange_declare("orders", "direct")
        client.queue_declare("eu")
        client.queue_declare("us")
        client.queue_bind("eu", "orders", "eu-key")
        client.queue_bind("us", "orders", "us-key")
        client.publish(b"a", routing_key="eu-key", exchange="orders")
        client.publish(b"b", routing_key="us-key", exchange="orders")
        client.publish(b"c", routing_key="nowhere", exchange="orders")  # dropped
        # publish is async (no RPC reply) — wait for the broker to route
        assert _drain(lambda: broker.queue_depth("eu") == 1)
        assert _drain(lambda: broker.queue_depth("us") == 1)

        client.exchange_declare("all", "fanout")
        client.queue_bind("eu", "all", "")
        client.queue_bind("us", "all", "")
        client.publish(b"x", routing_key="ignored", exchange="all")
        assert _drain(lambda: broker.queue_depth("eu") == 2)
        assert _drain(lambda: broker.queue_depth("us") == 2)
        client.close()
    finally:
        broker.stop()


def test_unacked_messages_requeued_on_disconnect():
    broker = AMQPBroker()
    try:
        pub = AMQPClient("127.0.0.1", broker.port)
        pub.queue_declare("q")
        pub.publish(b"keep-me", routing_key="q")
        pub.close()

        # consumer takes delivery but dies without acking
        sub = AMQPClient("127.0.0.1", broker.port)
        sub.queue_declare("q")
        sub.consume("q")
        d = sub.next_delivery(timeout=5.0)
        assert d.body == b"keep-me"
        sub.sock.close()  # crash, no ack, no clean close

        assert _drain(lambda: broker.queue_depth("q") == 1), (
            "unacked delivery was not requeued after consumer crash"
        )

        sub2 = AMQPClient("127.0.0.1", broker.port)
        sub2.queue_declare("q")
        sub2.consume("q")
        d2 = sub2.next_delivery(timeout=5.0)
        assert d2.body == b"keep-me"
        sub2.ack(d2.delivery_tag)
        sub2.close()
    finally:
        broker.stop()


def test_large_body_split_across_frames():
    broker = AMQPBroker()
    try:
        client = AMQPClient("127.0.0.1", broker.port)
        client.queue_declare("big")
        body = bytes(range(256)) * 1024  # 256 KiB > frame_max
        client.publish(body, routing_key="big", content_type="application/octet-stream")
        sub = AMQPClient("127.0.0.1", broker.port)
        sub.queue_declare("big")
        sub.consume("big")
        d = sub.next_delivery(timeout=5.0)
        assert d.body == body
        sub.ack(d.delivery_tag)
        client.close()
        sub.close()
    finally:
        broker.stop()


# ---------------------------------------------------------------------------
# Spark bindings
# ---------------------------------------------------------------------------

def test_spark_rabbitmq_source_reads_queue(spark, tmp_path):
    broker = AMQPBroker()
    try:
        pub = AMQPClient("127.0.0.1", broker.port)
        pub.queue_declare("sensor")
        for i in range(5):
            pub.publish(
                json.dumps({"device": f"d{i}", "temp": 20 + i}).encode(),
                routing_key="sensor",
            )

        df = create_source(
            spark,
            {
                "extension": "rabbitmq",
                "rabbitmq.host": "127.0.0.1",
                "rabbitmq.port": broker.port,
                "rabbitmq.queue": "sensor",
            },
        )
        assert df.isStreaming and df.columns == ["value", "routing_key"]
        query = (
            df.writeStream.format("memory")
            .queryName("mq_in")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            # 60 s, not the default 15: under full-suite + concurrent-sweep
            # CPU saturation the first micro-batch can take >15 s to plan
            # (observed flake — passes in isolation; the deadline only
            # bounds the failure case)
            assert _drain(
                lambda: spark.sql("SELECT * FROM mq_in").count() >= 5,
                timeout=60.0,
            ), "rabbitmq rows never reached the memory sink"
            rows = spark.sql("SELECT * FROM mq_in").collect()
            temps = {json.loads(r.value)["temp"] for r in rows}
            assert {20, 21, 22, 23, 24} <= temps
            assert all(r.routing_key == "sensor" for r in rows)
            # ack timing: commit(end of batch N) fires when batch N+1 is
            # constructed, so publish one more message to force the next
            # batch — the first wave's deliveries must then ack broker-side,
            # leaving at most the flush message unacked.
            pub.publish(b'{"device": "flush", "temp": 99}', routing_key="sensor")
            assert _drain(
                lambda: sum(len(c.unacked) for c in broker._conns) <= 1
            ), "committed deliveries were never acked"
        finally:
            query.stop()
        pub.close()
    finally:
        broker.stop()


def test_spark_rabbitmq_sink_publishes_rows(spark, tmp_path):
    broker = AMQPBroker()
    try:
        src = tmp_path / "in"
        src.mkdir()
        (src / "a.json").write_text(
            "\n".join(json.dumps({"k": i, "v": f"row-{i}"}) for i in range(4))
        )
        df = spark.readStream.schema("k long, v string").json(str(src))
        writer = create_sink_writer(
            df,
            {
                "extension": "rabbitmq",
                "rabbitmq.host": "127.0.0.1",
                "rabbitmq.port": broker.port,
                "rabbitmq.queue": "out",
                "checkpoint": str(tmp_path / "ck"),
            },
        )
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination(60)
        assert _drain(lambda: broker.queue_depth("out") == 4), (
            f"expected 4 published messages, queue depth {broker.queue_depth('out')}"
        )

        sub = AMQPClient("127.0.0.1", broker.port)
        sub.queue_declare("out")
        sub.consume("out")
        bodies = [json.loads(sub.next_delivery(5.0).body) for _ in range(4)]
        assert {b["v"] for b in bodies} == {f"row-{i}" for i in range(4)}
        sub.close()
    finally:
        broker.stop()


def test_with_clause_rabbitmq_source_json_mapper(spark, tmp_path):
    """WITH(type='source', extension='rabbitmq', format='json', ...) — the
    reference's full DDL surface (with_clause.rs) against a live broker."""
    broker = AMQPBroker()
    try:
        pub = AMQPClient("127.0.0.1", broker.port)
        pub.queue_declare("typed")
        pub.publish(json.dumps({"sym": "A", "px": 1.5}).encode(), routing_key="typed")
        df = create_source(
            spark,
            {
                "extension": "rabbitmq",
                "format": "json",
                "event.schema": "sym string, px double",
                "rabbitmq.host": "127.0.0.1",
                "rabbitmq.port": broker.port,
                "rabbitmq.queue": "typed",
            },
        )
        assert df.columns == ["sym", "px"]
        query = (
            df.writeStream.format("memory")
            .queryName("mq_typed")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            assert _drain(lambda: spark.sql("SELECT * FROM mq_typed").count() >= 1)
            row = spark.sql("SELECT * FROM mq_typed").collect()[0]
            assert (row.sym, row.px) == ("A", 1.5)
        finally:
            query.stop()
        pub.close()
    finally:
        broker.stop()
