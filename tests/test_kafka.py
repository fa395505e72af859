"""Kafka wire layer + Spark bindings (public protocol spec, stdlib
implementation; the reference lists Kafka as planned-only —
MILESTONES.md:183-205 — so this is beyond-reference surface)."""

from __future__ import annotations

import json
import struct
import time

import pytest

from engine_spark.sources import create_sink_writer, create_source
from engine_spark.sources.kafka import (
    KafkaBroker,
    KafkaClient,
    crc32c,
    decode_record_batches,
    encode_record_batch,
    murmur2,
    partition_for_key,
    validate_batch_crc,
    write_varint,
    zigzag_decode,
    zigzag_encode,
)


def _drain(predicate, timeout=15.0, step=0.1):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(step)
    return False


# ---------------------------------------------------------------------------
# codec primitives
# ---------------------------------------------------------------------------

def test_crc32c_check_value():
    # the canonical CRC-32C check value ("123456789" -> 0xE3069283) plus
    # published vectors from RFC 3720 appendix B.4 (iSCSI uses CRC32C)
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA          # 32 zero bytes
    assert crc32c(bytes([0xFF] * 32)) == 0x62A8AB43  # 32 0xFF bytes


def test_zigzag_and_varint_roundtrip():
    from engine_spark.sources.kafka import KReader

    for v in (0, -1, 1, -2, 2, 127, -128, 300, -300, 2**31, -(2**31), 2**62):
        assert zigzag_decode(zigzag_encode(v)) == v
        r = KReader(write_varint(v))
        assert r.varint() == v
    # spec pins: zigzag maps 0,-1,1,-2 -> 0,1,2,3
    assert [zigzag_encode(v) for v in (0, -1, 1, -2)] == [0, 1, 2, 3]
    assert write_varint(0) == b"\x00"
    assert write_varint(-1) == b"\x01"
    assert write_varint(64) == b"\x80\x01"  # zigzag(64)=128 -> two bytes


def test_murmur2_against_independent_transcription():
    # second transcription of the public murmur2 (Kafka DefaultPartitioner
    # seed 0x9747b28c), written from the algorithm description
    def mm2(data: bytes) -> int:
        m, mask = 0x5BD1E995, 0xFFFFFFFF
        h = (0x9747B28C ^ len(data)) & mask
        i = 0
        while len(data) - i >= 4:
            k = int.from_bytes(data[i : i + 4], "little")
            k = (k * m) & mask
            k ^= k >> 24
            k = (k * m) & mask
            h = ((h * m) & mask) ^ k
            i += 4
        tail = data[i:]
        if len(tail) == 3:
            h ^= tail[2] << 16
        if len(tail) >= 2:
            h ^= tail[1] << 8
        if len(tail) >= 1:
            h ^= tail[0]
            h = (h * m) & mask
        h ^= h >> 13
        h = (h * m) & mask
        h ^= h >> 15
        return h

    for key in (b"", b"a", b"ab", b"abc", b"abcd", b"hello-kafka-key",
                bytes(range(17))):
        assert murmur2(key) == mm2(key)
    assert 0 <= partition_for_key(b"anything", 7) < 7


def test_record_batch_roundtrip_null_key_and_crc():
    recs = [
        (1700000000000, b"k0", b"v0"),
        (1700000000100, None, b"v1"),
        (1700000000200, b"k2", None),
    ]
    batch = encode_record_batch(recs, base_offset=0)
    assert batch[16] == 2  # magic at fixed offset 16
    assert validate_batch_crc(batch)
    out = decode_record_batches(batch)
    assert out == [
        (0, 1700000000000, b"k0", b"v0"),
        (1, 1700000000100, None, b"v1"),
        (2, 1700000000200, b"k2", None),
    ]
    # bit-flip anywhere in the CRC'd region must invalidate
    corrupt = bytearray(batch)
    corrupt[-1] ^= 0x01
    assert not validate_batch_crc(bytes(corrupt))
    # concatenated batches with a trailing partial batch: partial ignored
    b2 = encode_record_batch([(1700000000300, b"k", b"v")], base_offset=3)
    out2 = decode_record_batches(batch + b2 + b2[: len(b2) // 2])
    assert [o for o, *_ in out2] == [0, 1, 2, 3]


# ---------------------------------------------------------------------------
# client <-> broker protocol
# ---------------------------------------------------------------------------

def test_metadata_produce_fetch_list_offsets():
    broker = KafkaBroker(auto_create_partitions=2)
    try:
        c = KafkaClient("127.0.0.1", broker.port)
        assert set(c.api_versions()) >= {0, 1, 2, 3}
        md = c.metadata(["t1"])
        assert md["t1"]["partitions"] == [0, 1]

        base = c.produce("t1", 0, encode_record_batch(
            [(1000, b"a", b"one"), (1001, b"b", b"two")]
        ))
        assert base == 0
        base2 = c.produce("t1", 0, encode_record_batch([(1002, None, b"three")]))
        assert base2 == 2  # offsets continue across batches

        hw, recs = c.fetch("t1", 0, 0)
        assert hw == 3
        assert [(o, k, v) for o, _ts, k, v in recs] == [
            (0, b"a", b"one"), (1, b"b", b"two"), (2, None, b"three"),
        ]
        # fetch from a mid-batch offset: broker returns the whole batch,
        # client skips records below the requested offset
        _, recs1 = c.fetch("t1", 0, 1)
        assert [o for o, *_ in recs1] == [1, 2]

        assert c.list_offsets("t1", 0, -2) == 0  # earliest
        assert c.list_offsets("t1", 0, -1) == 3  # latest
        assert c.list_offsets("t1", 1, -1) == 0  # untouched partition
        c.close()
    finally:
        broker.stop()


def test_broker_rejects_corrupt_batch():
    broker = KafkaBroker()
    try:
        c = KafkaClient("127.0.0.1", broker.port)
        batch = bytearray(encode_record_batch([(1, b"k", b"v")]))
        batch[-1] ^= 0x01  # flip a payload bit: CRC32C must catch it
        with pytest.raises(ValueError, match="produce error 2"):
            c.produce("bad", 0, bytes(batch))
        assert broker.log_end("bad", 0) == 0  # nothing appended
        c.close()
    finally:
        broker.stop()


def test_keyed_partitioning_is_default_partitioner_stable():
    broker = KafkaBroker(auto_create_partitions=4)
    try:
        c = KafkaClient("127.0.0.1", broker.port)
        c.metadata(["keyed"])
        for i in range(20):
            key = f"user-{i}".encode()
            p = partition_for_key(key, 4)
            c.produce("keyed", p, encode_record_batch([(1, key, b"x")]))
        # every key must land where the partitioner says, and a re-hash
        # finds each one on its own partition
        for i in range(20):
            key = f"user-{i}".encode()
            p = partition_for_key(key, 4)
            _, recs = c.fetch("keyed", p, 0)
            assert key in {k for _o, _t, k, _v in recs}
        c.close()
    finally:
        broker.stop()


# ---------------------------------------------------------------------------
# Spark bindings
# ---------------------------------------------------------------------------

def test_spark_kafka_source_reads_topic_exactly_once(spark, tmp_path):
    broker = KafkaBroker(auto_create_partitions=2)
    try:
        c = KafkaClient("127.0.0.1", broker.port)
        c.metadata(["events"])
        for i in range(6):
            p = i % 2
            c.produce("events", p, encode_record_batch(
                [(1000 + i, f"k{i}".encode(),
                  json.dumps({"n": i}).encode())]
            ))

        df = create_source(
            spark,
            {
                "extension": "kafka",
                "kafka.bootstrap": f"127.0.0.1:{broker.port}",
                "kafka.topic": "events",
            },
        )
        assert df.isStreaming
        assert df.columns == ["key", "value", "topic", "partition",
                              "offset", "timestamp"]
        out = tmp_path / "out"

        def run_once():
            q = (
                df.writeStream.format("json")
                .option("path", str(out))
                .option("checkpointLocation", str(tmp_path / "ck"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(60)
            return spark.read.json(str(out)).collect()

        rows = run_once()
        assert len(rows) == 6
        assert {json.loads(r.value)["n"] for r in rows} == set(range(6))
        assert {(r.partition, r.offset) for r in rows} == {
            (0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2)
        }
        assert all(r.topic == "events" for r in rows)

        # restart from the same checkpoint: already-committed offsets must
        # NOT replay (exactly-once), only the new record arrives
        c.produce("events", 0, encode_record_batch([(2000, b"k9", b'{"n": 9}')]))
        rows2 = run_once()
        assert len(rows2) == 7  # 6 old (not re-read) + 1 new
        assert sorted(json.loads(r.value)["n"] for r in rows2) == [
            0, 1, 2, 3, 4, 5, 9,
        ]
        c.close()
    finally:
        broker.stop()


def test_spark_kafka_sink_produces_batched_records(spark, tmp_path):
    broker = KafkaBroker(auto_create_partitions=2)
    try:
        src = tmp_path / "in"
        src.mkdir()
        (src / "a.json").write_text(
            "\n".join(
                json.dumps({"key": f"u{i}", "value": f"payload-{i}"})
                for i in range(8)
            )
        )
        df = spark.readStream.schema("key string, value string").json(str(src))
        writer = create_sink_writer(
            df,
            {
                "extension": "kafka",
                "kafka.bootstrap": f"127.0.0.1:{broker.port}",
                "kafka.topic": "out",
                "checkpoint": str(tmp_path / "ck"),
            },
        )
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination(60)

        c = KafkaClient("127.0.0.1", broker.port)
        got = {}
        for p in (0, 1):
            _, recs = c.fetch("out", p, 0)
            for _o, _t, k, v in recs:
                got[k.decode()] = v.decode()
                # keyed rows must land on the DefaultPartitioner partition
                assert partition_for_key(k, 2) == p
        assert got == {f"u{i}": f"payload-{i}" for i in range(8)}
        c.close()
    finally:
        broker.stop()


def test_with_clause_kafka_source_json_mapper(spark, tmp_path):
    """WITH(type='source', extension='kafka', format='json', ...) — the
    reference's DDL surface against a live wire-protocol broker."""
    broker = KafkaBroker(auto_create_partitions=1)
    try:
        c = KafkaClient("127.0.0.1", broker.port)
        c.metadata(["typed"])
        c.produce("typed", 0, encode_record_batch(
            [(1, None, json.dumps({"sym": "A", "px": 1.5}).encode())]
        ))
        df = create_source(
            spark,
            {
                "extension": "kafka",
                "format": "json",
                "event.schema": "sym string, px double",
                "kafka.bootstrap": f"127.0.0.1:{broker.port}",
                "kafka.topic": "typed",
            },
        )
        assert df.columns == ["sym", "px"]
        q = (
            df.writeStream.format("memory")
            .queryName("kf_typed")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        row = spark.sql("SELECT * FROM kf_typed").collect()[0]
        assert row.sym == "A" and row.px == 1.5
        c.close()
    finally:
        broker.stop()


def test_idempotent_producer_dedups_replayed_batches():
    """KIP-98 idempotent produce at the protocol level: the same
    transactional_id maps to a stable pid, and re-producing a batch with
    the same (pid, partition, base_sequence) acks the ORIGINAL offset
    without appending; a different sequence appends normally."""
    broker = KafkaBroker(auto_create_partitions=1)
    try:
        c = KafkaClient("127.0.0.1", broker.port)
        assert 22 in c.api_versions()
        pid1, ep1 = c.init_producer_id("writer-A")
        pid1b, _ = c.init_producer_id("writer-A")
        pid2, _ = c.init_producer_id("writer-B")
        assert pid1 == pid1b and pid1 != pid2 and ep1 == 0

        c.metadata(["t"])
        batch = encode_record_batch(
            [(1, b"k", b"v1"), (2, b"k", b"v2")],
            producer_id=pid1, producer_epoch=ep1, base_sequence=0,
        )
        base = c.produce("t", 0, batch)
        assert base == 0
        # replay (crash-retry): same pid+sequence -> original offset, no growth
        assert c.produce("t", 0, batch) == 0
        assert broker.log_end("t", 0) == 2
        # next micro-batch: new sequence appends
        b2 = encode_record_batch(
            [(3, b"k", b"v3")],
            producer_id=pid1, producer_epoch=ep1, base_sequence=1,
        )
        assert c.produce("t", 0, b2) == 2
        assert broker.log_end("t", 0) == 3
        # non-idempotent batches (pid -1) always append
        plain = encode_record_batch([(4, None, b"v4")])
        assert c.produce("t", 0, plain) == 3
        assert c.produce("t", 0, plain) == 4
        c.close()
    finally:
        broker.stop()


def test_spark_kafka_sink_exactly_once_across_checkpoint_replay(spark, tmp_path):
    """End-to-end exactly-once: run an availableNow sink query, delete
    its newest commit marker so the batch REPLAYS from the checkpoint
    (same queryId, same batchId), rerun — the topic must hold each row
    exactly once."""
    broker = KafkaBroker(auto_create_partitions=1)
    try:
        src = tmp_path / "in"
        src.mkdir()
        (src / "a.json").write_text(
            "\n".join(json.dumps({"key": f"k{i}", "value": f"v{i}"})
                      for i in range(5))
        )
        df = spark.readStream.schema("key string, value string").json(str(src))
        ck = tmp_path / "ck"

        def run_once():
            writer = create_sink_writer(
                df,
                {
                    "extension": "kafka",
                    "kafka.bootstrap": f"127.0.0.1:{broker.port}",
                    "kafka.topic": "once",
                    "checkpoint": str(ck),
                },
            )
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination(60)

        run_once()
        assert broker.log_end("once", 0) == 5

        # force a replay of the committed batch: drop the newest commit
        commits = ck / "commits"
        newest = sorted(
            p for p in commits.iterdir() if not p.name.startswith(".")
        )[-1]
        newest.unlink()
        crc = commits / f".{newest.name}.crc"
        if crc.exists():
            crc.unlink()
        run_once()
        assert broker.log_end("once", 0) == 5  # replay appended NOTHING

        c = KafkaClient("127.0.0.1", broker.port)
        _, recs = c.fetch("once", 0, 0)
        assert sorted(v.decode() for _o, _t, _k, v in recs) == [
            f"v{i}" for i in range(5)
        ]
        c.close()
    finally:
        broker.stop()


def test_kafka_source_max_offsets_per_trigger_bounds_reads(spark, tmp_path):
    """max.offsets.per.trigger caps each prefetch read() at N records per
    partition (the driver-memory bound on a huge backlog); successive
    reads page through, and the streamed result still delivers every
    record exactly once."""
    from engine_spark.sources.kafka import make_stream_reader

    broker = KafkaBroker(auto_create_partitions=1)
    try:
        c = KafkaClient("127.0.0.1", broker.port)
        c.metadata(["bulk"])
        for i in range(9):
            c.produce("bulk", 0, encode_record_batch(
                [(1000 + i, None, json.dumps({"n": i}).encode())]
            ))
        opts = {
            "bootstrap": f"127.0.0.1:{broker.port}",
            "topic": "bulk",
            "max.offsets.per.trigger": "4",
        }
        r = make_stream_reader(opts)
        start = r.initialOffset()
        assert start == {"0": 0}
        rows1, end1 = r.read(start)
        assert end1 == {"0": 4} and len(list(rows1)) == 4  # capped
        rows2, end2 = r.read(end1)
        assert end2 == {"0": 8} and len(list(rows2)) == 4  # pages through
        rows3, end3 = r.read(end2)
        assert end3 == {"0": 9} and len(list(rows3)) == 1  # drains
        _, end4 = r.read(end3)
        assert end4 == {"0": 9}  # idle: offsets stop advancing

        # end-to-end through Spark: all 9 exactly once
        df = create_source(
            spark,
            {"extension": "kafka", **{f"kafka.{k}": v for k, v in opts.items()}},
        )
        out = tmp_path / "out"
        q = (
            df.writeStream.format("json")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        rows = spark.read.json(str(out)).collect()
        assert sorted(json.loads(r2.value)["n"] for r2 in rows) == list(range(9))
        c.close()
    finally:
        broker.stop()


def test_record_batch_property_roundtrip():
    """Hypothesis: arbitrary (timestamp, key, value) lists — including
    EMPTY (b'', distinct from null) keys/values, unicode payloads, and
    extreme timestamps — survive encode -> broker append -> fetch ->
    decode byte-exactly with contiguous offsets."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    blob = st.one_of(st.none(), st.binary(max_size=64))
    recs_strategy = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**62),
            blob,
            blob,
        ),
        min_size=1,
        max_size=20,
    )

    @given(recs=recs_strategy)
    @settings(max_examples=80, deadline=None)
    def check(recs):
        batch = encode_record_batch(recs, base_offset=0)
        assert validate_batch_crc(batch)
        out = decode_record_batches(batch)
        assert out == [(i, ts, k, v) for i, (ts, k, v) in enumerate(recs)]

    check()


def test_with_clause_error_routing_composes_with_kafka(spark, tmp_path):
    """on.error='fault' DLQ routing works on the kafka source exactly as
    on file/amqp sources: malformed JSON records land on the fault
    stream with their raw payloads, good records parse on."""
    from engine_spark.sources.registry import create_source_with_faults

    broker = KafkaBroker(auto_create_partitions=1)
    try:
        c = KafkaClient("127.0.0.1", broker.port)
        c.metadata(["mixed"])
        for payload in (b'{"sym": "A", "px": 1.5}', b"not json at all",
                        b'{"sym": "B", "px": 2.5}'):
            c.produce("mixed", 0, encode_record_batch([(1, None, payload)]))
        good, faults = create_source_with_faults(
            spark,
            {
                "extension": "kafka",
                "format": "json",
                "event.schema": "sym string, px double",
                "on.error": "fault",
                "kafka.bootstrap": f"127.0.0.1:{broker.port}",
                "kafka.topic": "mixed",
            },
        )
        assert faults is not None
        for name, df in (("kf_good", good), ("kf_faults", faults)):
            q = (
                df.writeStream.format("memory")
                .queryName(name)
                .option("checkpointLocation", str(tmp_path / name))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(60)
        good_rows = spark.sql("SELECT * FROM kf_good").collect()
        fault_rows = spark.sql("SELECT * FROM kf_faults").collect()
        assert {(r.sym, r.px) for r in good_rows} == {("A", 1.5), ("B", 2.5)}
        assert len(fault_rows) == 1
        assert "not json at all" in fault_rows[0].payload
        c.close()
    finally:
        broker.stop()


def test_unsupported_codec_refused_loudly():
    import struct as _s

    batch = bytearray(encode_record_batch([(1, b"k", b"v")]))
    # set attributes compression bits (offset 21, int16) to zstd (4) and
    # re-seal the CRC so only the codec refusal can fire — gzip (1),
    # snappy (2) and lz4 (3) are implemented now; zstd must still
    # refuse instead of misparsing
    _s.pack_into(">h", batch, 21, 4)
    _s.pack_into(">I", batch, 17, crc32c(bytes(batch[21:])))
    assert validate_batch_crc(bytes(batch))
    with pytest.raises(ValueError, match="compressed record batch"):
        decode_record_batches(bytes(batch))


def test_gzip_batch_roundtrip_and_wire():
    from engine_spark.sources.kafka import CODEC_GZIP

    recs = [(1000, b"k1", b"value-one" * 50), (1003, None, b"value-two" * 50)]
    batch = encode_record_batch(recs, codec=CODEC_GZIP)
    plain = encode_record_batch(recs)
    # the records region actually compressed (repetitive payload)
    assert len(batch) < len(plain)
    # header through the record count is plaintext: count at offset 57
    assert struct.unpack_from(">i", batch, 57)[0] == 2
    # CRC covers the on-wire (compressed) bytes
    assert validate_batch_crc(batch)
    out = decode_record_batches(batch)
    assert [(o, ts, k, v) for o, ts, k, v in out] == [
        (0, 1000, b"k1", b"value-one" * 50),
        (1, 1003, None, b"value-two" * 50),
    ]

    # through the broker: produce compressed, fetch decodes transparently
    broker = KafkaBroker(auto_create_partitions=1)
    try:
        c = KafkaClient("127.0.0.1", broker.port)
        c.metadata(["gz"])
        assert c.produce("gz", 0, batch) == 0
        _, fetched = c.fetch("gz", 0, 0)
        assert [(k, v) for _, _, k, v in fetched] == [
            (b"k1", b"value-one" * 50), (None, b"value-two" * 50)
        ]
        c.close()
    finally:
        broker.stop()


def test_multi_broker_leader_routing():
    """Two brokers sharing cluster state: partition leaders alternate by
    node id; a direct client hitting the WRONG node gets
    NOT_LEADER_FOR_PARTITION; KafkaClusterClient routes each partition to
    its leader and recovers from stale cached metadata by refreshing."""
    from engine_spark.sources.kafka import (
        ERR_NOT_LEADER_FOR_PARTITION,
        KafkaClusterClient,
        KafkaClusterState,
        KafkaWireError,
    )

    state = KafkaClusterState()
    b0 = KafkaBroker(node_id=0, cluster=state, auto_create_partitions=2)
    b1 = KafkaBroker(node_id=1, cluster=state, auto_create_partitions=2)
    try:
        cc = KafkaClusterClient("127.0.0.1", b0.port)
        # metadata from the bootstrap lists BOTH brokers with true leaders
        md = cc.metadata(["t"])
        assert set(md["__brokers__"]) == {0, 1}
        assert md["t"]["leaders"] == {0: 0, 1: 1}

        # cluster client produces to both partitions (p1's leader is b1,
        # which the bootstrap connection alone could not serve)
        assert cc.produce("t", 0, encode_record_batch([(1, b"a", b"p0")])) == 0
        assert cc.produce("t", 1, encode_record_batch([(2, b"b", b"p1")])) == 0
        # ...and the data landed on the LEADER's log, not the bootstrap's
        assert b0.log_end("t", 0) == 1 and b1.log_end("t", 1) == 1
        _, recs = cc.fetch("t", 1, 0)
        assert [(k, v) for _, _, k, v in recs] == [(b"b", b"p1")]
        assert cc.list_offsets("t", 1) == 1

        # a NON-routing client against the wrong node: loud error 6
        direct = KafkaClient("127.0.0.1", b0.port)
        direct.metadata(["t"])
        with pytest.raises(KafkaWireError) as ei:
            direct.produce("t", 1, encode_record_batch([(3, b"c", b"x")]))
        assert ei.value.code == ERR_NOT_LEADER_FOR_PARTITION
        direct.close()

        # stale-metadata recovery: poison the cache so partition 1 points
        # at node 0, then produce — the client must catch error 6,
        # re-fetch metadata, and land the batch on node 1
        cc._meta["t"] = {"partitions": [0, 1], "leaders": {0: 0, 1: 0},
                         "error": 0}
        assert cc.produce("t", 1, encode_record_batch([(4, b"d", b"p1b")])) == 1
        assert b1.log_end("t", 1) == 2
        cc.close()
    finally:
        b0.stop()
        b1.stop()


def test_cluster_client_recovers_from_dead_cached_connection():
    """The per-process routing client outlives broker restarts: a dead
    cached socket drops, metadata refreshes, and the call retries once —
    without this the stream reader's cached client would fail every
    micro-batch after a broker bounce."""
    from engine_spark.sources.kafka import KafkaClusterClient

    broker = KafkaBroker(auto_create_partitions=1)
    try:
        cc = KafkaClusterClient("127.0.0.1", broker.port)
        assert cc.produce("r", 0, encode_record_batch([(1, b"k", b"v")])) == 0
        for c in cc._conns.values():  # simulate a broker bounce
            c.sock.close()
        assert cc.produce("r", 0, encode_record_batch([(2, b"k", b"v2")])) == 1
        for c in cc._conns.values():  # bounce again, hit the METADATA path
            c.sock.close()
        assert cc.partitions("r") == [0]
        _, recs = cc.fetch("r", 0, 0)
        assert [v for *_, v in recs] == [b"v", b"v2"]
        cc.close()
    finally:
        broker.stop()


def test_record_batch_codec_property():
    """Any record list through any implemented codec (none/gzip/snappy/
    lz4) must CRC-validate and decode back exactly — offsets, timestamps,
    null keys/values included."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from engine_spark.sources.kafka import (
        CODEC_GZIP, CODEC_LZ4, CODEC_NONE, CODEC_SNAPPY,
    )

    rec = st.tuples(
        st.integers(min_value=0, max_value=2**40),
        st.one_of(st.none(), st.binary(max_size=60)),
        st.one_of(st.none(), st.binary(max_size=200)),
    )

    @settings(max_examples=120, deadline=None)
    @given(
        st.lists(rec, min_size=1, max_size=12),
        st.sampled_from([CODEC_NONE, CODEC_GZIP, CODEC_SNAPPY, CODEC_LZ4]),
    )
    def prop(records, codec):
        # timestamps may be non-monotonic: deltas are zigzag varints
        batch = encode_record_batch(records, codec=codec)
        assert validate_batch_crc(batch)
        got = decode_record_batches(batch)
        assert [(ts, k, v) for _o, ts, k, v in got] == records

    prop()


@pytest.mark.parametrize("comp,bits", [("gzip", 1), ("snappy", 2), ("lz4", 3)])
def test_spark_kafka_sink_with_compression(spark, tmp_path, comp, bits):
    """compression=<codec> through the STREAMING sink: the produced
    batches carry the codec's attribute bits and compressed records
    regions on the broker log (inspected raw), and fetch decodes them
    transparently — the option plumbing proven for all three codecs."""
    broker = KafkaBroker(auto_create_partitions=1)
    try:
        src = tmp_path / "in"
        src.mkdir()
        (src / "a.json").write_text(
            "\n".join(
                json.dumps({"key": f"k{i}", "value": "squeeze-me " * 30})
                for i in range(6)
            )
        )
        df = spark.readStream.schema("key string, value string").json(str(src))
        writer = create_sink_writer(
            df,
            {
                "extension": "kafka",
                "kafka.bootstrap": f"127.0.0.1:{broker.port}",
                "kafka.topic": "cout",
                "kafka.compression": comp,
                "checkpoint": str(tmp_path / "ck"),
            },
        )
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination(60)

        # raw log inspection: every appended batch declares the codec
        with broker.lock:
            raws = [raw for _b, _n, raw in broker.logs[("cout", 0)]]
        assert raws
        assert all(struct.unpack_from(">h", raw, 21)[0] & 0x07 == bits
                   for raw in raws)
        c = KafkaClient("127.0.0.1", broker.port)
        _, recs = c.fetch("cout", 0, 0)
        assert {k.decode() for _o, _t, k, _v in recs} == {
            f"k{i}" for i in range(6)
        }
        assert all(v == b"squeeze-me " * 30 for *_, v in recs)
        c.close()
    finally:
        broker.stop()


def test_spark_source_and_sink_route_across_two_brokers(spark, tmp_path):
    """End-to-end multi-broker: partition 0 leads on node 0, partition 1
    on node 1. The streaming SINK must land keyed rows on each leader's
    local log, and the streaming SOURCE (bootstrapped at node 0 only)
    must fetch both partitions by routing to their leaders."""
    from engine_spark.sources.kafka import KafkaClusterState

    state = KafkaClusterState()
    b0 = KafkaBroker(node_id=0, cluster=state, auto_create_partitions=2)
    b1 = KafkaBroker(node_id=1, cluster=state, auto_create_partitions=2)
    try:
        # keys chosen so the DefaultPartitioner spreads both partitions
        keys = [f"mk{i}" for i in range(12)]
        parts = {k: partition_for_key(k.encode(), 2) for k in keys}
        assert set(parts.values()) == {0, 1}

        src = tmp_path / "in"
        src.mkdir()
        (src / "a.json").write_text(
            "\n".join(json.dumps({"key": k, "value": f"v-{k}"}) for k in keys)
        )
        df = spark.readStream.schema("key string, value string").json(str(src))
        writer = create_sink_writer(
            df,
            {
                "extension": "kafka",
                "kafka.bootstrap": f"127.0.0.1:{b0.port}",  # node 0 only
                "kafka.topic": "mb",
                "checkpoint": str(tmp_path / "ck_sink"),
            },
        )
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination(60)

        # rows landed on each LEADER's local log (node 1 got partition 1
        # even though only node 0 was in the bootstrap)
        n0 = b0.log_end("mb", 0)
        n1 = b1.log_end("mb", 1)
        assert n0 == sum(1 for p in parts.values() if p == 0)
        assert n1 == sum(1 for p in parts.values() if p == 1)

        # source side: bootstrap node 0, read BOTH partitions back
        sdf = create_source(
            spark,
            {
                "extension": "kafka",
                "kafka.bootstrap": f"127.0.0.1:{b0.port}",
                "kafka.topic": "mb",
            },
        )
        out = tmp_path / "out"
        q2 = (
            sdf.writeStream.format("json")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / "ck_src"))
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(60)
        rows = spark.read.json(str(out)).collect()
        assert {r.key for r in rows} == set(keys)
        assert {r.partition for r in rows} == {0, 1}
    finally:
        b0.stop()
        b1.stop()
