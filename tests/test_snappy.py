"""Snappy block codec (public format, from-scratch) + the xerial stream
container Kafka wraps snappy record batches in."""

from __future__ import annotations

import random
import struct

import pytest

from engine_spark.sources.snappy import (
    XERIAL_MAGIC,
    snappy_compress,
    snappy_decompress,
    xerial_frame,
    xerial_unframe,
)


def test_roundtrip_shapes():
    rng = random.Random(13)
    cases = [
        b"",
        b"a",
        b"abc",                      # below the 4-byte match minimum
        b"abcd" * 1000,              # highly repetitive -> copies
        bytes(rng.randrange(256) for _ in range(5000)),   # incompressible
        (b"the quick brown fox " * 37)[:500] + b"tail",
        bytes(70000),                # zeros: long overlapping copies,
                                     # literals > 60 never needed but
                                     # length > 65536 exercises splitting
    ]
    for data in cases:
        enc = snappy_compress(data)
        assert snappy_decompress(enc) == data
    # repetitive data actually compresses
    rep = b"abcd" * 1000
    assert len(snappy_compress(rep)) < len(rep) // 10


def test_decode_known_elements():
    # hand-built stream: varint len 10; literal "abcde" (tag (5-1)<<2);
    # copy-1 offset 5 len 5 (tag 0b000_001_01, offset byte 5) -> "abcde"
    raw = bytes([10, (5 - 1) << 2]) + b"abcde" + bytes([0b00000101, 5])
    assert snappy_decompress(raw) == b"abcdeabcde"
    # overlapping copy = run-length: literal "ab" + copy offset 2 len 6
    raw = bytes([8, (2 - 1) << 2]) + b"ab" + bytes([0x02 | (6 - 1) << 2]) \
        + struct.pack("<H", 2)
    assert snappy_decompress(raw) == b"abababab"
    # 61-byte literal uses the 1-extra-length-byte form
    lit = bytes(range(61))
    raw = bytes([61, 60 << 2, 60]) + lit
    assert snappy_decompress(raw) == lit


def test_decode_malformed_raises():
    with pytest.raises(ValueError):  # copy offset beyond output
        snappy_decompress(bytes([4, (1 - 1) << 2]) + b"a"
                          + bytes([0x02 | (3 - 1) << 2]) + struct.pack("<H", 9))
    with pytest.raises(ValueError):  # declared length != produced
        snappy_decompress(bytes([99, (3 - 1) << 2]) + b"abc")
    with pytest.raises(ValueError):  # truncated literal
        snappy_decompress(bytes([5, (5 - 1) << 2]) + b"ab")


def test_xerial_container_and_raw_fallback():
    data = b"kafka wraps snappy in the snappy-java container " * 2000
    framed = xerial_frame(data)
    assert framed.startswith(XERIAL_MAGIC)
    # > 32 KiB input -> multiple chunks
    assert len(data) > 32 * 1024
    assert xerial_unframe(framed) == data
    # raw-block fallback (older clients): no magic, still decodes
    assert xerial_unframe(snappy_compress(data[:100])) == data[:100]
    assert xerial_unframe(xerial_frame(b"")) == b""


def test_kafka_snappy_batch_roundtrip_and_wire():
    from engine_spark.sources.kafka import (
        CODEC_SNAPPY,
        KafkaBroker,
        KafkaClient,
        decode_record_batches,
        encode_record_batch,
        validate_batch_crc,
    )

    recs = [(1000, b"k", b"snappy-value " * 40), (1001, None, b"x" * 300)]
    batch = encode_record_batch(recs, codec=CODEC_SNAPPY)
    assert validate_batch_crc(batch)  # CRC over the on-wire bytes
    assert len(batch) < len(encode_record_batch(recs))
    got = decode_record_batches(batch)
    assert [(k, v) for _, _, k, v in got] == [
        (b"k", b"snappy-value " * 40), (None, b"x" * 300)
    ]

    broker = KafkaBroker(auto_create_partitions=1)
    try:
        c = KafkaClient("127.0.0.1", broker.port)
        c.metadata(["sn"])
        assert c.produce("sn", 0, batch) == 0
        _, fetched = c.fetch("sn", 0, 0)
        assert [(k, v) for _, _, k, v in fetched] == [
            (b"k", b"snappy-value " * 40), (None, b"x" * 300)
        ]
        c.close()
    finally:
        broker.stop()


def test_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=4000))
    def prop(data):
        assert snappy_decompress(snappy_compress(data)) == data
        assert xerial_unframe(xerial_frame(data)) == data

    prop()
