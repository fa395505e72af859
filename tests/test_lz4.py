"""LZ4 block/frame codec + XXH32 (public specs, from-scratch) and the
Kafka codec-3 wire path."""

from __future__ import annotations

import random
import struct

import pytest

from engine_spark.sources.lz4 import (
    lz4_block_compress,
    lz4_block_decompress,
    lz4_frame_compress,
    lz4_frame_decompress,
    xxh32,
)


def test_xxh32_known_vectors():
    # the xxHash reference's published sanity vectors (seed 0 / seed'd)
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"", seed=0x9E3779B1) == 0x36B78AE7
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF
    assert xxh32(b"Hello World") == 0xB1FD16EE
    # > 16 bytes exercises the 4-lane stripe core
    assert xxh32(b"xxhash is used by the lz4 frame format") == xxh32(
        b"xxhash is used by the lz4 frame format"
    )
    assert xxh32(b"0123456789abcdef" * 4) != xxh32(b"0123456789abcdeF" * 4)


def test_block_roundtrip_shapes():
    rng = random.Random(29)
    cases = [
        b"",
        b"short",
        b"abcd" * 1000,
        bytes(rng.randrange(256) for _ in range(5000)),
        bytes(70000),
        (b"lz4 frames wrap lz4 blocks " * 53)[:1000],
    ]
    for data in cases:
        assert lz4_block_decompress(lz4_block_compress(data)) == data
    rep = b"abcd" * 1000
    assert len(lz4_block_compress(rep)) < len(rep) // 10


def test_block_decode_known_sequences():
    # token 0x22: 2 literals "ab", match len 2+4=6 at offset 2 -> "abababab"
    raw = bytes([0x22]) + b"ab" + struct.pack("<H", 2)
    assert lz4_block_decompress(raw) == b"abababab"
    # literals-only final sequence with 15+ extension: 20 bytes
    lit = bytes(range(20))
    raw = bytes([0xF0, 5]) + lit
    assert lz4_block_decompress(raw) == lit


def test_block_malformed_raises():
    with pytest.raises(ValueError):  # offset beyond output
        lz4_block_decompress(bytes([0x12]) + b"a" + struct.pack("<H", 9))
    with pytest.raises(ValueError):  # zero offset is invalid
        lz4_block_decompress(bytes([0x12]) + b"a" + struct.pack("<H", 0))
    with pytest.raises(ValueError):  # truncated literals
        lz4_block_decompress(bytes([0x50]) + b"ab")


def test_frame_roundtrip_and_checksums():
    data = b"the lz4 frame format carries xxh32 checksums " * 4000
    framed = lz4_frame_compress(data)
    assert struct.unpack_from("<I", framed, 0)[0] == 0x184D2204
    assert lz4_frame_decompress(framed) == data
    assert lz4_frame_decompress(lz4_frame_compress(b"")) == b""
    # corrupting one payload byte must trip the content checksum
    bad = bytearray(framed)
    bad[20] ^= 0xFF
    with pytest.raises(ValueError):
        lz4_frame_decompress(bytes(bad))
    # corrupting the descriptor must trip the header checksum
    bad = bytearray(framed)
    bad[5] ^= 0x10
    with pytest.raises(ValueError):
        lz4_frame_decompress(bytes(bad))


def test_frame_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=4000))
    def prop(data):
        assert lz4_block_decompress(lz4_block_compress(data)) == data
        assert lz4_frame_decompress(lz4_frame_compress(data)) == data

    prop()


def test_kafka_lz4_batch_roundtrip_and_wire():
    from engine_spark.sources.kafka import (
        CODEC_LZ4,
        KafkaBroker,
        KafkaClient,
        decode_record_batches,
        encode_record_batch,
        validate_batch_crc,
    )

    recs = [(1000, b"k", b"lz4-value " * 50), (1001, None, b"y" * 400)]
    batch = encode_record_batch(recs, codec=CODEC_LZ4)
    assert validate_batch_crc(batch)
    assert len(batch) < len(encode_record_batch(recs))
    got = decode_record_batches(batch)
    assert [(k, v) for _, _, k, v in got] == [
        (b"k", b"lz4-value " * 50), (None, b"y" * 400)
    ]

    broker = KafkaBroker(auto_create_partitions=1)
    try:
        c = KafkaClient("127.0.0.1", broker.port)
        c.metadata(["lz"])
        assert c.produce("lz", 0, batch) == 0
        _, fetched = c.fetch("lz", 0, 0)
        assert [(k, v) for _, _, k, v in fetched] == [
            (b"k", b"lz4-value " * 50), (None, b"y" * 400)
        ]
        c.close()
    finally:
        broker.stop()
