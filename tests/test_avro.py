"""Avro wire-format tests: spec byte vectors, per-type roundtrips, Object
Container Files (null/deflate/snappy codecs), single-object encoding with
CRC-64-AVRO fingerprints, and the Spark mapper / OCF reader integration.

Byte vectors are transcribed from the public Apache Avro specification's
own examples (zigzag table; the {"a": 27, "b": "foo"} record example
encoding to 36 06 66 6f 6f).
"""

from __future__ import annotations

import io
import json
import struct

import pytest

from engine_spark.sources.avro import (
    AvroError,
    avro_spark_type,
    canonical_form,
    decode_datum,
    encode_datum,
    fingerprint64,
    parse_schema,
    read_ocf,
    single_object_decode,
    single_object_encode,
    write_ocf,
)


# ---------------------------------------------------------------------------
# spec vectors
# ---------------------------------------------------------------------------

def test_zigzag_varint_spec_table():
    # the spec's own value/hex table for int/long encoding
    for value, hexbytes in [
        (0, "00"),
        (-1, "01"),
        (1, "02"),
        (-2, "03"),
        (2, "04"),
        (-64, "7f"),
        (64, "8001"),
    ]:
        assert encode_datum(value, '"long"').hex() == hexbytes
        assert decode_datum(bytes.fromhex(hexbytes), '"long"') == value


def test_record_example_from_spec():
    # spec: record {"a": 27, "b": "foo"} encodes to 36 06 66 6f 6f
    schema = json.dumps(
        {
            "type": "record",
            "name": "test",
            "fields": [
                {"name": "a", "type": "long"},
                {"name": "b", "type": "string"},
            ],
        }
    )
    enc = encode_datum({"a": 27, "b": "foo"}, schema)
    assert enc.hex() == "3606666f6f"
    assert decode_datum(enc, schema) == {"a": 27, "b": "foo"}


def test_array_example_from_spec():
    # spec: array<long> [3, 27] encodes to 04 06 36 00
    enc = encode_datum([3, 27], '{"type": "array", "items": "long"}')
    assert enc.hex() == "04063600"


def test_union_null_string_examples_from_spec():
    # spec: union ["null","string"]: null → 00; "a" → 02 02 61
    sch = '["null", "string"]'
    assert encode_datum(None, sch).hex() == "00"
    assert encode_datum("a", sch).hex() == "020261"
    assert decode_datum(bytes.fromhex("020261"), sch) == "a"
    assert decode_datum(b"\x00", sch) is None


def test_long_extremes_roundtrip():
    for v in (2**63 - 1, -(2**63), 2**31, -(2**31) - 1, 123456789012345):
        assert decode_datum(encode_datum(v, '"long"'), '"long"') == v


# ---------------------------------------------------------------------------
# per-type roundtrips
# ---------------------------------------------------------------------------

FULL_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "Everything",
        "namespace": "org.example",
        "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "fx", "type": {"type": "fixed", "name": "F8", "size": 8}},
            {"name": "e", "type": {"type": "enum", "name": "Color",
                                    "symbols": ["RED", "GREEN", "BLUE"]}},
            {"name": "arr", "type": {"type": "array", "items": "int"}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
            {"name": "opt", "type": ["null", "string"]},
            {"name": "nested", "type": {
                "type": "record", "name": "Inner",
                "fields": [{"name": "x", "type": "double"}]}},
        ],
    }
)

FULL_VALUE = {
    "b": True,
    "i": -42,
    "l": 2**40,
    "f": 1.5,
    "d": -2.25,
    "s": "héllo ✓",
    "by": b"\x00\xff\x01",
    "fx": b"12345678",
    "e": "GREEN",
    "arr": [1, -2, 3],
    "m": {"k1": 10, "k2": -20},
    "opt": None,
    "nested": {"x": 3.5},
}


def test_full_record_roundtrip():
    enc = encode_datum(FULL_VALUE, FULL_SCHEMA)
    assert decode_datum(enc, FULL_SCHEMA) == FULL_VALUE


def test_recursive_schema_linked_list():
    sch = json.dumps(
        {
            "type": "record",
            "name": "Node",
            "fields": [
                {"name": "v", "type": "int"},
                {"name": "next", "type": ["null", "Node"]},
            ],
        }
    )
    value = {"v": 1, "next": {"v": 2, "next": {"v": 3, "next": None}}}
    assert decode_datum(encode_datum(value, sch), sch) == value


def test_negative_block_count_with_size_decodes():
    # writers MAY emit negative count + byte size; readers must accept
    sch = '{"type": "array", "items": "long"}'
    body = bytearray()
    items = bytearray()
    from engine_spark.sources.avro import _write_long

    for v in (3, 27):
        _write_long(items, v)
    _write_long(body, -2)           # 2 items, size-prefixed form
    _write_long(body, len(items))
    body += items
    _write_long(body, 0)
    assert decode_datum(bytes(body), sch) == [3, 27]


def test_truncation_and_bad_enum_raise():
    sch = '"string"'
    enc = encode_datum("hello", sch)
    with pytest.raises(AvroError):
        decode_datum(enc[:-1], sch)
    esch = '{"type": "enum", "name": "E", "symbols": ["A"]}'
    with pytest.raises(AvroError):
        decode_datum(encode_datum(5, '"long"'), esch)
    with pytest.raises(AvroError):
        encode_datum("NOPE", esch)


def test_trailing_bytes_rejected():
    with pytest.raises(AvroError):
        decode_datum(encode_datum(1, '"long"') + b"\x00", '"long"')


# ---------------------------------------------------------------------------
# canonical form + fingerprint
# ---------------------------------------------------------------------------

def test_canonical_form_rules():
    # fullname inlined, doc/default stripped, field order normalized,
    # primitive wrapper form flattened
    sch = json.dumps(
        {
            "namespace": "org.ex",
            "doc": "ignored",
            "name": "R",
            "type": "record",
            "fields": [
                {"default": 7, "type": {"type": "int"}, "name": "a"},
            ],
        }
    )
    assert canonical_form(sch) == (
        '{"name":"org.ex.R","type":"record",'
        '"fields":[{"name":"a","type":"int"}]}'
    )


def test_fingerprint_is_stable_and_schema_sensitive():
    f1 = fingerprint64(b"abc")
    assert f1 == fingerprint64(b"abc")
    assert f1 != fingerprint64(b"abd")
    # equivalent spellings of one schema share a fingerprint
    a = canonical_form('{"type": "string"}')
    b = canonical_form('"string"')
    assert a == b == '"string"'


def test_single_object_roundtrip_and_fingerprint_check():
    sch = json.dumps(
        {"type": "record", "name": "T",
         "fields": [{"name": "a", "type": "long"}]}
    )
    blob = single_object_encode({"a": 27}, sch)
    assert blob[:2] == b"\xc3\x01"
    assert single_object_decode(blob, sch) == {"a": 27}
    other = json.dumps(
        {"type": "record", "name": "U",
         "fields": [{"name": "a", "type": "long"}]}
    )
    with pytest.raises(AvroError, match="fingerprint mismatch"):
        single_object_decode(blob, other)


# ---------------------------------------------------------------------------
# Object Container Files
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
def test_ocf_roundtrip_codecs(codec):
    recs = [{"a": i, "b": f"s{i}"} for i in range(250)]
    sch = json.dumps(
        {"type": "record", "name": "T",
         "fields": [{"name": "a", "type": "long"},
                    {"name": "b", "type": "string"}]}
    )
    buf = io.BytesIO()
    write_ocf(buf, sch, recs, codec=codec, block_records=100)
    schema_json, it = read_ocf(buf.getvalue())
    assert json.loads(schema_json)["name"] == "T"
    assert list(it) == recs


def test_ocf_corrupt_sync_marker_raises():
    sch = '{"type": "record", "name": "T", "fields": [{"name": "a", "type": "long"}]}'
    buf = io.BytesIO()
    write_ocf(buf, sch, [{"a": 1}])
    raw = bytearray(buf.getvalue())
    raw[-1] ^= 0xFF  # flip last sync byte
    _, it = read_ocf(bytes(raw))
    with pytest.raises(AvroError, match="sync marker"):
        list(it)


def test_ocf_snappy_crc_validates():
    sch = '{"type": "record", "name": "T", "fields": [{"name": "a", "type": "long"}]}'
    buf = io.BytesIO()
    write_ocf(buf, sch, [{"a": 1}], codec="snappy")
    raw = bytearray(buf.getvalue())
    # corrupt the stored CRC (last 4 bytes before the trailing sync)
    raw[-17] ^= 0xFF
    _, it = read_ocf(bytes(raw))
    with pytest.raises(AvroError):
        list(it)


def test_ocf_unknown_codec_refuses():
    sch = '{"type": "record", "name": "T", "fields": [{"name": "a", "type": "long"}]}'
    buf = io.BytesIO()
    with pytest.raises(AvroError, match="codec"):
        write_ocf(buf, sch, [{"a": 1}], codec="zstandard")


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

EVENT_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "Event",
        "fields": [
            {"name": "event_id", "type": "long"},
            {"name": "kind", "type": "string"},
            {"name": "value", "type": ["null", "double"]},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
        ],
    }
)


def test_avro_spark_type_mapping():
    assert avro_spark_type(EVENT_SCHEMA) == (
        "`event_id` bigint,`kind` string,`value` double,`tags` array<string>"
    )
    with pytest.raises(AvroError, match="non-null branches"):
        avro_spark_type(
            '{"type":"record","name":"R","fields":'
            '[{"name":"u","type":["int","string"]}]}'
        )


def test_mapper_roundtrip_through_spark(spark):
    from engine_spark.sources.mappers import map_in, map_out

    rows = [
        (1, "click", 0.5, ["a", "b"]),
        (2, "view", None, []),
        (3, "buy", -1.25, ["z"]),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, kind string, value double, tags array<string>"
    )
    encoded = map_out("avro", df, schema=EVENT_SCHEMA)
    assert encoded.schema.simpleString() == "struct<value:binary>"
    decoded = map_in("avro", encoded, schema=EVENT_SCHEMA)
    got = sorted(
        (r.event_id, r.kind, r.value, list(r.tags)) for r in decoded.collect()
    )
    assert got == [(1, "click", 0.5, ["a", "b"]), (2, "view", None, []),
                   (3, "buy", -1.25, ["z"])]


def test_avro_out_derives_schema_from_dataframe(spark):
    from engine_spark.sources.avro import avro_in, avro_out

    df = spark.createDataFrame([(1, "x"), (2, None)], "a long, s string")
    enc = avro_out(df)  # no explicit schema: derived, nullables as unions
    # decode back with the SAME derived schema
    from engine_spark.sources.avro import _spark_to_avro_json

    sch = _spark_to_avro_json(df.schema)
    back = avro_in(enc, sch)
    assert sorted((r.a, r.s) for r in back.collect()) == [(1, "x"), (2, None)]


def test_read_ocf_df_parallel_files(spark, tmp_path):
    from engine_spark.sources.avro import read_ocf_df

    sch = json.dumps(
        {"type": "record", "name": "D",
         "fields": [{"name": "id", "type": "long"},
                    {"name": "txt", "type": "string"}]}
    )
    for part in range(3):
        with open(tmp_path / f"part-{part}.avro", "wb") as fh:
            write_ocf(
                fh, sch,
                [{"id": part * 10 + i, "txt": f"d{part}-{i}"} for i in range(5)],
                codec="deflate",
            )
    df = read_ocf_df(spark, str(tmp_path))
    assert df.schema.simpleString() == "struct<id:bigint,txt:string>"
    assert df.count() == 15
    assert df.agg({"id": "max"}).collect()[0][0] == 24


def test_avro_mapper_fault_routing(spark):
    from engine_spark.sources.mappers import map_in_split

    good_payload = encode_datum(
        {"event_id": 9, "kind": "ok", "value": 1.0, "tags": []},
        EVENT_SCHEMA,
    )
    df = spark.createDataFrame(
        [(good_payload,), (b"\xff\xff\xff garbage",), (None,)],
        "value binary",
    )
    good, faults = map_in_split("avro", df, schema=EVENT_SCHEMA)
    assert [(r.event_id, r.kind) for r in good.collect()] == [(9, "ok")]
    fr = faults.collect()
    assert len(fr) == 2
    assert all(r.error.startswith("avro mapper:") for r in fr)
    assert any("null payload" in r.error for r in fr)


def test_avro_over_kafka_end_to_end(spark, tmp_path):
    """The realistic estate shape: Avro-encoded payloads on a Kafka topic,
    consumed through the WITH(...) registry with format='avro' and
    on.error='fault' — good records arrive typed, the poison payload
    arrives on the fault branch, exactly once each."""
    from engine_spark.sources.kafka import (
        KafkaBroker,
        KafkaClient,
        encode_record_batch,
    )
    from engine_spark.sources.registry import create_source_with_faults

    broker = KafkaBroker(auto_create_partitions=1)
    try:
        c = KafkaClient("127.0.0.1", broker.port)
        c.metadata(["av"])
        payloads = [
            encode_datum(
                {"event_id": i, "kind": f"k{i}", "value": float(i), "tags": []},
                EVENT_SCHEMA,
            )
            for i in range(3)
        ] + [b"\x01poison"]
        c.produce(
            "av", 0,
            encode_record_batch([(0, None, p) for p in payloads]),
        )
        c.close()

        good, faults = create_source_with_faults(
            spark,
            {
                "extension": "kafka",
                "bootstrap": f"127.0.0.1:{broker.port}",
                "topic": "av",
                "format": "avro",
                "event.schema": EVENT_SCHEMA,
                "on.error": "fault",
            },
        )
        for name, df in (("av_good", good), ("av_bad", faults)):
            q = (
                df.writeStream.format("memory").queryName(name)
                .option("checkpointLocation", str(tmp_path / name))
                .trigger(availableNow=True).start()
            )
            q.awaitTermination(90)
        got = sorted(
            (r.event_id, r.kind, r.value)
            for r in spark.sql("SELECT * FROM av_good").collect()
        )
        assert got == [(0, "k0", 0.0), (1, "k1", 1.0), (2, "k2", 2.0)]
        bad = spark.sql("SELECT * FROM av_bad").collect()
        assert len(bad) == 1 and bad[0].error.startswith("avro mapper:")
    finally:
        broker.stop()


def test_enum_negative_index_rejected():
    # zigzag 0x01 = -1: Python negative indexing must NOT wrap silently
    esch = '{"type": "enum", "name": "E", "symbols": ["A", "B"]}'
    with pytest.raises(AvroError, match="out of range"):
        decode_datum(b"\x01", esch)


def test_avro_in_null_payload_yields_null_row(spark):
    # a Kafka tombstone must become an all-null row, not kill the query
    from engine_spark.sources.avro import avro_in

    df = spark.createDataFrame(
        [(encode_datum({"event_id": 1, "kind": "k", "value": None,
                        "tags": []}, EVENT_SCHEMA),), (None,)],
        "value binary",
    )
    rows = sorted(avro_in(df, EVENT_SCHEMA).collect(),
                  key=lambda r: (r.event_id is None, r.event_id))
    assert rows[0].event_id == 1
    assert rows[1].event_id is None and rows[1].kind is None


def test_canonical_form_dedupes_repeated_enum_reference():
    sch = json.dumps({
        "type": "record", "name": "R",
        "fields": [
            {"name": "a", "type": {"type": "enum", "name": "E",
                                    "symbols": ["X"]}},
            {"name": "b", "type": "E"},
        ],
    })
    cf = canonical_form(sch)
    assert cf.count('"type":"enum"') == 1       # defined once
    assert '"b","type":"E"' in cf.replace("{\"name\":", "\"")  # bare ref


def test_write_ocf_accepts_parsed_recursive_schema():
    sch = parse_schema(json.dumps({
        "type": "record", "name": "Node",
        "fields": [{"name": "v", "type": "int"},
                   {"name": "next", "type": ["null", "Node"]}],
    }))
    buf = io.BytesIO()
    rec = {"v": 1, "next": {"v": 2, "next": None}}
    write_ocf(buf, sch, [rec])
    schema_json, it = read_ocf(buf.getvalue())
    assert list(it) == [rec]
    assert json.loads(schema_json)["name"] == "Node"


def test_avro_log_mode_observation_counts_malformed(spark):
    """on.error='log' (the default) must surface the malformed count via
    the on_error_<name> observation, exactly like json/csv. observe()
    accepts an Observation object in place of the name, which lets the
    metric values be asserted directly."""
    from pyspark.sql import Observation

    from engine_spark.sources.avro import avro_in_split
    from engine_spark.sources.mappers import map_in_split

    ok = encode_datum(
        {"event_id": 1, "kind": "k", "value": None, "tags": []}, EVENT_SCHEMA
    )
    df = spark.createDataFrame([(ok,), (b"junk~~~",)], "value binary")
    obs = Observation("on_error_av")
    good, _ = avro_in_split(df, EVENT_SCHEMA, observe_name=obs)
    assert good.count() == 1
    assert obs.get == {"malformed": 1, "events": 2}
    # and the registry-facing dispatch forwards the hook
    good2, _ = map_in_split(
        "avro", df, schema=EVENT_SCHEMA, observe_name="on_error_av2"
    )
    assert good2.count() == 1


def test_avro_datum_roundtrip_property():
    """Hypothesis: any value conforming to a mixed schema roundtrips
    bit-exactly through the datum codec (the kafka record-batch codec
    property, one layer up)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    sch = json.dumps({
        "type": "record", "name": "P",
        "fields": [
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "opt", "type": ["null", "long"]},
            {"name": "arr", "type": {"type": "array", "items": "string"}},
            {"name": "m", "type": {"type": "map", "values": "int"}},
        ],
    })
    i32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
    i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
    finite = st.floats(allow_nan=False, allow_infinity=False)
    value = st.fixed_dictionaries({
        "i": i32,
        "l": i64,
        "d": finite,
        "s": st.text(max_size=40),
        "by": st.binary(max_size=40),
        "opt": st.none() | i64,
        "arr": st.lists(st.text(max_size=10), max_size=8),
        "m": st.dictionaries(st.text(max_size=8), i32, max_size=8),
    })

    @given(v=value)
    @settings(max_examples=120, deadline=None)
    def check(v):
        assert decode_datum(encode_datum(v, sch), sch) == v

    check()


def test_avro_stream_composes_with_kafka_sink_and_source(spark, tmp_path):
    """Full round: typed stream -> avro_out -> kafka sink (binary values)
    -> kafka source (binary deserializer) -> avro_in -> the same typed
    rows. This is the schema'd-payload pipeline a real estate runs."""
    from engine_spark.sources.avro import avro_in, avro_out
    from engine_spark.sources.kafka import KafkaBroker, KafkaClient
    from engine_spark.sources.registry import create_sink_writer, create_source

    sch = json.dumps({
        "type": "record", "name": "M",
        "fields": [{"name": "id", "type": "long"},
                   {"name": "score", "type": "double"}],
    })
    broker = KafkaBroker(auto_create_partitions=1)
    try:
        c = KafkaClient("127.0.0.1", broker.port)
        c.metadata(["pipe"])
        c.close()
        src = tmp_path / "in"
        src.mkdir()
        (src / "r.json").write_text(
            "\n".join(json.dumps({"id": i, "score": i * 0.5}) for i in range(4))
        )
        typed = spark.readStream.schema("id long, score double").json(str(src))
        q = (
            create_sink_writer(
                avro_out(typed, sch),
                {"extension": "kafka",
                 "kafka.bootstrap": f"127.0.0.1:{broker.port}",
                 "kafka.topic": "pipe",
                 "checkpoint": str(tmp_path / "ck1")},
            )
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(90)

        back = create_source(
            spark,
            {"extension": "kafka",
             "bootstrap": f"127.0.0.1:{broker.port}",
             "topic": "pipe",
             "value.deserializer": "binary"},
        )
        q2 = (
            avro_in(back, sch)
            .writeStream.format("memory").queryName("avro_pipe")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True).start()
        )
        q2.awaitTermination(90)
        got = sorted(
            (r.id, r.score)
            for r in spark.sql("SELECT * FROM avro_pipe").collect()
        )
        assert got == [(0, 0.0), (1, 0.5), (2, 1.0), (3, 1.5)]
    finally:
        broker.stop()


# ---------------------------------------------------------------------------
# schema resolution (reader != writer)
# ---------------------------------------------------------------------------

WRITER_V1 = json.dumps({
    "type": "record", "name": "Ev",
    "fields": [
        {"name": "id", "type": "int"},
        {"name": "score", "type": "float"},
        {"name": "debug", "type": "string"},
    ],
})
READER_V2 = json.dumps({
    "type": "record", "name": "Ev",
    "fields": [
        {"name": "id", "type": "long"},              # int -> long promotion
        {"name": "score", "type": "double"},         # float -> double
        {"name": "source", "type": "string", "default": "unknown"},
    ],  # 'debug' dropped; 'source' added with default
})


def test_schema_resolution_promotions_defaults_and_skips():
    blob = encode_datum({"id": 7, "score": 1.5, "debug": "x"}, WRITER_V1)
    got = decode_datum(blob, WRITER_V1, READER_V2)
    assert got == {"id": 7, "score": 1.5, "source": "unknown"}
    assert isinstance(got["id"], int) and isinstance(got["score"], float)


def test_schema_resolution_missing_default_raises():
    bad_reader = json.dumps({
        "type": "record", "name": "Ev",
        "fields": [{"name": "nope", "type": "string"}],  # no default
    })
    blob = encode_datum({"id": 1, "score": 0.0, "debug": ""}, WRITER_V1)
    with pytest.raises(AvroError, match="no default"):
        decode_datum(blob, WRITER_V1, bad_reader)


def test_schema_resolution_union_and_enum():
    w = json.dumps({
        "type": "record", "name": "R",
        "fields": [{"name": "v", "type": "int"},
                   {"name": "e", "type": {"type": "enum", "name": "C",
                                           "symbols": ["A", "B"]}}],
    })
    r = json.dumps({
        "type": "record", "name": "R",
        "fields": [{"name": "v", "type": ["null", "long"]},  # into a union
                   {"name": "e", "type": {"type": "enum", "name": "C",
                                           "symbols": ["A", "B", "NEW"]}}],
    })
    blob = encode_datum({"v": 5, "e": "B"}, w)
    assert decode_datum(blob, w, r) == {"v": 5, "e": "B"}
    # reader enum MISSING the writer's symbol refuses loudly
    r_narrow = json.dumps({
        "type": "record", "name": "R",
        "fields": [{"name": "v", "type": "int"},
                   {"name": "e", "type": {"type": "enum", "name": "C",
                                           "symbols": ["A"]}}],
    })
    with pytest.raises(AvroError, match="not in reader enum"):
        decode_datum(blob, w, r_narrow)


def test_ocf_read_with_reader_schema():
    buf = io.BytesIO()
    write_ocf(buf, WRITER_V1,
              [{"id": i, "score": float(i), "debug": "d"} for i in range(3)])
    _, it = read_ocf(buf.getvalue(), reader_schema=READER_V2)
    assert list(it) == [
        {"id": i, "score": float(i), "source": "unknown"} for i in range(3)
    ]


def test_avro_in_with_reader_schema(spark):
    from engine_spark.sources.avro import avro_in

    payloads = [
        (encode_datum({"id": i, "score": i * 1.0, "debug": "z"}, WRITER_V1),)
        for i in range(3)
    ]
    df = spark.createDataFrame(payloads, "value binary")
    out = avro_in(df, WRITER_V1, reader_schema=READER_V2)
    assert out.schema.simpleString() == (
        "struct<id:bigint,score:double,source:string>"
    )
    assert sorted((r.id, r.score, r.source) for r in out.collect()) == [
        (0, 0.0, "unknown"), (1, 1.0, "unknown"), (2, 2.0, "unknown")
    ]


def test_write_ocf_df_executor_sink_roundtrip(spark, tmp_path):
    from engine_spark.sources.avro import read_ocf_df, write_ocf_df

    df = spark.createDataFrame(
        [(i, f"t{i}", float(i)) for i in range(20)],
        "id long, txt string, x double",
    ).repartition(3)
    out = str(tmp_path / "ocf_out")
    write_ocf_df(df, out, codec="deflate")
    import glob

    files = glob.glob(out + "/*.avro")
    assert 1 <= len(files) <= 3 and not glob.glob(out + "/.*tmp")
    back = read_ocf_df(spark, out)
    assert sorted((r.id, r.txt, r.x) for r in back.collect()) == [
        (i, f"t{i}", float(i)) for i in range(20)
    ]
