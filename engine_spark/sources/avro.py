"""Apache Avro binary format, implemented from the PUBLIC specification
(avro.apache.org/docs/1.11.1/specification/) — no avro library and no
spark-avro JAR exist in this environment, so the wire format is built
from the spec the same way the Kafka RecordBatch / AMQP 0-9-1 / snappy /
LZ4 codecs in this package are (framing and bit layouts transcribed from
the public documents, verified by round-trips and hand-computed vectors).

Beyond-reference scope: the reference engine ships json/csv/bytes event
mappers only (json_mapper.rs, csv_mapper.rs, bytes_mapper.rs); Avro is
the dominant schema'd payload format on real Kafka estates, so a Spark
rebuild that ingests Kafka should speak it.

Covered, per spec section:
- zigzag varint ints/longs, IEEE-754 LE float/double, length-prefixed
  bytes/string ("Binary Encoding > Primitive Types");
- records, enums, fixed, arrays and maps (block encoding, including
  negative block counts carrying a byte size), unions ("Complex Types");
- named-type references and recursive schemas (a name registry resolves
  "LinkedList"-style self references);
- Object Container Files: Obj\\x01 magic, metadata map, 16-byte sync
  marker, per-block codecs null / deflate (raw RFC-1951 via zlib) /
  snappy (this package's from-spec snappy + big-endian CRC32 suffix);
- single-object encoding: C3 01 marker + little-endian CRC-64-AVRO
  fingerprint of the Parsing Canonical Form ("Schema Fingerprints");
- Spark integration: ``avro_in`` / ``avro_out`` event mappers
  (Arrow-batched mapInPandas — the payload parse is per-record by
  nature, exactly the regime the brief assigns to Pandas UDFs) and an
  OCF file reader that parallelizes over files via the binaryFile
  source.

Scope refusals (loud, never silent): general unions beyond the
``["null", T]`` nullable idiom have no faithful single-column Spark
type — ``avro_spark_type`` raises; unknown OCF codecs raise.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any, Iterator

__all__ = [
    "AvroError",
    "parse_schema",
    "encode_datum",
    "decode_datum",
    "canonical_form",
    "fingerprint64",
    "single_object_encode",
    "single_object_decode",
    "write_ocf",
    "read_ocf",
    "avro_spark_type",
    "avro_in",
    "avro_out",
    "read_ocf_df",
]

OCF_MAGIC = b"Obj\x01"
SINGLE_OBJECT_MAGIC = b"\xc3\x01"
PRIMITIVES = frozenset(
    ("null", "boolean", "int", "long", "float", "double", "bytes", "string")
)


class AvroError(ValueError):
    pass


# ---------------------------------------------------------------------------
# varint / zigzag ("Binary Encoding > Primitive Types")
# ---------------------------------------------------------------------------

def _write_long(out: bytearray, n: int) -> None:
    """zigzag + base-128 varint (low 7 bits first, MSB = continuation)."""
    z = (n << 1) ^ (n >> 63) if n < 0 else (n << 1)
    z &= (1 << 64) - 1
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    z = shift = 0
    while True:
        if pos >= len(buf):
            raise AvroError("truncated varint")
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise AvroError("varint too long")
    n = (z >> 1) ^ -(z & 1)
    return n, pos


# ---------------------------------------------------------------------------
# schema parsing ("Schema Declaration")
# ---------------------------------------------------------------------------

def _fullname(name: str, namespace: str | None) -> str:
    if "." in name or not namespace:
        return name
    return f"{namespace}.{name}"


def parse_schema(schema: str | dict | list) -> Any:
    """Parse and validate a schema, returning the JSON structure with a
    ``_names`` registry attached to every named-type reference resolved.
    The returned object is the raw JSON shape (str for primitives, dict
    for named/complex types, list for unions) — the codec walks it
    directly; named references are replaced by their definition's dict,
    so recursive schemas form reference cycles (handled by identity)."""
    root = json.loads(schema) if isinstance(schema, str) else schema
    names: dict[str, dict] = {}

    def walk(s: Any, namespace: str | None) -> Any:
        if isinstance(s, str):
            if s in PRIMITIVES:
                return s
            full = _fullname(s, namespace)
            if full in names:
                return names[full]
            if s in names:  # bare reference to an absolute name
                return names[s]
            raise AvroError(f"unknown type reference {s!r}")
        if isinstance(s, list):
            return [walk(b, namespace) for b in s]
        if not isinstance(s, dict):
            raise AvroError(f"invalid schema node {s!r}")
        t = s.get("type")
        if t in ("record", "error", "enum", "fixed"):
            ns = s.get("namespace", namespace)
            full = _fullname(s["name"], ns)
            s = dict(s)
            s["_fullname"] = full
            names[full] = s  # register BEFORE fields: recursion
            if t in ("record", "error"):
                s["fields"] = [dict(f) for f in s["fields"]]
                for f in s["fields"]:
                    f["type"] = walk(f["type"], ns)
            elif t == "enum":
                if not isinstance(s.get("symbols"), list):
                    raise AvroError("enum needs symbols")
            elif t == "fixed":
                s["size"] = int(s["size"])
            return s
        if t == "array":
            s = dict(s)
            s["items"] = walk(s["items"], namespace)
            return s
        if t == "map":
            s = dict(s)
            s["values"] = walk(s["values"], namespace)
            return s
        if isinstance(t, (str, dict, list)) and len(s) == 1:
            # {"type": "string"} wrapper form
            return walk(t, namespace)
        if t in PRIMITIVES:
            return t  # wrapper with extra attrs (logicalType etc.): underlying
        raise AvroError(f"unsupported schema {s!r}")

    return walk(root, None)


def _type_of(s: Any) -> str:
    if isinstance(s, str):
        return s
    if isinstance(s, list):
        return "union"
    return s["type"] if s["type"] != "error" else "record"


# ---------------------------------------------------------------------------
# datum codec
# ---------------------------------------------------------------------------

def _encode(out: bytearray, s: Any, v: Any) -> None:
    t = _type_of(s)
    if t == "null":
        if v is not None:
            raise AvroError(f"null schema got {v!r}")
    elif t == "boolean":
        out.append(1 if v else 0)
    elif t in ("int", "long"):
        _write_long(out, int(v))
    elif t == "float":
        out += struct.pack("<f", float(v))
    elif t == "double":
        out += struct.pack("<d", float(v))
    elif t == "bytes":
        b = bytes(v)
        _write_long(out, len(b))
        out += b
    elif t == "string":
        b = str(v).encode("utf-8")
        _write_long(out, len(b))
        out += b
    elif t == "record":
        for f in s["fields"]:
            try:
                fv = v[f["name"]]
            except (KeyError, TypeError):
                fv = getattr(v, f["name"])
            _encode(out, f["type"], fv)
    elif t == "enum":
        try:
            idx = s["symbols"].index(v)
        except ValueError:
            raise AvroError(f"{v!r} not in enum {s.get('_fullname')}")
        _write_long(out, idx)
    elif t == "fixed":
        b = bytes(v)
        if len(b) != s["size"]:
            raise AvroError(f"fixed size {s['size']} got {len(b)}")
        out += b
    elif t == "array":
        items = list(v)
        if items:
            _write_long(out, len(items))
            for it in items:
                _encode(out, s["items"], it)
        _write_long(out, 0)
    elif t == "map":
        pairs = list(v.items())
        if pairs:
            _write_long(out, len(pairs))
            for k, mv in pairs:
                _encode(out, "string", k)
                _encode(out, s["values"], mv)
        _write_long(out, 0)
    elif t == "union":
        for i, branch in enumerate(s):
            if _matches(branch, v):
                _write_long(out, i)
                _encode(out, branch, v)
                return
        raise AvroError(f"no union branch for {v!r}")
    else:
        raise AvroError(f"cannot encode type {t!r}")


def _matches(s: Any, v: Any) -> bool:
    t = _type_of(s)
    if t == "null":
        return v is None
    if v is None:
        return False
    if t == "boolean":
        return isinstance(v, bool)
    if t in ("int", "long"):
        return isinstance(v, int) and not isinstance(v, bool)
    if t in ("float", "double"):
        return isinstance(v, float)
    if t in ("bytes", "fixed"):
        return isinstance(v, (bytes, bytearray))
    if t in ("string", "enum"):
        return isinstance(v, str)
    if t == "array":
        return isinstance(v, (list, tuple))
    if t in ("map", "record"):
        return isinstance(v, dict) or hasattr(v, "__getattr__")
    return False


def _decode(buf: bytes, pos: int, s: Any) -> tuple[Any, int]:
    t = _type_of(s)
    if t == "null":
        return None, pos
    if t == "boolean":
        if pos >= len(buf):
            raise AvroError("truncated boolean")
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        return _read_long(buf, pos)
    if t == "float":
        if pos + 4 > len(buf):
            raise AvroError("truncated float")
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        if pos + 8 > len(buf):
            raise AvroError("truncated double")
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t in ("bytes", "string"):
        n, pos = _read_long(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise AvroError(f"truncated {t}")
        raw = bytes(buf[pos : pos + n])
        return (raw.decode("utf-8") if t == "string" else raw), pos + n
    if t == "record":
        rec = {}
        for f in s["fields"]:
            rec[f["name"]], pos = _decode(buf, pos, f["type"])
        return rec, pos
    if t == "enum":
        idx, pos = _read_long(buf, pos)
        if not 0 <= idx < len(s["symbols"]):
            raise AvroError(f"enum index {idx} out of range")
        return s["symbols"][idx], pos
    if t == "fixed":
        n = s["size"]
        if pos + n > len(buf):
            raise AvroError("truncated fixed")
        return bytes(buf[pos : pos + n]), pos + n
    if t == "array" or t == "map":
        items: Any = [] if t == "array" else {}
        while True:
            count, pos = _read_long(buf, pos)
            if count == 0:
                return items, pos
            if count < 0:  # block byte-size follows (skippable form)
                count = -count
                _, pos = _read_long(buf, pos)
            for _ in range(count):
                if t == "array":
                    it, pos = _decode(buf, pos, s["items"])
                    items.append(it)
                else:
                    k, pos = _decode(buf, pos, "string")
                    items[k], pos = _decode(buf, pos, s["values"])
    if t == "union":
        idx, pos = _read_long(buf, pos)
        if not 0 <= idx < len(s):
            raise AvroError(f"union index {idx} out of range")
        return _decode(buf, pos, s[idx])
    raise AvroError(f"cannot decode type {t!r}")


def encode_datum(value: Any, schema: Any) -> bytes:
    out = bytearray()
    _encode(out, parse_schema(schema) if not _is_parsed(schema) else schema, value)
    return bytes(out)


def decode_datum(data: bytes, schema: Any, reader_schema: Any = None) -> Any:
    """Decode against the WRITER schema; with ``reader_schema`` given,
    apply the spec's Schema Resolution on the fly (promotions, skipped
    writer-only fields, reader defaults) and return reader-shaped data."""
    s = parse_schema(schema) if not _is_parsed(schema) else schema
    if reader_schema is None:
        v, pos = _decode(data, 0, s)
    else:
        r = (
            parse_schema(reader_schema)
            if not _is_parsed(reader_schema)
            else reader_schema
        )
        v, pos = _decode_resolved(data, 0, s, r)
    if pos != len(data):
        raise AvroError(f"{len(data) - pos} trailing bytes after datum")
    return v


# ---------------------------------------------------------------------------
# schema resolution ("Schema Resolution" / "Data Serialization" rules)
# ---------------------------------------------------------------------------

#: legal primitive promotions writer -> readers (spec: "the writer's
#: schema may be promoted to the reader's")
_PROMOTIONS = {
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
}


def _resolvable(w: Any, r: Any) -> bool:
    """Cheap structural test used for union-branch selection."""
    wt, rt = _type_of(w), _type_of(r)
    if wt == "union" or rt == "union":
        return True  # resolved per-branch at decode time
    if wt in _PROMOTIONS:
        return rt in _PROMOTIONS[wt]
    if wt != rt:
        return False
    if wt in ("record", "enum", "fixed"):
        # unqualified name match per spec (aliases unsupported — refusal)
        return w["_fullname"].split(".")[-1] == r["_fullname"].split(".")[-1]
    return True


def _promote(v: Any, wt: str, rt: str) -> Any:
    if wt == rt:
        return v
    if rt in ("long",):
        return int(v)
    if rt in ("float", "double"):
        return float(v)
    if wt == "string" and rt == "bytes":
        return v.encode("utf-8")
    if wt == "bytes" and rt == "string":
        return v.decode("utf-8")
    return v


def _default_value(r: Any, default: Any) -> Any:
    """Reader-field JSON default → runtime value (bytes/fixed defaults are
    ISO-8859-1 strings per spec; union defaults apply to the first
    branch)."""
    t = _type_of(r)
    if t == "union":
        return _default_value(r[0], default)
    if t in ("bytes", "fixed"):
        return default.encode("latin-1")
    if t == "record":
        return {
            f["name"]: _default_value(f["type"], f.get("default"))
            for f in r["fields"]
        }
    if t == "array":
        return [_default_value(r["items"], d) for d in default]
    if t == "map":
        return {k: _default_value(r["values"], d) for k, d in default.items()}
    return default


def _skip(buf: bytes, pos: int, s: Any) -> int:
    """Advance past a datum of writer-only shape without materializing."""
    _, pos = _decode(buf, pos, s)
    return pos


def _decode_resolved(buf: bytes, pos: int, w: Any, r: Any) -> tuple[Any, int]:
    wt, rt = _type_of(w), _type_of(r)
    if wt == "union":
        idx, pos = _read_long(buf, pos)
        if not 0 <= idx < len(w):
            raise AvroError(f"union index {idx} out of range")
        return _decode_resolved(buf, pos, w[idx], r)
    if rt == "union":
        for branch in r:
            if _resolvable(w, branch):
                return _decode_resolved(buf, pos, w, branch)
        raise AvroError(
            f"writer type {wt!r} matches no reader union branch"
        )
    if not _resolvable(w, r):
        raise AvroError(f"cannot resolve writer {wt!r} against reader {rt!r}")
    if wt in _PROMOTIONS:
        v, pos = _decode(buf, pos, w)
        return _promote(v, wt, rt), pos
    if wt in ("null", "boolean"):
        return _decode(buf, pos, w)
    if wt == "record":
        rfields = {f["name"]: f for f in r["fields"]}
        rec: dict[str, Any] = {}
        seen: set[str] = set()
        for f in w["fields"]:
            name = f["name"]
            if name in rfields:
                rec[name], pos = _decode_resolved(
                    buf, pos, f["type"], rfields[name]["type"]
                )
                seen.add(name)
            else:
                pos = _skip(buf, pos, f["type"])  # writer-only field
        for f in r["fields"]:
            if f["name"] in seen:
                continue
            if "default" not in f:
                raise AvroError(
                    f"reader field {f['name']!r} absent from writer data "
                    "and has no default"
                )
            rec[f["name"]] = _default_value(f["type"], f["default"])
        return rec, pos
    if wt == "enum":
        idx, pos = _read_long(buf, pos)
        if not 0 <= idx < len(w["symbols"]):
            raise AvroError(f"enum index {idx} out of range")
        sym = w["symbols"][idx]
        if sym not in r["symbols"]:
            raise AvroError(f"writer symbol {sym!r} not in reader enum")
        return sym, pos
    if wt == "fixed":
        if w["size"] != r["size"]:
            raise AvroError("fixed size mismatch between writer and reader")
        return _decode(buf, pos, w)
    if wt == "array":
        items: list = []
        while True:
            count, pos = _read_long(buf, pos)
            if count == 0:
                return items, pos
            if count < 0:
                count = -count
                _, pos = _read_long(buf, pos)
            for _ in range(count):
                it, pos = _decode_resolved(buf, pos, w["items"], r["items"])
                items.append(it)
    if wt == "map":
        out: dict = {}
        while True:
            count, pos = _read_long(buf, pos)
            if count == 0:
                return out, pos
            if count < 0:
                count = -count
                _, pos = _read_long(buf, pos)
            for _ in range(count):
                k, pos = _decode(buf, pos, "string")
                out[k], pos = _decode_resolved(
                    buf, pos, w["values"], r["values"]
                )
    raise AvroError(f"cannot resolve type {wt!r}")


def _is_parsed(schema: Any) -> bool:
    """Parsed named types carry _fullname; primitives/unions are idempotent
    to re-parse, EXCEPT bare name references which need the registry."""
    if isinstance(schema, dict):
        return "_fullname" in schema or _type_of(schema) in ("array", "map")
    return False


# ---------------------------------------------------------------------------
# Parsing Canonical Form + CRC-64-AVRO ("Schema Fingerprints")
# ---------------------------------------------------------------------------

def canonical_form(schema: Any) -> str:
    """Parsing Canonical Form: fullnames, attribute whitelist, fixed field
    order (name, type, fields, symbols, items, values, size), no
    whitespace, primitives as bare strings."""
    s = parse_schema(schema) if not _is_parsed(schema) else schema
    emitted: set[str] = set()

    def render(node: Any) -> str:
        if isinstance(node, str):
            return json.dumps(node)
        if isinstance(node, list):
            return "[" + ",".join(render(b) for b in node) + "]"
        t = _type_of(node)
        if t in ("record", "enum", "fixed"):
            # EVERY named type renders its definition once; later
            # references (recursive or repeated) are the bare fullname —
            # inlining a duplicate definition is invalid Avro and would
            # diverge the fingerprint from compliant implementations
            full = node["_fullname"]
            if full in emitted:
                return json.dumps(full)
            emitted.add(full)
        if t == "record":
            fields = ",".join(
                '{"name":%s,"type":%s}' % (json.dumps(f["name"]), render(f["type"]))
                for f in node["fields"]
            )
            return '{"name":%s,"type":"record","fields":[%s]}' % (
                json.dumps(full),
                fields,
            )
        if t == "enum":
            return '{"name":%s,"type":"enum","symbols":%s}' % (
                json.dumps(full),
                json.dumps(node["symbols"], separators=(",", ":")),
            )
        if t == "fixed":
            return '{"name":%s,"type":"fixed","size":%d}' % (
                json.dumps(full),
                node["size"],
            )
        if t == "array":
            return '{"type":"array","items":%s}' % render(node["items"])
        if t == "map":
            return '{"type":"map","values":%s}' % render(node["values"])
        raise AvroError(f"cannot canonicalize {t!r}")

    return render(s)


_FP_EMPTY = 0xC15D213AA4D7A795
_FP_TABLE: list[int] | None = None


def fingerprint64(data: bytes) -> int:
    """CRC-64-AVRO per the spec's reference pseudocode (right-shift CRC
    over the 0xC15D213AA4D7A795 polynomial, init = the polynomial)."""
    global _FP_TABLE
    if _FP_TABLE is None:
        table = []
        for i in range(256):
            fp = i
            for _ in range(8):
                fp = (fp >> 1) ^ (_FP_EMPTY & -(fp & 1))
            table.append(fp)
        _FP_TABLE = table
    fp = _FP_EMPTY
    for b in data:
        fp = (fp >> 8) ^ _FP_TABLE[(fp ^ b) & 0xFF]
    return fp


def schema_fingerprint(schema: Any) -> int:
    return fingerprint64(canonical_form(schema).encode("utf-8"))


def single_object_encode(value: Any, schema: Any) -> bytes:
    s = parse_schema(schema) if not _is_parsed(schema) else schema
    return (
        SINGLE_OBJECT_MAGIC
        + struct.pack("<Q", schema_fingerprint(s))
        + encode_datum(value, s)
    )


def single_object_decode(data: bytes, schema: Any) -> Any:
    s = parse_schema(schema) if not _is_parsed(schema) else schema
    if data[:2] != SINGLE_OBJECT_MAGIC:
        raise AvroError("missing C3 01 single-object marker")
    (fp,) = struct.unpack_from("<Q", data, 2)
    want = schema_fingerprint(s)
    if fp != want:
        raise AvroError(
            f"schema fingerprint mismatch: payload {fp:#x}, reader {want:#x}"
        )
    return decode_datum(data[10:], s)


# ---------------------------------------------------------------------------
# Object Container Files ("Object Container Files")
# ---------------------------------------------------------------------------

_META_SCHEMA = parse_schema({"type": "map", "values": "bytes"})
#: deterministic default sync marker (tests & exactly-once replays produce
#: byte-identical files); callers pass their own 16 bytes for production.
_DEFAULT_SYNC = bytes(range(16))


def _compress_block(codec: str, data: bytes) -> bytes:
    if codec == "null":
        return data
    if codec == "deflate":  # raw RFC-1951 (no zlib header) per spec
        c = zlib.compressobj(wbits=-15)
        return c.compress(data) + c.flush()
    if codec == "snappy":  # snappy block + 4-byte big-endian CRC32 of plain
        from engine_spark.sources.snappy import snappy_compress

        return snappy_compress(data) + struct.pack(">I", zlib.crc32(data))
    raise AvroError(f"unsupported OCF codec {codec!r}")


def _decompress_block(codec: str, data: bytes) -> bytes:
    if codec == "null":
        return data
    if codec == "deflate":
        return zlib.decompress(data, wbits=-15)
    if codec == "snappy":
        from engine_spark.sources.snappy import snappy_decompress

        plain = snappy_decompress(data[:-4])
        (crc,) = struct.unpack(">I", data[-4:])
        if zlib.crc32(plain) != crc:
            raise AvroError("snappy block CRC mismatch")
        return plain
    raise AvroError(f"unsupported OCF codec {codec!r}")


def write_ocf(
    fobj,
    schema: Any,
    records,
    codec: str = "null",
    sync: bytes | None = None,
    block_records: int = 1000,
) -> None:
    s = parse_schema(schema) if not _is_parsed(schema) else schema
    sync = _DEFAULT_SYNC if sync is None else sync
    if len(sync) != 16:
        raise AvroError("sync marker must be 16 bytes")
    if isinstance(schema, str):
        schema_json = schema
    elif _is_parsed(schema):
        # parsed schemas may contain reference cycles json.dumps cannot
        # serialize (and _fullname bookkeeping it must not leak) — the
        # Parsing Canonical Form is a valid, cycle-free Avro rendering
        schema_json = canonical_form(schema)
    else:
        schema_json = json.dumps(schema)
    header = bytearray(OCF_MAGIC)
    _encode(
        header,
        _META_SCHEMA,
        {
            "avro.schema": schema_json.encode("utf-8"),
            "avro.codec": codec.encode("utf-8"),
        },
    )
    header += sync
    fobj.write(bytes(header))
    batch: list[Any] = []

    def flush() -> None:
        if not batch:
            return
        body = bytearray()
        for r in batch:
            _encode(body, s, r)
        block = _compress_block(codec, bytes(body))
        head = bytearray()
        _write_long(head, len(batch))
        _write_long(head, len(block))
        fobj.write(bytes(head) + block + sync)
        batch.clear()

    for r in records:
        batch.append(r)
        if len(batch) >= block_records:
            flush()
    flush()


def read_ocf(
    data: bytes, reader_schema: Any = None
) -> tuple[str, Iterator[Any]]:
    """(writer schema json string, record iterator) from OCF bytes; with
    ``reader_schema``, records are schema-resolved to the reader shape."""
    if data[:4] != OCF_MAGIC:
        raise AvroError("not an Avro object container file")
    meta, pos = _decode(data, 4, _META_SCHEMA)
    schema_json = meta["avro.schema"].decode("utf-8")
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    s = parse_schema(schema_json)
    sync = data[pos : pos + 16]
    if len(sync) != 16:
        raise AvroError("truncated OCF header sync marker")
    pos += 16

    def records() -> Iterator[Any]:
        p = pos
        while p < len(data):
            count, p = _read_long(data, p)
            size, p = _read_long(data, p)
            if p + size + 16 > len(data):
                raise AvroError("truncated OCF block")
            body = _decompress_block(codec, data[p : p + size])
            p += size
            if data[p : p + 16] != sync:
                raise AvroError("OCF sync marker mismatch (corrupt block)")
            p += 16
            bp = 0
            for _ in range(count):
                if rs is None:
                    v, bp = _decode(body, bp, s)
                else:
                    v, bp = _decode_resolved(body, bp, s, rs)
                yield v

    rs = (
        None
        if reader_schema is None
        else (
            parse_schema(reader_schema)
            if not _is_parsed(reader_schema)
            else reader_schema
        )
    )
    return schema_json, records()


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

def avro_spark_type(schema: Any) -> str:
    """Avro schema → Spark DDL type string. ["null", T] unions map to
    (nullable) T; any other union has no faithful single-column Spark
    type and raises."""
    s = parse_schema(schema) if not _is_parsed(schema) else schema

    def ddl(node: Any) -> str:
        t = _type_of(node)
        if t == "union":
            branches = [b for b in node if _type_of(b) != "null"]
            if len(branches) != 1:
                raise AvroError(
                    "only [null, T] unions map to a Spark column type; got "
                    f"{len(branches)} non-null branches"
                )
            return ddl(branches[0])
        if t == "record":
            inner = ",".join(f"`{f['name']}`:{ddl(f['type'])}" for f in node["fields"])
            return f"struct<{inner}>"
        if t == "array":
            return f"array<{ddl(node['items'])}>"
        if t == "map":
            return f"map<string,{ddl(node['values'])}>"
        return {
            "boolean": "boolean",
            "int": "int",
            "long": "bigint",
            "float": "float",
            "double": "double",
            "bytes": "binary",
            "fixed": "binary",
            "string": "string",
            "enum": "string",
            "null": "void",
        }[t]

    if _type_of(s) != "record":
        raise AvroError("top-level mapper schema must be a record")
    return ",".join(f"`{f['name']}` {ddl(f['type'])}" for f in s["fields"])


def _to_avro_value(s: Any, v: Any) -> Any:
    """pandas/Arrow cell → avro-codec value (numpy scalars → python,
    NaN → None for nullable branches, Rows → dicts)."""
    import numpy as np

    if v is None or (isinstance(v, float) and v != v):
        return None
    t = _type_of(s)
    if t == "union":
        branches = [b for b in s if _type_of(b) != "null"]
        return _to_avro_value(branches[0], v) if branches else None
    if t == "record":
        if hasattr(v, "asDict"):
            v = v.asDict()
        return {
            f["name"]: _to_avro_value(f["type"], v.get(f["name"]))
            for f in s["fields"]
        }
    if t == "array":
        return [_to_avro_value(s["items"], x) for x in v]
    if t == "map":
        return {k: _to_avro_value(s["values"], x) for k, x in dict(v).items()}
    if isinstance(v, np.generic):
        return v.item()
    if t in ("bytes", "fixed") and isinstance(v, bytearray):
        return bytes(v)
    return v


def avro_in(df, schema: str, value_col: str = "value",
            reader_schema: str | None = None):
    """payload binary → typed columns (source direction). Arrow-batched:
    each pandas batch decodes its payloads in one python worker pass.
    ``reader_schema`` turns on spec Schema Resolution: payloads written
    with ``schema`` are reshaped to the reader's columns (promotions,
    dropped writer fields, defaulted reader fields) — the consumer keeps
    its schema while producers evolve."""
    out_s = parse_schema(reader_schema if reader_schema else schema)
    out_ddl = avro_spark_type(out_s)
    names = [f["name"] for f in out_s["fields"]]
    schema_json = schema if isinstance(schema, str) else json.dumps(schema)

    def parse(batches):
        import pandas as pd

        ps = parse_schema(schema_json)
        rs = parse_schema(reader_schema) if reader_schema else None
        for pdf in batches:
            # a null payload (e.g. a Kafka tombstone) yields an all-null
            # row, matching from_json's null-struct behavior — it must
            # not kill the query (use avro_in_split to route them)
            vals = [
                decode_datum(bytes(b), ps, rs) if b is not None else None
                for b in pdf[value_col]
            ]
            yield pd.DataFrame(
                {
                    n: [None if r is None else r[n] for r in vals]
                    for n in names
                }
                if vals
                else {n: [] for n in names}
            )

    return df.mapInPandas(parse, schema=out_ddl)


def avro_in_split(
    df, schema: str, value_col: str = "value", observe_name: str | None = None
):
    """Mapper with fault routing (the junction's on.error contract): one
    Arrow-batched decode pass emitting the record fields plus ``_raw``
    (the original payload) and ``_corrupt`` (NULL on success, the decode
    error otherwise); good/fault are two filters over it — the same
    split shape the json/csv mappers get from PERMISSIVE mode.
    ``observe_name`` attaches the (malformed, events) observation metric
    before the split, so on.error='log' counts what it drops."""
    s = parse_schema(schema)
    names = [f["name"] for f in s["fields"]]
    out_ddl = avro_spark_type(s) + ",`_raw` binary,`_corrupt` string"
    schema_json = schema if isinstance(schema, str) else json.dumps(schema)

    def parse(batches):
        import pandas as pd

        ps = parse_schema(schema_json)
        for pdf in batches:
            cols: dict[str, list] = {n: [] for n in names}
            raws, errs = [], []
            for b in pdf[value_col]:
                raw = bytes(b) if b is not None else None
                raws.append(raw)
                try:
                    if raw is None:
                        raise AvroError("null payload")
                    rec = decode_datum(raw, ps)
                    for n in names:
                        cols[n].append(rec[n])
                    errs.append(None)
                except Exception as ex:  # noqa: BLE001 — routed, not dropped
                    for n in names:
                        cols[n].append(None)
                    errs.append(f"avro mapper: {ex}")
            cols["_raw"] = raws
            cols["_corrupt"] = errs
            yield pd.DataFrame(cols)

    parsed = df.mapInPandas(parse, schema=out_ddl)
    from pyspark.sql import functions as F

    if observe_name:
        parsed = parsed.observe(
            observe_name,
            F.count_if(F.col("_corrupt").isNotNull()).alias("malformed"),
            F.count(F.lit(1)).alias("events"),
        )
    good = parsed.filter(F.col("_corrupt").isNull()).drop("_raw", "_corrupt")
    faults = parsed.filter(F.col("_corrupt").isNotNull()).select(
        F.hex("_raw").alias("payload"), F.col("_corrupt").alias("error")
    )
    return good, faults


def avro_out(df, schema: str | None = None, value_col: str = "value"):
    """typed columns → one Avro binary payload per row (sink direction).
    With no schema given, one is derived from the DataFrame schema
    (int→"int" only for IntegerType; long/bigint→"long"; nullable
    columns become ["null", T] unions)."""
    schema_json = schema if schema is not None else _spark_to_avro_json(df.schema)
    s = parse_schema(schema_json)
    names = [f["name"] for f in s["fields"]]

    def render(batches):
        import pandas as pd

        ps = parse_schema(schema_json)
        for pdf in batches:
            payloads = []
            for row in pdf[names].to_dict("records"):
                payloads.append(
                    encode_datum(_to_avro_value(ps, row), ps)
                )
            yield pd.DataFrame({value_col: payloads})

    return df.mapInPandas(render, schema=f"{value_col} binary")


def _spark_to_avro_json(st) -> str:
    """StructType → Avro record schema JSON (sink-side derivation)."""
    from pyspark.sql import types as T

    def conv(dt, nullable: bool):
        if isinstance(dt, T.StructType):
            a: Any = {
                "type": "record",
                "name": f"r{abs(hash(dt.simpleString())) % 10**8}",
                "fields": [
                    {"name": f.name, "type": conv(f.dataType, f.nullable)}
                    for f in dt.fields
                ],
            }
        elif isinstance(dt, T.ArrayType):
            a = {"type": "array", "items": conv(dt.elementType, dt.containsNull)}
        elif isinstance(dt, T.MapType):
            a = {"type": "map", "values": conv(dt.valueType, dt.valueContainsNull)}
        else:
            prim = {
                T.BooleanType: "boolean",
                T.IntegerType: "int",
                T.ShortType: "int",
                T.ByteType: "int",
                T.LongType: "long",
                T.FloatType: "float",
                T.DoubleType: "double",
                T.StringType: "string",
                T.BinaryType: "bytes",
            }.get(type(dt))
            if prim is None:
                raise AvroError(f"no Avro mapping for Spark type {dt}")
            a = prim
        return ["null", a] if nullable else a

    fields = [
        {"name": f.name, "type": conv(f.dataType, f.nullable)} for f in st.fields
    ]
    return json.dumps({"type": "record", "name": "row", "fields": fields})


def write_ocf_df(df, path: str, schema: str | None = None,
                 codec: str = "null", block_records: int = 1000) -> str:
    """Write a DataFrame as Avro Object Container Files, one ``.avro``
    file per partition, written FROM THE EXECUTORS (no driver collect —
    the normal distributed sink shape; pair with ``repartition(n)`` to
    control file count). Returns the schema JSON used. Files publish via
    write-to-hidden-tmp + atomic rename, so readers globbing ``*.avro``
    never see a partial file."""
    import os as _os

    schema_json = schema if schema is not None else _spark_to_avro_json(df.schema)
    parse_schema(schema_json)  # validate driver-side before launching
    _os.makedirs(path, exist_ok=True)

    def write_part(rows) -> None:
        import os as _o

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        recs = [r.asDict(recursive=True) for r in rows]
        if not recs:
            return
        tmp = _o.path.join(path, f".part-{pid:05d}.avro.tmp")
        with open(tmp, "wb") as fh:
            write_ocf(fh, schema_json, recs, codec=codec,
                      block_records=block_records)
        _o.replace(tmp, _o.path.join(path, f"part-{pid:05d}.avro"))

    df.foreachPartition(write_part)
    return schema_json


def read_ocf_df(spark, path: str):
    """Read Avro Object Container Files into a DataFrame: the binaryFile
    source lists/reads files (parallelism = files, exactly the OCF unit
    of parallel work since blocks are sync-delimited per file), and an
    Arrow-batched pass decodes. The schema is read from the FIRST file
    pre-flight (driver-side, header-only) — all files must share it."""
    import glob as _glob
    import os as _os

    first = sorted(
        _glob.glob(_os.path.join(path, "*.avro"))
        or _glob.glob(path)
    )
    if not first:
        raise AvroError(f"no .avro files under {path!r}")
    with open(first[0], "rb") as fh:
        head = fh.read(1 << 20)
    schema_json, _ = read_ocf(head)  # header parse only
    s = parse_schema(schema_json)
    out_ddl = avro_spark_type(s)
    names = [f["name"] for f in s["fields"]]

    files = spark.read.format("binaryFile").load(
        _os.path.join(path, "*.avro") if not path.endswith(".avro") else path
    )

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows: list[dict] = []
            for blob in pdf["content"]:
                fschema, recs = read_ocf(bytes(blob))
                if fschema != schema_json:
                    raise AvroError("OCF schema drift across files")
                rows.extend(recs)
            yield pd.DataFrame(
                {n: [r[n] for r in rows] for n in names}
                if rows
                else {n: [] for n in names}
            )

    return files.select("content").mapInPandas(parse, schema=out_ddl)
