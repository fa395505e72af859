"""Snappy block-format codec, pure stdlib, plus the xerial stream framing
Kafka wraps it in.

The container ships no snappy library, and the format is public (the
format description published with google/snappy: a little-endian varint
uncompressed-length preamble followed by tagged elements — literals and
back-references with 1/2/4-byte offsets), so both directions are
implemented from the spec:

- ``snappy_decompress`` handles every element type the format defines
  (tag low bits 00 literal / 01 copy-1 / 10 copy-2 / 11 copy-4),
  including overlapping copies (run-length-style references into bytes
  the same copy is producing) and long literals with 1-4 length bytes.
- ``snappy_compress`` is the standard greedy hash-table matcher over
  4-byte sequences (the same strategy the reference implementation's
  fast path uses): emit pending bytes as a literal when a match of >= 4
  bytes is found, encode the match as copy-1 (offset < 2048, len 4-11)
  or copy-2 elements of <= 64 bytes. Output is always valid snappy; the
  matcher quality only affects the ratio.

Kafka's snappy-compressed RecordBatches use the XERIAL stream framing
(the snappy-java container: the 8-byte magic ``\\x82SNAPPY\\x00``, two
big-endian int32 version fields, then length-prefixed compressed
chunks of <= 32 KiB uncompressed each). ``xerial_frame`` /
``xerial_unframe`` implement it; the record-batch decoder accepts both
framed and raw-block payloads (older clients emit raw blocks).
"""

from __future__ import annotations

import struct

XERIAL_MAGIC = b"\x82SNAPPY\x00"
XERIAL_BLOCK = 32 * 1024

_MAX_COPY_LEN = 64
_MIN_MATCH = 4


def _uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("snappy: truncated length preamble")
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: length varint too long")


def _emit_literal(out: bytearray, lit: bytes) -> None:
    n = len(lit)
    i = 0
    while i < n:
        # one literal element can carry up to 2^32 bytes; cap chunks at
        # 65536 so the length always fits the 2-extra-byte form
        chunk = lit[i : i + 65536]
        ln = len(chunk) - 1
        if ln < 60:
            out.append(ln << 2)
        elif ln < 256:
            out.append(60 << 2)
            out.append(ln)
        else:
            out.append(61 << 2)
            out += struct.pack("<H", ln)
        out += chunk
        i += 65536


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    # split long matches into <= 64-byte copy elements (the format's max)
    while length > 0:
        ln = min(length, _MAX_COPY_LEN)
        if length - ln in (1, 2, 3) and ln == _MAX_COPY_LEN:
            ln = length - 4  # never leave a sub-minimum tail
        if 4 <= ln <= 11 and offset < 2048:
            out.append(0x01 | ((ln - 4) << 2) | ((offset >> 8) << 5))
            out.append(offset & 0xFF)
        else:
            out.append(0x02 | ((ln - 1) << 2))
            out += struct.pack("<H", offset)
        length -= ln


def snappy_compress(data: bytes) -> bytes:
    """Raw snappy block: varint length + greedy-matched elements."""
    n = len(data)
    out = bytearray(_uvarint(n))
    if n == 0:
        return bytes(out)
    if n < _MIN_MATCH:
        _emit_literal(out, data)
        return bytes(out)
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    limit = n - _MIN_MATCH + 1
    while i < limit:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF:
            # extend the match forward
            m = _MIN_MATCH
            maxm = n - i
            while m < maxm and data[cand + m] == data[i + m]:
                m += 1
            if lit_start < i:
                _emit_literal(out, data[lit_start:i])
            _emit_copy(out, i - cand, m)
            i += m
            lit_start = i
        else:
            i += 1
    if lit_start < n:
        _emit_literal(out, data[lit_start:])
    return bytes(out)


def snappy_decompress(data: bytes) -> bytes:
    """Decode a raw snappy block; raises ValueError on any malformation
    (truncation, bad offsets, length mismatch)."""
    want, pos = _read_uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59  # 1..4 length bytes
                if pos + extra > n:
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(data[pos : pos + extra], "little")
                pos += extra
            ln += 1
            if pos + ln > n:
                raise ValueError("snappy: truncated literal")
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 0x07) + 4
            if pos >= n:
                raise ValueError("snappy: truncated copy-1")
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy-2")
            offset = struct.unpack_from("<H", data, pos)[0]
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy-4")
            offset = struct.unpack_from("<I", data, pos)[0]
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: copy offset out of range")
        # overlapping copies are legal and byte-serial by definition
        src = len(out) - offset
        for k in range(ln):
            out.append(out[src + k])
    if len(out) != want:
        raise ValueError(
            f"snappy: length mismatch (expected {want}, got {len(out)})"
        )
    return bytes(out)


def xerial_frame(data: bytes) -> bytes:
    """Wrap raw bytes in the snappy-java stream container Kafka uses:
    magic + version(1)/compatible(1) + length-prefixed compressed chunks
    of <= 32 KiB uncompressed."""
    out = bytearray(XERIAL_MAGIC)
    out += struct.pack(">ii", 1, 1)
    for i in range(0, len(data), XERIAL_BLOCK):
        chunk = snappy_compress(data[i : i + XERIAL_BLOCK])
        out += struct.pack(">i", len(chunk))
        out += chunk
    return bytes(out)  # zero chunks is a valid empty stream


def xerial_unframe(data: bytes) -> bytes:
    """Decode a snappy-java stream container (or, when the magic is
    absent, fall back to a raw snappy block — older Kafka clients emit
    unframed blocks)."""
    if not data.startswith(XERIAL_MAGIC):
        return snappy_decompress(data)
    pos = len(XERIAL_MAGIC) + 8  # skip version/compatible
    out = bytearray()
    n = len(data)
    while pos < n:
        if pos + 4 > n:
            raise ValueError("xerial: truncated chunk length")
        clen = struct.unpack_from(">i", data, pos)[0]
        pos += 4
        if clen < 0 or pos + clen > n:
            raise ValueError("xerial: chunk length out of range")
        out += snappy_decompress(data[pos : pos + clen])
        pos += clen
    return bytes(out)
