"""LZ4 codec (block + frame formats) and XXH32, pure stdlib.

All three layers are public specifications implemented from scratch:

- **XXH32** (the xxHash32 algorithm spec): 4-lane rotating-multiply core
  over 16-byte stripes, tail mixing, final avalanche. The frame format
  needs it for the header checksum (and optionally content/block sums).
- **LZ4 block** (lz4 Block format spec): token byte with literal-length
  high nibble and matchlength-4 low nibble, 255-byte length extensions,
  little-endian 2-byte match offsets, overlapping matches legal; the
  end-of-block restrictions (final sequence is literals-only; encoders
  leave the last 5 bytes as literals and start no match within 12 bytes
  of the end) are honored by the compressor and not assumed by the
  decompressor.
- **LZ4 frame** (lz4 Frame format spec): magic 0x184D2204, FLG/BD
  descriptor with version 01 and the XXH32-derived header-checksum
  byte, independent blocks with a high-bit "stored uncompressed" size
  escape, 0x00000000 end mark, optional XXH32 content checksum.

Kafka uses the frame format for codec 3 record batches (the snappy
module covers codec 2); both encode and decode go through here.

The compressor is the standard greedy hash-table matcher (same
strategy as snappy.py) — output is always format-valid; matcher quality
only affects ratio.
"""

from __future__ import annotations

import struct

_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M32 = 0xFFFFFFFF

LZ4_MAGIC = 0x184D2204
_MIN_MATCH = 4
_MLEN_BITS = 15


def _rotl(v: int, r: int) -> int:
    return ((v << r) | (v >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 of ``data`` (public xxHash spec)."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        limit = n - 16
        while i <= limit:
            x1, x2, x3, x4 = struct.unpack_from("<IIII", data, i)
            v1 = (_rotl((v1 + x1 * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl((v2 + x2 * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl((v3 + x3 * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl((v4 + x4 * _P2) & _M32, 13) * _P1) & _M32
            i += 16
        acc = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
               + _rotl(v4, 18)) & _M32
    else:
        acc = (seed + _P5) & _M32
    acc = (acc + n) & _M32
    while i + 4 <= n:
        (x,) = struct.unpack_from("<I", data, i)
        acc = (_rotl((acc + x * _P3) & _M32, 17) * _P4) & _M32
        i += 4
    while i < n:
        acc = (_rotl((acc + data[i] * _P5) & _M32, 11) * _P1) & _M32
        i += 1
    acc ^= acc >> 15
    acc = (acc * _P2) & _M32
    acc ^= acc >> 13
    acc = (acc * _P3) & _M32
    acc ^= acc >> 16
    return acc


def _put_len(out: bytearray, v: int) -> None:
    while v >= 255:
        out.append(255)
        v -= 255
    out.append(v)


def lz4_block_compress(data: bytes) -> bytes:
    """One LZ4 block (raw, no frame). Honors the spec's end-of-block
    encoder restrictions: the last 5 bytes stay literals and no match
    starts within the final 12 bytes."""
    n = len(data)
    out = bytearray()
    if n == 0:
        return b"\x00"  # token 0: zero literals, end of block
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    match_limit = n - 12  # spec: last match must start before this
    while i <= match_limit:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF:
            m = _MIN_MATCH
            # matchlength may run into the final 5 literals' reserve:
            # spec requires the block to END with >= 5 literal bytes
            maxm = (n - 5) - i
            while m < maxm and data[cand + m] == data[i + m]:
                m += 1
            if m < _MIN_MATCH:
                i += 1
                continue
            lit = data[lit_start:i]
            llen, mlen = len(lit), m - _MIN_MATCH
            token = (min(llen, _MLEN_BITS) << 4) | min(mlen, _MLEN_BITS)
            out.append(token)
            if llen >= _MLEN_BITS:
                _put_len(out, llen - _MLEN_BITS)
            out += lit
            out += struct.pack("<H", i - cand)
            if mlen >= _MLEN_BITS:
                _put_len(out, mlen - _MLEN_BITS)
            i += m
            lit_start = i
        else:
            i += 1
    # final literals-only sequence (no offset), as the spec requires
    lit = data[lit_start:]
    llen = len(lit)
    out.append(min(llen, _MLEN_BITS) << 4)
    if llen >= _MLEN_BITS:
        _put_len(out, llen - _MLEN_BITS)
    out += lit
    return bytes(out)


def lz4_block_decompress(data: bytes) -> bytes:
    """Decode one LZ4 block; ValueError on malformation."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        llen = token >> 4
        if llen == _MLEN_BITS:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated literal length")
                b = data[pos]
                pos += 1
                llen += b
                if b != 255:
                    break
        if pos + llen > n:
            raise ValueError("lz4: truncated literals")
        out += data[pos : pos + llen]
        pos += llen
        if pos >= n:
            break  # final sequence: literals only
        if pos + 2 > n:
            raise ValueError("lz4: truncated match offset")
        offset = struct.unpack_from("<H", data, pos)[0]
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError("lz4: match offset out of range")
        mlen = token & 0x0F
        if mlen == _MLEN_BITS:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated match length")
                b = data[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        mlen += _MIN_MATCH
        src = len(out) - offset
        for k in range(mlen):  # overlapping matches are byte-serial
            out.append(out[src + k])
    return bytes(out)


_BLOCK_MAX = 4 << 20  # BD code 7 (4 MiB) — one block covers any batch


def lz4_frame_compress(data: bytes, content_checksum: bool = True) -> bytes:
    """Wrap ``data`` in an LZ4 frame: independent blocks, optional
    content checksum, no content size."""
    flg = (1 << 6) | (1 << 5) | ((1 << 2) if content_checksum else 0)
    # version 01 | block-independence | content-checksum flag
    bd = 7 << 4  # block max size 4 MiB
    desc = bytes([flg, bd])
    hc = (xxh32(desc) >> 8) & 0xFF
    out = bytearray(struct.pack("<I", LZ4_MAGIC) + desc + bytes([hc]))
    for i in range(0, len(data), _BLOCK_MAX):
        chunk = data[i : i + _BLOCK_MAX]
        comp = lz4_block_compress(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            out += comp
        else:  # stored uncompressed, high bit set
            out += struct.pack("<I", len(chunk) | 0x80000000)
            out += chunk
    out += struct.pack("<I", 0)  # EndMark
    if content_checksum:
        out += struct.pack("<I", xxh32(data))
    return bytes(out)


def lz4_frame_decompress(data: bytes) -> bytes:
    """Decode an LZ4 frame; validates magic, the header-checksum byte,
    and the content checksum when present."""
    if len(data) < 7:
        raise ValueError("lz4: truncated frame header")
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != LZ4_MAGIC:
        raise ValueError(f"lz4: bad magic 0x{magic:08x}")
    flg = data[4]
    if (flg >> 6) != 1:
        raise ValueError("lz4: unsupported frame version")
    has_bsum = bool(flg & (1 << 4))
    has_csize = bool(flg & (1 << 3))
    has_csum = bool(flg & (1 << 2))
    has_dict = bool(flg & 1)
    pos = 6
    if has_csize:
        pos += 8
    if has_dict:
        pos += 4
    if pos >= len(data):
        raise ValueError("lz4: truncated frame descriptor")
    hc = data[pos]
    if ((xxh32(data[4:pos]) >> 8) & 0xFF) != hc:
        raise ValueError("lz4: frame header checksum mismatch")
    pos += 1
    out = bytearray()
    n = len(data)
    while True:
        if pos + 4 > n:
            raise ValueError("lz4: truncated block size")
        (bsize,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if bsize == 0:
            break  # EndMark
        stored = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        if pos + bsize > n:
            raise ValueError("lz4: truncated block")
        block = data[pos : pos + bsize]
        pos += bsize
        if has_bsum:
            if pos + 4 > n:
                raise ValueError("lz4: truncated block checksum")
            (bsum,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if xxh32(block) != bsum:
                raise ValueError("lz4: block checksum mismatch")
        out += block if stored else lz4_block_decompress(block)
    if has_csum:
        if pos + 4 > n:
            raise ValueError("lz4: truncated content checksum")
        (csum,) = struct.unpack_from("<I", data, pos)
        if xxh32(bytes(out)) != csum:
            raise ValueError("lz4: content checksum mismatch")
    return bytes(out)
