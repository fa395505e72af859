"""REAL stdlib+numpy baseline JPEG codec (public ITU-T T.81 spec).

Decoder: marker walk (DQT/SOF0/SOF2/DHT/SOS/DRI), canonical Huffman
decode of the entropy-coded segments (16-bit-prefix LUT, byte-unstuffing,
restart markers), DC prediction, run-length AC, dequantize + de-zigzag,
orthonormal 8x8 IDCT as one einsum over ALL blocks, nearest-neighbor
chroma upsample for subsampled scans, and the BT.601 YCbCr→RGB transform.
BOTH profiles real web JPEGs use decode: baseline sequential (SOF0/1) and
progressive (SOF2) with spectral selection, successive approximation,
cross-block EOB runs, and DC/AC refinement scans (T.81 annex G).
Arithmetic coding, lossless, hierarchical and 12-bit raise ValueError
(callers degrade to header-only rows).

Encoder: the reverse pipeline with the spec's Annex K example quantization
and Huffman tables (scaled by a quality knob), optional 4:2:0 subsampling,
and a progressive mode emitting the full scan script (DC first → banded
AC first with EOB runs → DC refine → banded AC refine) so round-trip
tests drive every progressive decode path; progressive and baseline
encodings of the same input decode BIT-IDENTICALLY (same quantized
coefficients, losslessly re-serialized).
Lossy like any JPEG — round-trip tests assert tolerance, and exactness
tests use flat blocks (a constant block has only a DC coefficient, which
survives quantization exactly at q=1, so solid colors round-trip
bit-exactly; the oracle gate leans on this).

Reference parity: eventflux-io/engine has no media codecs at all; this
extends the multimodal pipeline axis (SURVEY.md LLM-data-pipeline
section) the same way the PNG/BMP/GIF/WAV/MP4 codecs do.
"""

from __future__ import annotations

import struct
import threading

import numpy as np

# zig-zag scan order (T.81 Figure 5): index i in scan order → (row, col)
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: orthonormal DCT-II basis: A[k, n] = c(k) * cos((2n+1) k pi / 16)
_A = np.array([
    [float(np.sqrt(1 / 8)) if k == 0 else float(np.sqrt(2 / 8))
     * float(np.cos((2 * n + 1) * k * np.pi / 16)) for n in range(8)]
    for k in range(8)
])

# Annex K.1 example luminance / chrominance quantization tables (in zigzag
# source order as table K.1/K.2 list them row-major; we store row-major)
_QY = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (BITS list of 16 counts, HUFFVAL)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) → symbol, per T.81 Annex C code assignment."""
    codes: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return codes


def _unstuff(b: bytes, pos: int) -> tuple[bytes, list[int], int]:
    """Entropy-coded segment → (unstuffed bytes, restart byte offsets,
    source index of the terminating marker). 0xFF00 → 0xFF; RSTn markers
    are removed with their (unstuffed) offset recorded; any other marker
    ends the segment. One pass up front lets the bit reader below be
    branch-free — and the end index lets a progressive decoder resume the
    marker walk after each scan."""
    out = bytearray()
    restarts: list[int] = []
    n = len(b)
    i = pos
    while i < n:
        byte = b[i]
        if byte != 0xFF:
            out.append(byte)
            i += 1
            continue
        nxt = b[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            out.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            restarts.append(len(out))
            i += 2
        else:
            break
    return bytes(out), restarts, min(i, n)


class _FastBits:
    """MSB-first bit cursor over pre-unstuffed bytes: 16-bit peeks feed
    the Huffman LUT; multi-bit reads are one int.from_bytes window."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, padded: bool = False):
        # padded=True: caller already appended the EOB-territory padding
        # (lets many cursors share one buffer instead of copying the
        # whole scan per restart segment)
        self.buf = buf if padded else buf + b"\x00" * 8
        self.pos = 0

    def peek16(self) -> int:
        byte = self.pos >> 3
        window = int.from_bytes(self.buf[byte : byte + 4], "big")
        return (window >> (16 - (self.pos & 7))) & 0xFFFF

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        byte = self.pos >> 3
        window = int.from_bytes(self.buf[byte : byte + 5], "big")
        v = (window >> (40 - (self.pos & 7) - k)) & ((1 << k) - 1)
        self.pos += k
        return v


def _huff_lut(codes: dict[tuple[int, int], int]) -> list[int]:
    """16-bit-prefix lookup table: lut[next16] = (code_length << 8) | sym.
    One list index replaces the per-bit walk (T.81 allows codes ≤ 16
    bits, so every code determines a unique 16-bit prefix range). Built
    with numpy slice fills — the per-entry Python loop was 92% of the
    decode profile (a 2-bit code alone fills 16,384 entries)."""
    lut = np.zeros(65536, np.int32)
    for (ln, code), sym in codes.items():
        base = code << (16 - ln)
        lut[base : base + (1 << (16 - ln))] = (ln << 8) | sym
    return lut.tolist()


#: bounded memo of Huffman LUTs keyed by the raw DHT table definition
#: (bits + vals bytes): real-world corpora overwhelmingly ship the Annex
#: K tables, so each distinct table builds once per worker process. The
#: LUT lists are read-only downstream. Cleared at 64 entries.
_DHT_LUT_CACHE: dict[bytes, list] = {}


def _huff_lut_cached(raw: bytes, codes: dict) -> list[int]:
    lut = _DHT_LUT_CACHE.get(raw)
    if lut is None:
        lut = _huff_lut(codes)
        if len(_DHT_LUT_CACHE) >= 64:
            _DHT_LUT_CACHE.clear()
        _DHT_LUT_CACHE[raw] = lut
    return lut


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _dc_units(scan, comps_geo):
    """Ordered decode units of a DC scan: MCUs (interleaved multi-
    component) or single blocks (one component), each a list of
    (component, block_index) in spec order."""
    if len(scan) > 1:
        g = comps_geo[scan[0]["id"]]
        mcux, mcuy = g["mcux"], g["mcuy"]
        units = []
        for my in range(mcuy):
            for mx in range(mcux):
                unit = []
                for c in scan:
                    gg = comps_geo[c["id"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            unit.append(
                                (
                                    c,
                                    (my * c["v"] + by) * gg["wb_pad"]
                                    + mx * c["h"]
                                    + bx,
                                )
                            )
                units.append(unit)
        return units
    c = scan[0]
    g = comps_geo[c["id"]]
    return [
        [(c, by * g["wb_pad"] + bx)]
        for by in range(g["hb"])
        for bx in range(g["wb"])
    ]


def _decode_dc_units(
    padded, bit_start, units, lo, hi, scan, coefs, luts, ah, al
):
    """One restart segment of a DC scan (units [lo, hi) from bit_start,
    fresh predictors — T.81 G.1.2.1). Returns (comp_id, block_index,
    new_dc) triples instead of writing coefs, so a forked worker can
    ship results back; the caller applies them."""
    r = _FastBits(padded, padded=True)
    r.pos = bit_start
    pred = {c["id"]: 0 for c in scan}
    out = []
    for unit in units[lo:hi]:
        for c, bi in unit:
            cid = c["id"]
            if ah == 0:
                lut = luts.get((0, c["td"]))
                if lut is None:
                    raise ValueError("JPEG scan references missing DHT")
                v = lut[r.peek16()]
                if not v:
                    raise ValueError("invalid JPEG Huffman code")
                r.pos += v >> 8
                t = v & 0xFF
                pred[cid] += _extend(r.bits(t), t)
                out.append((cid, bi, pred[cid] << al))
            else:
                # two's-complement low bits: the arithmetic works for
                # negative DC too (see tests)
                out.append((cid, bi, coefs[cid][bi][0] | (r.bits(1) << al)))
    # compact transfer: one int32 matrix instead of n python tuples.
    # Pack via int64 first: a crafted stream can walk the DC predictor
    # past 2^31, which int32 packing would silently wrap on numpy 1.x
    # (numpy 2.x raises OverflowError) — range-check, then narrow.
    if not out:
        return [np.empty((0, 3), np.int32)]
    mat = np.array(out, np.int64)
    dc = mat[:, 2]
    if dc.max() > 0x7FFFFFFF or dc.min() < -0x80000000:
        raise ValueError("JPEG DC coefficient out of int32 range")
    return [mat.astype(np.int32)]


def _decode_dc_scan(
    padded, scan, comps_geo, coefs, luts, ah, al, restart, restarts,
    workers: int = 1,
):
    """DC scan (Ss=Se=0): interleaved over MCUs when multi-component, else
    the component's own block grid. First pass (Ah=0) Huffman-codes the
    point-transformed DC diffs; refinement (Ah>0) is one raw bit per
    block (T.81 G.1.2.1). Restart segments decode independently
    (predictors reset), on a forked pool when ``workers > 1``."""
    units = _dc_units(scan, comps_geo)
    segs = _restart_segments(restarts, restart, len(units), len(padded) - 8)
    if ah > 0:
        # DC refinement is one raw bit per block, no Huffman work —
        # fork overhead would dominate; always decode in-process
        workers = 1

    def run(seg):
        off, lo, hi = seg
        return _decode_dc_units(
            padded, off * 8, units, lo, hi, scan, coefs, luts, ah, al
        )

    for seg_mat in _run_scan_segments(run, segs, workers):
        for cid, bi, v in seg_mat.tolist():
            coefs[cid][bi][0] = v


def _ac_block_first(r, blk, lut, ss, se, al, eobrun):
    """First AC pass for one block (T.81 G.1.2.2); returns the new EOB
    run count."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        v = lut[r.peek16()]
        if not v:
            raise ValueError("invalid JPEG Huffman code")
        r.pos += v >> 8
        rs = v & 0xFF
        rr, sz = rs >> 4, rs & 0xF
        if sz == 0:
            if rr < 15:  # EOBn: run of (1<<rr)+bits blocks
                eobrun = (1 << rr) - 1
                if rr:
                    eobrun += r.bits(rr)
                break
            k += 16  # ZRL
            continue
        k += rr
        if k > se:
            raise ValueError("JPEG AC run overflow")
        blk[k] = _extend(r.bits(sz), sz) << al
        k += 1
    return eobrun


def _ac_block_refine(r, blk, lut, ss, se, al, p1, eobrun):
    """AC refinement for one block (T.81 G.1.2.3); returns the new EOB
    run count."""
    k = ss
    if eobrun == 0:
        while k <= se:
            v = lut[r.peek16()]
            if not v:
                raise ValueError("invalid JPEG Huffman code")
            r.pos += v >> 8
            rs = v & 0xFF
            rr, sz = rs >> 4, rs & 0xF
            val = 0
            if sz == 0:
                if rr < 15:
                    eobrun = (1 << rr)
                    if rr:
                        eobrun += r.bits(rr)
                    break
                # ZRL: cross 16 zero-history positions
            else:
                if sz != 1:
                    raise ValueError("bad JPEG refine symbol")
                val = p1 if r.bits(1) else -p1
            # advance: pass rr zero-history positions, reading a
            # correction bit at every nonzero-history one
            while k <= se:
                if blk[k] != 0:
                    if r.bits(1) and (abs(blk[k]) & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else -p1
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        # EOB-covered block: still carries correction bits for every
        # already-nonzero coefficient in the band
        while k <= se:
            if blk[k] != 0:
                if r.bits(1) and (abs(blk[k]) & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else -p1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_ac_blocks(padded, bit_start, lo, hi, c, geo, coefs, lut,
                      ss, se, ah, al):
    """One restart segment of an AC scan (blocks [lo, hi) in raster
    order from bit_start, EOB run reset). Returns (block_index, block)
    pairs over COPIES so a forked worker can ship them back."""
    r = _FastBits(padded, padded=True)
    r.pos = bit_start
    eobrun = 0
    p1 = 1 << al
    cid = c["id"]
    out = []
    for idx in range(lo, hi):
        by, bx = divmod(idx, geo["wb"])
        bi = by * geo["wb_pad"] + bx
        blk = list(coefs[cid][bi])
        if ah == 0:
            eobrun = _ac_block_first(r, blk, lut, ss, se, al, eobrun)
        else:
            eobrun = _ac_block_refine(r, blk, lut, ss, se, al, p1, eobrun)
        out.append((bi, blk))
    # ship back as two compact int32 buffers: per-block python lists cost
    # more to pickle than the entropy decode saves
    bis = np.array([bi for bi, _ in out], np.int32)
    mat = (
        np.array([blk for _, blk in out], np.int32)
        if out
        else np.empty((0, 64), np.int32)
    )
    return [(bis, mat)]


def _decode_ac_scan(
    padded, c, geo, coefs, lut, ss, se, ah, al, restart, restarts,
    workers: int = 1,
):
    """AC scan (single component, T.81 G.1.2.2 first pass / G.1.2.3
    refinement) over the component's NON-padded block grid in raster
    order, with EOB runs spanning blocks — but never spanning restarts,
    which is what lets segments decode independently (forked pool when
    ``workers > 1``). Sequential fast path mutates coefs in place."""
    n = geo["hb"] * geo["wb"]
    segs = _restart_segments(restarts, restart, n, len(padded) - 8)
    cid = c["id"]
    if workers <= 1 or len(segs) < 2:
        p1 = 1 << al
        for off, lo, hi in segs:
            r = _FastBits(padded, padded=True)
            r.pos = off * 8
            eobrun = 0
            for idx in range(lo, hi):
                by, bx = divmod(idx, geo["wb"])
                blk = coefs[cid][by * geo["wb_pad"] + bx]
                if ah == 0:
                    eobrun = _ac_block_first(r, blk, lut, ss, se, al, eobrun)
                else:
                    eobrun = _ac_block_refine(
                        r, blk, lut, ss, se, al, p1, eobrun
                    )
        return

    def run(seg):
        off, lo, hi = seg
        return _decode_ac_blocks(
            padded, off * 8, lo, hi, c, geo, coefs, lut, ss, se, ah, al
        )

    for bis, mat in _run_scan_segments(run, segs, workers):
        rows = mat.tolist()
        for j, bi in enumerate(bis.tolist()):
            coefs[cid][bi] = rows[j]



def _restart_segments(
    restarts: list[int], restart: int, total_mcus: int,
    buf_len: int | None = None,
) -> list[tuple[int, int, int]]:
    """(byte_offset, mcu_lo, mcu_hi) per restart segment. Restart
    intervals are bit-independent by design (T.81 F.2.1.3: RSTn
    byte-aligns the stream and resets DC prediction), so each segment
    decodes with no state from its predecessors — the property both the
    sequential and the forked path rely on."""
    if not restart:
        return [(0, 0, total_mcus)]
    n_segs = -(-total_mcus // restart)
    if n_segs == 0:
        # zero MCUs (e.g. zero-height / DNL-deferred SOF): nothing to
        # decode; any restart marker in the stream contradicts DRI.
        # Without this branch the surplus check below would index
        # restarts[-1] on an empty list (IndexError, not our contract).
        if restarts:
            raise ValueError(
                f"JPEG stream declares 0 MCUs but has {len(restarts)} restart markers"
            )
        return []
    if len(restarts) < n_segs - 1:
        raise ValueError(
            f"expected {n_segs - 1} JPEG restart markers, found {len(restarts)}"
        )
    if len(restarts) > n_segs - 1:
        # ONE extra marker AT THE STREAM'S END is a benign encoder quirk
        # (the pre-segmented decoder simply never consumed it); any other
        # surplus means the stream restarts more often than DRI declares —
        # slicing would silently misalign every later segment, so fail
        # loudly instead
        trailing_ok = (
            len(restarts) == n_segs
            and (buf_len is None or restarts[-1] >= buf_len)
        )
        if not trailing_ok:
            raise ValueError(
                f"expected {n_segs - 1} JPEG restart markers, found "
                f"{len(restarts)} (not a single trailing marker)"
            )
    offs = [0, *restarts[: n_segs - 1]]
    return [
        (offs[i], i * restart, min((i + 1) * restart, total_mcus))
        for i in range(n_segs)
    ]


def _decode_baseline_mcus(
    padded: bytes, bit_start: int, mcu_lo: int, mcu_hi: int, comp_tabs
) -> dict[int, list[list[int]]]:
    """Decode the contiguous MCU range [mcu_lo, mcu_hi) of a baseline
    interleaved scan from ``bit_start`` with fresh DC predictors —
    exactly one restart segment's contract. ``padded`` must carry
    _FastBits' 8-byte EOB-territory padding already (segments share one
    buffer instead of copying the scan per segment)."""
    r = _FastBits(padded, padded=True)
    r.pos = bit_start
    pred = {c["id"]: 0 for c, _, _ in comp_tabs}
    out: dict[int, list[list[int]]] = {c["id"]: [] for c, _, _ in comp_tabs}
    for _m in range(mcu_lo, mcu_hi):
        for c, dc_lut, ac_lut in comp_tabs:
            cid = c["id"]
            rows = out[cid]
            for _by in range(c["v"]):
                for _bx in range(c["h"]):
                    zz = [0] * 64
                    v = dc_lut[r.peek16()]
                    if not v:
                        raise ValueError("invalid JPEG Huffman code")
                    r.pos += v >> 8
                    t = v & 0xFF
                    diff = _extend(r.bits(t), t)
                    pred[cid] += diff
                    zz[0] = pred[cid]
                    k = 1
                    while k < 64:
                        v = ac_lut[r.peek16()]
                        if not v:
                            raise ValueError("invalid JPEG Huffman code")
                        r.pos += v >> 8
                        rs = v & 0xFF
                        ssss = rs & 0xF
                        if ssss == 0:
                            if rs == 0xF0:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += rs >> 4
                        if k > 63:
                            raise ValueError("JPEG AC run overflow")
                        zz[k] = _extend(r.bits(ssss), ssss)
                        k += 1
                    rows.append(zz)
    return out


#: fork-inherited state for the parallel segment decoder: set in the
#: parent immediately before the Pool forks, cleared after — workers read
#: it copy-on-write, so neither the scan buffer nor the 64K-entry Huffman
#: LUTs are ever pickled. Guarded by _FORK_LOCK: the state is module-
#: global, so concurrent decode_jpeg(workers>1) calls from multiple
#: threads must stage-and-fork one at a time (each fork is quick; the
#: pool itself runs outside any contention with the child processes).
_FORK_STATE: dict = {}
_FORK_LOCK = threading.Lock()  # created at import: a lazy check-then-act
# init would race on concurrent first use, defeating the lock's purpose


def _scan_seg_task(seg):
    return _FORK_STATE["run"](seg)


def _run_scan_segments(run, segs, workers: int) -> list:
    """Run one scan's restart segments through ``run`` — sequentially, or
    on a forked pool when ``workers > 1`` (the closure and everything it
    captures — padded buffer, LUTs, prior coefficients — reach workers
    via fork copy-on-write, never pickled; only the per-segment result
    lists ship back). Results concatenate in segment order. Thread-safe:
    concurrent callers serialize on the module fork lock."""
    if workers > 1 and len(segs) > 1:
        import multiprocessing as mp

        try:
            ctx = mp.get_context("fork")
        except ValueError:  # platform without fork
            ctx = None
        if ctx is not None:
            with _FORK_LOCK:
                _FORK_STATE["run"] = run
                try:
                    with ctx.Pool(min(workers, len(segs))) as pool:
                        chunks = pool.map(
                            _scan_seg_task,
                            segs,
                            chunksize=max(1, len(segs) // (workers * 4)),
                        )
                finally:
                    _FORK_STATE.pop("run", None)
            return [item for ch in chunks for item in ch]
    out = []
    for seg in segs:
        out.extend(run(seg))
    return out


def decode_jpeg(b: bytes, workers: int = 1) -> np.ndarray:
    """JPEG bytes → HxWx3 (or HxWx1 grayscale) uint8 array. Baseline
    (SOF0/1) and progressive (SOF2: spectral selection + successive
    approximation, EOB runs, DC/AC refinement scans) both decode;
    arithmetic-coded, lossless and hierarchical profiles raise.

    ``workers > 1`` entropy-decodes a DRI-encoded baseline image's
    restart segments on a forked process pool (bit-identical to the
    sequential path — segments are independent by spec). Useful for a
    FEW HUGE images; at corpus scale Spark already parallelizes across
    images, so the datapipe keeps the default of 1."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) → codes
    hluts: dict[tuple[int, int], list] = {}  # same keys → 16-bit-prefix LUT
    comps: list[dict] = []
    w = h = None
    progressive = False
    restart = 0
    pos = 2
    scans: list[dict] = []
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = b[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        seg = b[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.frombuffer(seg, np.uint8, 64, i + 1).astype(np.int64)
                dez = np.zeros(64, np.int64)
                dez[_ZIGZAG] = tbl  # stored in zigzag order → natural
                qt[tq] = dez.reshape(8, 8)
                i += 65
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            prec = seg[0]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            h, w = struct.unpack(">HH", seg[1:5])
            n = seg[5]
            comps = []
            for ci in range(n):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "arithmetic/lossless/hierarchical JPEG not supported"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                huff[(tc, th)] = _canonical_codes(bits, vals)
                # LUT built once per DHT (memoized on the raw definition),
                # not once per table per SCAN — a progressive image used
                # to rebuild every 65k-entry table ~5x per decode
                hluts[(tc, th)] = _huff_lut_cached(
                    bytes(seg[i + 1 : i + 17 + nv]), huff[(tc, th)]
                )
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS: scan header + entropy segment
            ns = seg[0]
            scan_comps = []
            for ci in range(ns):
                cs, tdta = seg[1 + 2 * ci : 3 + 2 * ci]
                comp = next(c for c in comps if c["id"] == cs)
                scan_comps.append(
                    {**comp, "td": tdta >> 4, "ta": tdta & 0xF}
                )
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            buf, rst, segend = _unstuff(b, pos + 2 + seglen)
            scans.append(
                {
                    "comps": scan_comps,
                    "ss": ss,
                    "se": se,
                    "ah": ahal >> 4,
                    "al": ahal & 0xF,
                    "buf": buf,
                    "restarts": rst,
                    "restart": restart,
                    "luts": dict(hluts),  # snapshot: later DHTs may redefine
                }
            )
            if not progressive:
                break  # baseline: single scan
            pos = segend
            continue
        pos += 2 + seglen
    if w is None or not scans:
        raise ValueError("truncated JPEG (no SOF/SOS)")

    all_scan_comps = scans[0]["comps"] if not progressive else comps
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component geometry: MCU-padded grid (interleaved scans) and the
    # non-padded grid (non-interleaved scans cover only real blocks)
    comps_geo = {}
    for c in comps:
        cw = -(-w * c["h"] // hmax)
        ch_ = -(-h * c["v"] // vmax)
        comps_geo[c["id"]] = {
            "mcux": mcux,
            "mcuy": mcuy,
            "wb_pad": mcux * c["h"],
            "hb_pad": mcuy * c["v"],
            "wb": -(-cw // 8),
            "hb": -(-ch_ // 8),
        }
    planes = {
        c["id"]: np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64
        )
        for c in all_scan_comps
    }
    coeffs: dict[int, list[list[int]]] = {}
    positions: dict[int, list[tuple[int, int]]] = {}

    if progressive:
        coefs = {
            c["id"]: [
                [0] * 64
                for _ in range(
                    comps_geo[c["id"]]["hb_pad"] * comps_geo[c["id"]]["wb_pad"]
                )
            ]
            for c in comps
        }
        for sc in scans:
            padded = sc["buf"] + b"\x00" * 8
            if sc["ss"] == 0:
                if sc["se"] != 0:
                    raise ValueError("progressive scan mixes DC and AC")
                _decode_dc_scan(
                    padded, sc["comps"], comps_geo, coefs, sc["luts"],
                    sc["ah"], sc["al"], sc["restart"], sc["restarts"],
                    workers=workers,
                )
            else:
                if len(sc["comps"]) != 1:
                    raise ValueError("progressive AC scan must be one component")
                c = sc["comps"][0]
                lut = sc["luts"].get((1, c["ta"]))
                if lut is None:
                    raise ValueError("JPEG scan references missing DHT")
                _decode_ac_scan(
                    padded, c, comps_geo[c["id"]], coefs, lut,
                    sc["ss"], sc["se"], sc["ah"], sc["al"],
                    sc["restart"], sc["restarts"], workers=workers,
                )
        for c in comps:
            g = comps_geo[c["id"]]
            if c["tq"] not in qt:
                raise ValueError("JPEG scan references missing DQT")
            coeffs[c["id"]] = coefs[c["id"]]
            positions[c["id"]] = [
                (by * 8, bx * 8)
                for by in range(g["hb_pad"])
                for bx in range(g["wb_pad"])
            ]
        scan_comps = comps
    else:
        sc = scans[0]
        scan_comps = sc["comps"]
        buf, restarts = sc["buf"], sc["restarts"]
        luts = sc["luts"]
        comp_tabs = []
        for c in scan_comps:
            dc_lut = luts.get((0, c["td"]))
            ac_lut = luts.get((1, c["ta"]))
            if dc_lut is None or ac_lut is None:
                raise ValueError("JPEG scan references missing DHT")
            if c["tq"] not in qt:
                raise ValueError("JPEG scan references missing DQT")
            comp_tabs.append((c, dc_lut, ac_lut))
        total_mcus = mcux * mcuy
        segs = _restart_segments(
            restarts, sc["restart"], total_mcus, len(buf)
        )
        padded = buf + b"\x00" * 8

        def _baseline_seg(seg):
            off, lo, hi = seg
            res = _decode_baseline_mcus(padded, off * 8, lo, hi, comp_tabs)
            # ship coefficients as compact int32 buffers: pickling the
            # raw list-of-lists costs more than the decode win
            return [
                {
                    cid: np.asarray(v, np.int32).reshape(-1, 64)
                    for cid, v in res.items()
                }
            ]

        seg_results = _run_scan_segments(_baseline_seg, segs, workers)
        coeffs = {
            c["id"]: (
                np.concatenate(
                    [
                        np.asarray(res[c["id"]], np.int32).reshape(-1, 64)
                        for res in seg_results
                    ]
                )
                if seg_results
                else np.empty((0, 64), np.int32)
            )
            for c in scan_comps
        }
        # positions follow from MCU order alone (MCU-major, then by, bx) —
        # identical for every segment layout
        positions = {}
        for c in scan_comps:
            plist = []
            for m in range(total_mcus):
                my, mx = divmod(m, mcux)
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        plist.append(
                            ((my * c["v"] + by) * 8, (mx * c["h"] + bx) * 8)
                        )
            positions[c["id"]] = plist

    # dequantize + de-zigzag + IDCT all blocks of each component at once:
    # one fancy-index + one einsum over the whole block stack
    for c in scan_comps:
        rowsz = coeffs[c["id"]]
        if len(rowsz) == 0:  # list (progressive) or ndarray (baseline)
            continue
        scan_mat = np.array(rowsz, np.float64)  # (n, 64) in scan order
        nat = np.empty_like(scan_mat)
        nat[:, _ZIGZAG] = scan_mat
        stack = nat.reshape(-1, 8, 8) * qt[c["tq"]][None, :, :]
        pix = np.einsum("kb,nkl,lc->nbc", _A, stack, _A) + 128.0
        plane = planes[c["id"]]
        for (y0, x0), blk in zip(positions[c["id"]], pix):
            plane[y0 : y0 + 8, x0 : x0 + 8] = blk
    # upsample to full resolution and stack components
    out = []
    for c in scan_comps:
        plane = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        out.append(plane[:h, :w])
    if len(out) == 1:
        y = np.clip(np.rint(out[0]), 0, 255).astype(np.uint8)
        return y[:, :, None]
    if len(out) != 3:
        raise ValueError(f"unsupported JPEG component count {len(out)}")
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v: int, k: int) -> None:
        for i in range(k - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self) -> None:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.n = 0, 0


def _emit_rst(bw: "_BitWriter", idx: int) -> None:
    """Byte-align (1-padded, stuffed) and append a restart marker — RSTn
    cycles modulo 8 within a scan."""
    bw.flush()
    bw.out += bytes([0xFF, 0xD0 + (idx & 7)])


def _encode_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) for encoding."""
    return {
        sym: (code, length)
        for (length, code), sym in _canonical_codes(bits, vals).items()
    }


def _mag_bits(v: int) -> tuple[int, int]:
    """signed value → (category t, t-bit magnitude code) per F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, (v if v > 0 else v + (1 << t) - 1)


#: flat 9-bit AC Huffman table for progressive scans: the Annex K AC
#: tables define no EOBn (n>0) symbols, so cross-block EOB runs need a
#: custom table. All 176 symbols (run/size, ZRL, EOBn for n=0..14) at
#: code length 9 — canonically valid (176 < 511), trivially so, at a
#: size cost a production encoder would optimize per scan.
_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0],
    sorted(
        [(r << 4) | sz for r in range(16) for sz in range(1, 11)]
        + [r << 4 for r in range(15)]
        + [0xF0]
    ),
)


def _trunc_shift(v: int, al: int) -> int:
    """AC point transform (T.81 G.1.2.2): divide by 2^Al truncating
    toward ZERO (unlike the DC transform's arithmetic shift)."""
    return -((-v) >> al) if v < 0 else v >> al


def _enc_ac_first_scan(bw, zzc, geo, ac_tab, ss, se, al, restart=0) -> None:
    """AC first pass for one component over its non-padded grid, with
    cross-block EOB runs (exercises the decoder's eobrun>1 path). A
    restart interval (counted in blocks for non-interleaved scans)
    flushes the pending EOB run — runs cannot span restarts."""
    eobrun = 0
    bcount = 0
    rst = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun <= 0:
            return
        rr = eobrun.bit_length() - 1
        code, ln = ac_tab[rr << 4]
        bw.bits(code, ln)
        if rr:
            bw.bits(eobrun - (1 << rr), rr)
        eobrun = 0

    for by in range(geo["hb"]):
        for bx in range(geo["wb"]):
            if restart and bcount and bcount % restart == 0:
                flush_eob()
                _emit_rst(bw, rst)
                rst += 1
            bcount += 1
            zz = zzc[by, bx]
            tv = [_trunc_shift(int(zz[k]), al) for k in range(ss, se + 1)]
            nz = [i for i, t in enumerate(tv) if t]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for i in range(nz[-1] + 1):
                t = tv[i]
                if t == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_tab[0xF0]  # ZRL
                    bw.bits(code, ln)
                    run -= 16
                sz, mag = _mag_bits(t)
                code, ln = ac_tab[(run << 4) | sz]
                bw.bits(code, ln)
                bw.bits(mag, sz)
                run = 0
            if nz[-1] < se - ss:
                eobrun += 1  # trailing zeros: EOB covers this block too
    flush_eob()


def _enc_ac_refine_scan(bw, zzc, geo, ac_tab, ss, se, ah, al, restart=0) -> None:
    """AC refinement pass (T.81 G.1.2.3 encode): per block, emit
    newly-significant coefficients with their zero-history run lengths,
    interleaving correction bits of already-significant coefficients in
    decoder crossing order; per-block EOB0 carries trailing corrections."""
    bcount = 0
    rst = 0
    for by in range(geo["hb"]):
        for bx in range(geo["wb"]):
            if restart and bcount and bcount % restart == 0:
                _emit_rst(bw, rst)
                rst += 1
            bcount += 1
            zz = zzc[by, bx]
            events = []  # ('z') | ('c', bit) | ('s', signbit)
            for k in range(ss, se + 1):
                v = int(zz[k])
                t = abs(v) >> al
                if t == 0:
                    events.append(("z", 0))
                elif t == 1:
                    events.append(("s", 1 if v > 0 else 0))
                else:
                    events.append(("c", t & 1))
            last_s = -1
            for i, e in enumerate(events):
                if e[0] == "s":
                    last_s = i
            j = 0
            while j <= last_s:
                seg = []
                zcount = 0
                while events[j][0] != "s":
                    seg.append(events[j])
                    if events[j][0] == "z":
                        zcount += 1
                    j += 1
                p = 0
                while zcount > 15:
                    code, ln = ac_tab[0xF0]  # ZRL = 16 zero-history coeffs
                    bw.bits(code, ln)
                    zseen = 0
                    while zseen < 16:
                        ev = seg[p]
                        p += 1
                        if ev[0] == "z":
                            zseen += 1
                        else:
                            bw.bits(ev[1], 1)
                    zcount -= 16
                code, ln = ac_tab[(zcount << 4) | 1]
                bw.bits(code, ln)
                bw.bits(events[j][1], 1)  # sign
                for ev in seg[p:]:
                    if ev[0] == "c":
                        bw.bits(ev[1], 1)
                j += 1
            if j < len(events):  # trailing zeros/corrections → EOB0
                code, ln = ac_tab[0x00]
                bw.bits(code, ln)
                for ev in events[j:]:
                    if ev[0] == "c":
                        bw.bits(ev[1], 1)


def encode_jpeg(
    arr,
    quality: int = 90,
    subsample: bool = False,
    progressive: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """HxW / HxWx1 / HxWx3 uint8 array → JFIF JPEG bytes.

    quality 1-100 scales the Annex K tables (libjpeg's mapping); 100 →
    all-ones quantization, at which flat 8x8 regions survive EXACTLY.
    ``subsample=True`` emits 4:2:0 chroma. ``progressive=True`` emits a
    SOF2 stream with successive approximation: DC first (Al=1) → per-
    component AC first with cross-block EOB runs (Al=1) → DC refinement →
    per-component AC refinement (Ah=1, Al=0) — exercising every decoder
    path a real progressive file uses. ``restart_interval`` emits DRI +
    RSTn markers every N MCUs (N blocks in non-interleaved progressive
    scans) — the resync points real camera/web encoders emit."""
    a = np.asarray(arr, np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nch = a.shape
    if nch not in (1, 3):
        raise ValueError("encode_jpeg needs 1 or 3 channels")
    if not 1 <= quality <= 100:
        raise ValueError("quality must be 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality

    def scaled(tbl: np.ndarray) -> np.ndarray:
        q = (tbl * scale + 50) // 100
        return np.clip(q, 1, 255)

    qy = scaled(_QY).reshape(8, 8)
    qc = scaled(_QC).reshape(8, 8)

    if nch == 3:
        rf = a.astype(np.float64)
        y = 0.299 * rf[:, :, 0] + 0.587 * rf[:, :, 1] + 0.114 * rf[:, :, 2]
        cb = -0.168736 * rf[:, :, 0] - 0.331264 * rf[:, :, 1] + 0.5 * rf[:, :, 2] + 128
        cr = 0.5 * rf[:, :, 0] - 0.418688 * rf[:, :, 1] - 0.081312 * rf[:, :, 2] + 128
        if subsample:
            def down(p):
                ph = p[: (p.shape[0] // 2) * 2, : (p.shape[1] // 2) * 2]
                if ph.size == 0:  # degenerate 1-px dimension
                    return p[:1, :1]
                return ph.reshape(ph.shape[0] // 2, 2, ph.shape[1] // 2, 2).mean(
                    axis=(1, 3)
                )
            planes = [(y, qy, 0, (2, 2)), (down(cb), qc, 1, (1, 1)),
                      (down(cr), qc, 1, (1, 1))]
        else:
            planes = [(y, qy, 0, (1, 1)), (cb, qc, 1, (1, 1)),
                      (cr, qc, 1, (1, 1))]
    else:
        planes = [(a[:, :, 0].astype(np.float64), qy, 0, (1, 1))]

    hmax = max(p[3][0] for p in planes)
    vmax = max(p[3][1] for p in planes)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # pad each plane to its own MCU-aligned size (edge replicate), then
    # FDCT + quantize + zigzag EVERY block in one vectorized shot:
    # (hb, wb, 64) scan-order int coefficients per component
    qcoefs = []
    meta = []  # (tid, (ch, cv), geo)
    for p, q, tid, (ch, cv) in planes:
        ph = mcuy * cv * 8
        pw = mcux * ch * 8
        pp = np.empty((ph, pw), np.float64)
        src_h, src_w = min(p.shape[0], ph), min(p.shape[1], pw)
        pp[:src_h, :src_w] = p[:src_h, :src_w]
        if src_w < pw:
            pp[:src_h, src_w:] = pp[:src_h, src_w - 1 : src_w]
        if src_h < ph:
            pp[src_h:] = pp[src_h - 1 : src_h]
        hb, wb = ph // 8, pw // 8
        blocks = pp.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3) - 128.0
        co = np.einsum("kb,ijbc,lc->ijkl", _A, blocks, _A)
        qz = np.rint(co / q).astype(np.int64).reshape(hb, wb, 64)
        qcoefs.append(qz[:, :, _ZIGZAG])  # natural → scan order
        # non-padded grid (progressive AC scans cover only real blocks)
        cw = -(-w * ch // hmax)
        chh = -(-h * cv // vmax)
        meta.append(
            (tid, (ch, cv),
             {"hb_pad": hb, "wb_pad": wb,
              "wb": -(-cw // 8), "hb": -(-chh // 8)})
        )

    dc_tabs = [_encode_codes(*_DC_LUM), _encode_codes(*_DC_CHR)]
    ac_tabs = [_encode_codes(*_AC_LUM), _encode_codes(*_AC_CHR)]

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(q.reshape(64)[_ZIGZAG].astype(np.uint8)))

    def dht(tc: int, th: int, tab: tuple[list[int], list[int]]) -> bytes:
        bits, vals = tab
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, qy)
    if nch == 3:
        out += dqt(1, qc)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nch])
    for ci, (tid, (ch, cv), _g) in enumerate(meta):
        sof += bytes([ci + 1, (ch << 4) | cv, tid])
    out += seg(0xC2 if progressive else 0xC0, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += dht(0, 0, _DC_LUM)
    if nch == 3:
        out += dht(0, 1, _DC_CHR)

    def sos_header(comp_ids: list[int], tds, tas, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_ids)])
        for cid, td, ta in zip(comp_ids, tds, tas):
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    if not progressive:
        out += dht(1, 0, _AC_LUM)
        if nch == 3:
            out += dht(1, 1, _AC_CHR)
        bw = _BitWriter()
        pred = [0] * len(meta)
        mcu_i = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                    _emit_rst(bw, mcu_i // restart_interval - 1)
                    pred = [0] * len(meta)
                mcu_i += 1
                for ci, (tid, (ch, cv), _g) in enumerate(meta):
                    for by in range(cv):
                        for bx in range(ch):
                            zz = qcoefs[ci][my * cv + by, mx * ch + bx]
                            diff = int(zz[0]) - pred[ci]
                            pred[ci] = int(zz[0])
                            t, mag = _mag_bits(diff)
                            code, ln = dc_tabs[tid][t]
                            bw.bits(code, ln)
                            if t:
                                bw.bits(mag, t)
                            run = 0
                            nzs = np.nonzero(zz[1:])[0]
                            last_nz = int(nzs[-1]) + 1 if len(nzs) else 0
                            for k in range(1, last_nz + 1):
                                v = int(zz[k])
                                if v == 0:
                                    run += 1
                                    continue
                                while run > 15:
                                    code, ln = ac_tabs[tid][0xF0]  # ZRL
                                    bw.bits(code, ln)
                                    run -= 16
                                t, mag = _mag_bits(v)
                                code, ln = ac_tabs[tid][(run << 4) | t]
                                bw.bits(code, ln)
                                bw.bits(mag, t)
                                run = 0
                            if last_nz < 63:
                                code, ln = ac_tabs[tid][0x00]  # EOB
                                bw.bits(code, ln)
        bw.flush()
        out += sos_header(
            list(range(1, nch + 1)),
            [m[0] for m in meta],
            [m[0] for m in meta],
            0, 63, 0, 0,
        )
        out += bw.out
        out += b"\xff\xd9"
        return bytes(out)

    # ---- progressive serialization -------------------------------------
    out += dht(1, 0, _AC_PROG)
    ac_prog = _encode_codes(*_AC_PROG)
    AL = 1

    # scan 1: DC first, all components interleaved, Al=AL
    bw = _BitWriter()
    pred = [0] * len(meta)
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                _emit_rst(bw, mcu_i // restart_interval - 1)
                pred = [0] * len(meta)
            mcu_i += 1
            for ci, (tid, (ch, cv), _g) in enumerate(meta):
                for by in range(cv):
                    for bx in range(ch):
                        dc = int(qcoefs[ci][my * cv + by, mx * ch + bx, 0]) >> AL
                        diff = dc - pred[ci]
                        pred[ci] = dc
                        t, mag = _mag_bits(diff)
                        code, ln = dc_tabs[tid][t]
                        bw.bits(code, ln)
                        if t:
                            bw.bits(mag, t)
    bw.flush()
    out += sos_header(
        list(range(1, nch + 1)), [m[0] for m in meta], [0] * nch, 0, 0, 0, AL
    )
    out += bw.out

    # scans 2..: AC first per component, Al=AL, split into two spectral
    # bands (1-5, 6-63) the way real progressive encoders order scans —
    # exercises decoders' band bookkeeping, not just the full band
    for ci, (_tid, _hv, g) in enumerate(meta):
        for bss, bse in ((1, 5), (6, 63)):
            bw = _BitWriter()
            _enc_ac_first_scan(
                bw, qcoefs[ci], g, ac_prog, bss, bse, AL,
                restart=restart_interval,
            )
            bw.flush()
            out += sos_header([ci + 1], [0], [0], bss, bse, 0, AL)
            out += bw.out

    # DC refinement: one raw bit per block, interleaved
    bw = _BitWriter()
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                _emit_rst(bw, mcu_i // restart_interval - 1)
            mcu_i += 1
            for ci, (_tid, (ch, cv), _g) in enumerate(meta):
                for by in range(cv):
                    for bx in range(ch):
                        dc = int(qcoefs[ci][my * cv + by, mx * ch + bx, 0])
                        bw.bits(dc & 1, 1)
    bw.flush()
    out += sos_header(
        list(range(1, nch + 1)), [0] * nch, [0] * nch, 0, 0, AL, 0
    )
    out += bw.out

    # AC refinement per component, Ah=AL → Al=0, same band split
    for ci, (_tid, _hv, g) in enumerate(meta):
        for bss, bse in ((1, 5), (6, 63)):
            bw = _BitWriter()
            _enc_ac_refine_scan(
                bw, qcoefs[ci], g, ac_prog, bss, bse, AL, 0,
                restart=restart_interval,
            )
            bw.flush()
            out += sos_header([ci + 1], [0], [0], bss, bse, AL, 0)
            out += bw.out

    out += b"\xff\xd9"
    return bytes(out)
