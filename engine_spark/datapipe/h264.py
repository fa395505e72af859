"""Baseline-profile H.264/AVC I-frame **and short-GOP P-frame** decoder
with a paired fixture encoder — stdlib + numpy, no av library.

Scope (honest): IDR/I slices of Baseline/Main-compatible streams —
CAVLC entropy coding AND (r12) CABAC entropy coding for I slices (the
clause 9.3 arithmetic engine, context modeling, binarizations and
significance maps; see the CABAC section header for the init-table
epistemic note), I_4x4 / I_16x16 / I_PCM macroblocks (r13: I_PCM works
inside CABAC slices too — terminate-bin signal, EncodeFlush/byte-align,
mid-slice engine re-init with contexts persisting), full intra
prediction (nine 4x4 modes, four
16x16 modes, four chroma modes), the 4x4 integer inverse transform
with the Intra16x16 luma DC Hadamard and 2x2 chroma DC paths, 4:2:0
only, frame_mbs_only (no fields/MBAFF), no FMO/ASO — PLUS the
CAVLC P-slice subset that
covers short-GOP web video: P_Skip (with the 8.4.1.1 mv inference),
P_L0_16x16 / 16x8 / 8x16 macroblock partitions and P_8x8 / P_8x8ref0
sub-macroblock partitions down to 4x4 (median/directional mv
prediction, 8.4.1.3), MULTI-REFERENCE prediction over the DEFAULT
RefPicList0 (up to 16 past frames most-recent-first for in-order
no-gap streams; te(v) ref_idx per partition), EXPLICIT WEIGHTED
prediction (pred_weight_table per-reference luma/chroma weights and
offsets, 8.4.2.3.2 — the fade-handling tool x264 emits with its
default weightp), intra MBs inside P slices, quarter-pel 6-tap luma
and eighth-pel bilinear chroma interpolation with edge clamp
(8.4.2.2), inter residuals via the Inter CBP mapping, and the in-loop
deblocking filter (8.7) with per-segment boundary strengths (4/3
intra, 2 on coefficients, 1 on mv/ref differences, 0 unfiltered),
strong + normal paths, luma and chroma, slice alpha/beta offsets, idc
0/1/2 including the idc-2 don't-cross-slice rule. Out of scope,
raising to the honest NULL row upstream: B slices, REORDERED/modified
reference lists, long-term references, CABAC P slices. (The reference
engine ships no
video decode at all — this extends coverage beyond it; with P-frame
chaining, `decode_frames` now extracts REAL pixels from full GOPs, not
just keyframes.)

Entropy tables are transcribed from ITU-T H.264 (05/2003+) Table 9-5
(coeff_token), 9-7/9-8 (total_zeros), 9-9(a) (chroma DC total_zeros) and
9-10 (run_before); tests validate every table is a prefix code, spot-pin
published worked examples, and round-trip random blocks through the
paired encoder. The fixture encoder emits conformant byte streams for
three shapes — I_PCM (exact pixels), I_16x16 with DC-only residuals, and
I_4x4 with per-block residuals — which is what the multimodal gates and
tests feed back through the decoder.

Spark-side plumbing lives in multimodal.py (`decode_frames` routes avc1
samples here via the avcC box); this module is pure per-payload kernel
code, map-only under ``mapInPandas`` — the corpus scales by partitioning
documents, never by sharing state between payloads.
"""

from __future__ import annotations

import struct

import numpy as np


class H264Error(ValueError):
    """Unsupported-feature or corrupt-stream error (subclass of ValueError
    so multimodal.DECODE_ERRORS catches it and degrades to NULL rows)."""


# ---------------------------------------------------------------------------
# Bitstream primitives
# ---------------------------------------------------------------------------


def rbsp_unescape(b: bytes) -> bytes:
    """Strip emulation-prevention bytes: 00 00 03 -> 00 00 (7.4.1).
    find()-based so clean spans copy at C speed (payloads are KBs and
    this runs once per NAL per sampled frame)."""
    out = bytearray()
    i = 0
    while True:
        j = b.find(b"\x00\x00\x03", i)
        if j == -1:
            out += b[i:]
            return bytes(out)
        out += b[i : j + 2]
        i = j + 3


def rbsp_escape(b: bytes) -> bytes:
    """Insert emulation-prevention bytes so no 00 00 0x (x<=3) run
    survives. find()-based: only zero-pair sites pay per-byte work."""
    out = bytearray()
    i = 0
    while True:
        j = b.find(b"\x00\x00", i)
        if j == -1 or j + 2 >= len(b):
            out += b[i:]
            return bytes(out)
        if b[j + 2] <= 3:
            out += b[i : j + 2]
            out.append(3)
            i = j + 2  # the protected byte re-scans (00 00 00 00 case)
        else:
            out += b[i : j + 3]
            i = j + 3


try:  # raw clip ufunc: np.clip's Python-level dispatch costs ~2.4x on
    # the 4x4/8x8 arrays the reconstruction paths clip per block
    _clip = np.core.umath.clip
except AttributeError:  # pragma: no cover - numpy >= 2.0 moved umath
    _clip = np.clip


class BitReader:
    """MSB-first bit reader with Exp-Golomb (9.1)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        """Read ``n`` MSB-first bits in ONE int.from_bytes over the
        covering byte slice (the per-bit loop was a top-5 decoder cost:
        ~n divmods + shifts per call vs one C-level conversion here)."""
        pos = self.pos
        end = pos + n
        data = self.data
        if end > len(data) << 3:
            raise H264Error("bitstream truncated")
        self.pos = end
        if n == 0:
            return 0
        b1 = (end + 7) >> 3
        return (
            int.from_bytes(data[pos >> 3 : b1], "big")
            >> ((b1 << 3) - end)
        ) & ((1 << n) - 1)

    def bit(self) -> int:
        """Single-bit fast path — the CABAC renorm/bypass hot loop calls
        this per bin; u(1)'s generic loop costs ~2x per call."""
        pos = self.pos
        byte_i = pos >> 3
        if byte_i >= len(self.data):
            raise H264Error("bitstream truncated")
        self.pos = pos + 1
        return (self.data[byte_i] >> (7 - (pos & 7))) & 1

    def flag(self) -> bool:
        return bool(self.u(1))

    def zeros_then_one(self, cap: int, err: str) -> int:
        """Count consecutive 0 bits and consume them plus the terminating
        1 bit, in ONE window read (the per-bit u(1) loop was a top-5
        decoder cost across ue() and the CAVLC level_prefix scan).
        Raises ``H264Error(err)`` once more than ``cap`` zeros precede
        the 1 and 'bitstream truncated' when the stream ends first —
        exactly the per-bit loop's error order."""
        pos = self.pos
        data = self.data
        bi = pos >> 3
        chunk = data[bi : bi + 9]
        avail = (len(chunk) << 3) - (pos & 7)
        if avail <= 0:
            raise H264Error("bitstream truncated")
        w = int.from_bytes(chunk, "big") & ((1 << avail) - 1)
        if w == 0:
            # no 1-bit in the window: either the stream ends inside it
            # (the bit loop hits end-of-data after `avail` zeros, unless
            # the cap triggers first) or >= 65 zeros follow (over any
            # cap used in this decoder)
            if bi + 9 >= len(data) and avail <= cap:
                raise H264Error("bitstream truncated")
            raise H264Error(err)
        zeros = avail - w.bit_length()
        if zeros > cap:
            raise H264Error(err)
        self.pos = pos + zeros + 1
        return zeros

    def ue(self) -> int:
        zeros = self.zeros_then_one(32, "bad exp-golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def byte_align(self, bit: int = 0) -> None:
        """Skip to the next byte boundary, checking each padding bit:
        0 for pcm_alignment_zero_bit, 1 for cabac_alignment_one_bit."""
        while self.pos % 8:
            if self.u(1) != bit:
                raise H264Error(f"alignment bit != {bit}")

    def read_aligned_bytes(self, n: int) -> bytes:
        """Bulk byte read at a byte-aligned position (the I_PCM fast
        path: 384 samples per MB would cost 3072 bit-loop iterations)."""
        if self.pos % 8:
            raise H264Error("read_aligned_bytes at unaligned position")
        start = self.pos // 8
        if start + n > len(self.data):
            raise H264Error("bitstream truncated")
        self.pos += 8 * n
        return self.data[start : start + n]

    def more_rbsp_data(self) -> bool:
        # true unless only the rbsp_stop_one_bit + zero padding remain;
        # the stop-bit position is immutable, so scan for it ONCE (this
        # is called per macroblock)
        stop = getattr(self, "_stop_bit", None)
        if stop is None:
            data = self.data.rstrip(b"\x00")
            if not data:
                stop = -1
            else:
                last_byte = data[-1]
                bit = 0
                while not (last_byte >> bit) & 1:
                    bit += 1
                stop = len(data) * 8 - 1 - bit
            self._stop_bit = stop
        return self.pos < stop


class BitWriter:
    """MSB-first bit writer (fixture encoder side).

    Internally a flushed ``bytearray`` plus <8 pending bits in a small
    int — appends are O(bits/8) instead of one Python list append per
    bit, and ``tobytes`` is a copy instead of an npO(n) packbits pass.
    ``bits`` stays available as a READ-ONLY property (tests inspect
    exact bit strings); in-writer alignment uses :meth:`byte_align`.
    """

    def __init__(self) -> None:
        self._buf = bytearray()
        self._cur = 0  # pending bits, MSB-first, self._nb of them (< 8)
        self._nb = 0

    def u(self, v: int, n: int) -> None:
        cur = (self._cur << n) | (v & ((1 << n) - 1))
        nb = self._nb + n
        buf = self._buf
        while nb >= 8:
            nb -= 8
            buf.append((cur >> nb) & 0xFF)
        self._cur = cur & ((1 << nb) - 1)
        self._nb = nb

    def put(self, bitstring: str) -> None:
        if bitstring:
            self.u(int(bitstring, 2), len(bitstring))

    def put_bytes(self, bs) -> None:
        """Bulk byte append (the I_PCM encode fast path)."""
        if self._nb == 0:
            self._buf.extend(bs)
        else:
            for v in bs:
                self.u(v, 8)

    def ue(self, v: int) -> None:
        v += 1
        n = v.bit_length()
        self.u(v, 2 * n - 1)  # n-1 leading zeros + the n-bit value

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def bit_len(self) -> int:
        return 8 * len(self._buf) + self._nb

    def byte_align(self, bit: int = 0) -> None:
        """Pad with ``bit`` to the next byte boundary (pcm_alignment_
        zero_bit / cabac_alignment_one_bit call sites)."""
        while self._nb:
            self.u(bit, 1)

    @property
    def bits(self) -> list[int]:
        """The written bit sequence as a list (read-only snapshot)."""
        out: list[int] = []
        for b in self._buf:
            out.extend((b >> i) & 1 for i in range(7, -1, -1))
        out.extend((self._cur >> i) & 1 for i in range(self._nb - 1, -1, -1))
        return out

    def rbsp_trailing(self) -> None:
        self.u(1, 1)
        self.byte_align(0)

    def tobytes(self) -> bytes:
        if self._nb == 0:
            return bytes(self._buf)
        # right-pad the last byte with 0s
        return bytes(self._buf) + bytes(((self._cur << (8 - self._nb)) & 0xFF,))


# ---------------------------------------------------------------------------
# Parameter sets (7.3.2.1 / 7.3.2.2)
# ---------------------------------------------------------------------------

_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}


def parse_sps(rbsp: bytes) -> dict:
    r = BitReader(rbsp)
    profile_idc = r.u(8)
    r.u(8)  # constraint flags + reserved
    level_idc = r.u(8)
    sps_id = r.ue()
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc != 1:
            raise H264Error(f"chroma_format_idc {chroma_format_idc} unsupported")
        if r.ue() or r.ue():  # bit depths beyond 8
            raise H264Error("bit depth > 8 unsupported")
        r.flag()  # qpprime_y_zero_transform_bypass
        if r.flag():  # seq_scaling_matrix_present
            raise H264Error("scaling matrices unsupported")
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    delta_poc_always_zero = True
    if poc_type == 0:
        log2_max_poc_lsb = r.ue() + 4
    elif poc_type == 1:
        delta_poc_always_zero = r.flag()
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
        log2_max_poc_lsb = 0
    else:
        log2_max_poc_lsb = 0
    r.ue()  # max_num_ref_frames
    r.flag()  # gaps_in_frame_num_value_allowed
    pic_width_in_mbs = r.ue() + 1
    pic_height_in_map_units = r.ue() + 1
    frame_mbs_only = r.flag()
    if not frame_mbs_only:
        raise H264Error("interlace (fields/MBAFF) unsupported")
    r.flag()  # direct_8x8_inference
    crop = (0, 0, 0, 0)
    if r.flag():  # frame_cropping
        crop = (r.ue(), r.ue(), r.ue(), r.ue())  # left right top bottom
    # corrupt offsets must fail loudly here, not produce an empty-array
    # "successful" decode downstream (crop units are 2 px in 4:2:0)
    if (2 * (crop[0] + crop[1]) >= pic_width_in_mbs * 16
            or 2 * (crop[2] + crop[3]) >= pic_height_in_map_units * 16):
        raise H264Error("SPS cropping consumes the whole frame")
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "sps_id": sps_id,
        "log2_max_frame_num": log2_max_frame_num,
        "poc_type": poc_type,
        "delta_poc_always_zero": delta_poc_always_zero,
        "log2_max_poc_lsb": log2_max_poc_lsb,
        "width_mbs": pic_width_in_mbs,
        "height_mbs": pic_height_in_map_units,
        "crop": crop,
    }


def parse_pps(rbsp: bytes) -> dict:
    r = BitReader(rbsp)
    pps_id = r.ue()
    sps_id = r.ue()
    entropy_coding_mode = r.flag()  # 0 = CAVLC, 1 = CABAC (9.3)
    bottom_field_poc = r.flag()
    num_slice_groups = r.ue() + 1
    if num_slice_groups != 1:
        raise H264Error("FMO (slice groups) unsupported")
    num_ref_l0 = r.ue() + 1  # num_ref_idx_l0_default_active_minus1
    num_ref_l1 = r.ue() + 1  # num_ref_idx_l1_default_active_minus1
    weighted_pred = r.flag()
    weighted_bipred_idc = r.u(2)
    pic_init_qp = r.se() + 26
    r.se()  # pic_init_qs
    chroma_qp_index_offset = r.se()
    deblocking_control_present = r.flag()
    constrained_intra_pred = r.flag()
    redundant_pic_cnt_present = r.flag()
    # Optional PPS extension tail (7.3.2.2, introduced with High profile).
    # parse_sps accepts High-profile CAVLC streams (4:2:0/8-bit), so this
    # tail is reachable and ignoring it would MISPARSE rather than degrade
    # (ADVICE r10): transform_8x8_mode_flag=1 changes I-slice macroblock
    # syntax (transform_size_8x8_flag per MB) and scaling matrices change
    # dequant — both refuse loudly (the documented raise-to-NULL path);
    # second_chroma_qp_index_offset only shifts the Cr QP, so it is
    # HONORED (decode + deblock read it per component). Absent tail →
    # inferred equal to chroma_qp_index_offset, as the spec requires.
    second_chroma_qp_index_offset = chroma_qp_index_offset
    if r.more_rbsp_data():
        if r.flag():
            raise H264Error("transform_8x8_mode unsupported (Baseline syntax)")
        if r.flag():
            raise H264Error("pic scaling matrices unsupported")
        second_chroma_qp_index_offset = r.se()
    return {
        "pps_id": pps_id,
        "sps_id": sps_id,
        "entropy_cabac": entropy_coding_mode,
        "bottom_field_poc": bottom_field_poc,
        "pic_init_qp": pic_init_qp,
        "chroma_qp_index_offset": chroma_qp_index_offset,
        "deblocking_control_present": deblocking_control_present,
        "constrained_intra_pred": constrained_intra_pred,
        "redundant_pic_cnt_present": redundant_pic_cnt_present,
        "second_chroma_qp_index_offset": second_chroma_qp_index_offset,
        "num_ref_idx_l0_default": num_ref_l0,
        "num_ref_idx_l1_default": num_ref_l1,
        "weighted_pred": weighted_pred,
        "weighted_bipred_idc": weighted_bipred_idc,
    }


def split_annexb(b: bytes) -> list[bytes]:
    """Annex-B byte stream -> list of NAL units (without start codes)."""
    nals, i, n = [], 0, len(b)
    starts = []
    while i + 2 < n:
        if b[i] == 0 and b[i + 1] == 0:
            if b[i + 2] == 1:
                starts.append((i, i + 3))
                i += 3
                continue
            if i + 3 < n and b[i + 2] == 0 and b[i + 3] == 1:
                starts.append((i, i + 4))
                i += 4
                continue
        i += 1
    for k, (s, payload_start) in enumerate(starts):
        end = starts[k + 1][0] if k + 1 < len(starts) else n
        nal = b[payload_start:end].rstrip(b"\x00") or b[payload_start:end]
        if nal:
            nals.append(nal)
    if not nals:
        raise H264Error("no NAL units (missing start codes)")
    return nals


def split_avcc_sample(b: bytes, nal_length_size: int) -> list[bytes]:
    """Length-prefixed MP4 sample -> list of NAL units."""
    nals, i, n = [], 0, len(b)
    while i + nal_length_size <= n:
        ln = int.from_bytes(b[i : i + nal_length_size], "big")
        i += nal_length_size
        if ln <= 0 or i + ln > n:
            raise H264Error("bad NAL length prefix")
        nals.append(b[i : i + ln])
        i += ln
    if not nals:
        raise H264Error("empty avcC sample")
    return nals


#: bounded memo of parsed avcC records: a corpus carries few distinct
#: parameter-set blobs relative to documents (the gates ~6 per family),
#: and parse_sps/parse_pps bit-walks were ~4% of the kernel profile.
#: Parsed SPS/PPS dicts are never mutated post-parse (in-band updates
#: REPLACE by-id map entries); the top-level maps are still returned as
#: fresh copies so callers that update them in place can't alias the
#: cache. Cleared at 256 entries.
_AVCC_CACHE: dict[bytes, dict] = {}


def parse_avcc(avcc: bytes) -> dict:
    """AVCDecoderConfigurationRecord (ISO 14496-15) -> SPS/PPS dicts +
    NAL length size. ALL parameter sets are kept, keyed by their ids
    (real encoders ship multiple PPS entries with e.g. different
    pic_init_qp); "sps"/"pps" remain the FIRST of each for callers that
    only need frame geometry."""
    c = _AVCC_CACHE.get(avcc)
    if c is not None:
        return {
            "sps": c["sps"],
            "pps": c["pps"],
            "sps_by_id": dict(c["sps_by_id"]),
            "pps_by_id": dict(c["pps_by_id"]),
            "nal_length_size": c["nal_length_size"],
        }
    if len(avcc) < 7 or avcc[0] != 1:
        raise H264Error("bad avcC record")
    nal_length_size = (avcc[4] & 3) + 1
    n_sps = avcc[5] & 0x1F
    i = 6
    sps_by_id: dict[int, dict] = {}
    pps_by_id: dict[int, dict] = {}
    first_sps = first_pps = None
    for _ in range(n_sps):
        ln = int.from_bytes(avcc[i : i + 2], "big")
        i += 2
        sp = parse_sps(rbsp_unescape(avcc[i + 1 : i + ln]))
        sps_by_id[sp["sps_id"]] = sp
        first_sps = first_sps or sp
        i += ln
    n_pps = avcc[i]
    i += 1
    for _ in range(n_pps):
        ln = int.from_bytes(avcc[i : i + 2], "big")
        i += 2
        pp = parse_pps(rbsp_unescape(avcc[i + 1 : i + ln]))
        pps_by_id[pp["pps_id"]] = pp
        first_pps = first_pps or pp
        i += ln
    if first_sps is None or first_pps is None:
        raise H264Error("avcC without SPS/PPS")
    if len(_AVCC_CACHE) >= 256:
        _AVCC_CACHE.clear()
    _AVCC_CACHE[bytes(avcc)] = {
        "sps": first_sps,
        "pps": first_pps,
        "sps_by_id": sps_by_id,
        "pps_by_id": pps_by_id,
        "nal_length_size": nal_length_size,
    }
    return {
        "sps": first_sps,
        "pps": first_pps,
        "sps_by_id": dict(sps_by_id),
        "pps_by_id": dict(pps_by_id),
        "nal_length_size": nal_length_size,
    }


def build_avcc(sps_nal: bytes, pps_nal: bytes, nal_length_size: int = 4,
               extra_pps: tuple = ()) -> bytes:
    """SPS/PPS NAL units (with NAL header byte) -> avcC record.
    ``extra_pps`` appends further PPS NALs (multi-parameter-set files —
    the fixture for decode_frames' by-id routing)."""
    pps_all = (pps_nal, *extra_pps)
    out = (
        bytes([1, sps_nal[1], sps_nal[2], sps_nal[3], 0xFC | (nal_length_size - 1), 0xE1])
        + struct.pack(">H", len(sps_nal)) + sps_nal
        + bytes([len(pps_all)])
    )
    for p in pps_all:
        out += struct.pack(">H", len(p)) + p
    return out


# ---------------------------------------------------------------------------
# CAVLC tables (ITU-T H.264 Tables 9-5, 9-7, 9-8, 9-9(a), 9-10)
#
# Transcription notes: VLC0 (0 <= nC < 2), the chroma-DC table and the
# nC >= 8 FLC are anchored by published worked examples (see
# tests/test_h264.py); VLC1/VLC2 are spec transcriptions validated
# structurally (prefix-free, unambiguous), by exhaustive encoder/decoder
# round-trip, AND row-by-row against a SECOND independent transcription
# of Table 9-5 that GENERATES the coeff_token prefix of test streams the
# decoder must reproduce (test_vlc1_vlc2_streams_from_independent_
# transcription_decode) — a paired mistranscription can no longer cancel
# out. Residual interop caveat: no third-party reference decoder exists
# in this container, so agreement is between two in-repo transcriptions.
# ---------------------------------------------------------------------------

# (TrailingOnes, TotalCoeff) -> codeword, per nC context
_CT_VLC0 = {
    (0, 0): "1",
    (0, 1): "000101", (1, 1): "01",
    (0, 2): "00000111", (1, 2): "000100", (2, 2): "001",
    (0, 3): "000000111", (1, 3): "00000110", (2, 3): "0000101", (3, 3): "00011",
    (0, 4): "0000000111", (1, 4): "000000110", (2, 4): "00000101", (3, 4): "000011",
    (0, 5): "00000000111", (1, 5): "0000000110", (2, 5): "000000101", (3, 5): "0000100",
    (0, 6): "0000000001111", (1, 6): "00000000110", (2, 6): "0000000101", (3, 6): "00000100",
    (0, 7): "0000000001011", (1, 7): "0000000001110", (2, 7): "00000000101", (3, 7): "000000100",
    (0, 8): "0000000001000", (1, 8): "0000000001010", (2, 8): "0000000001101", (3, 8): "0000000100",
    (0, 9): "00000000001111", (1, 9): "00000000001110", (2, 9): "0000000001001", (3, 9): "00000000100",
    (0, 10): "00000000001011", (1, 10): "00000000001010", (2, 10): "00000000001101", (3, 10): "0000000001100",
    (0, 11): "000000000001111", (1, 11): "000000000001110", (2, 11): "00000000001001", (3, 11): "00000000001100",
    (0, 12): "000000000001011", (1, 12): "000000000001010", (2, 12): "000000000001101", (3, 12): "00000000001000",
    (0, 13): "0000000000001111", (1, 13): "000000000000001", (2, 13): "000000000001001", (3, 13): "000000000001100",
    (0, 14): "0000000000001011", (1, 14): "0000000000001110", (2, 14): "0000000000001101", (3, 14): "000000000001000",
    (0, 15): "0000000000000111", (1, 15): "0000000000001010", (2, 15): "0000000000001001", (3, 15): "0000000000001100",
    (0, 16): "0000000000000100", (1, 16): "0000000000000110", (2, 16): "0000000000000101", (3, 16): "0000000000001000",
}

_CT_VLC1 = {
    (0, 0): "11",
    (0, 1): "001011", (1, 1): "10",
    (0, 2): "000111", (1, 2): "00111", (2, 2): "011",
    (0, 3): "0000111", (1, 3): "001010", (2, 3): "001001", (3, 3): "0101",
    (0, 4): "00000111", (1, 4): "000110", (2, 4): "000101", (3, 4): "0100",
    (0, 5): "00000100", (1, 5): "0000110", (2, 5): "0000101", (3, 5): "00110",
    (0, 6): "000000111", (1, 6): "00000110", (2, 6): "00000101", (3, 6): "001000",
    (0, 7): "00000001111", (1, 7): "000000110", (2, 7): "000000101", (3, 7): "000100",
    (0, 8): "00000001011", (1, 8): "00000001110", (2, 8): "00000001101", (3, 8): "0000100",
    (0, 9): "000000001111", (1, 9): "00000001010", (2, 9): "00000001001", (3, 9): "000000100",
    (0, 10): "000000001011", (1, 10): "000000001110", (2, 10): "000000001101", (3, 10): "00000001100",
    (0, 11): "000000001000", (1, 11): "000000001010", (2, 11): "000000001001", (3, 11): "00000001000",
    (0, 12): "0000000001111", (1, 12): "0000000001110", (2, 12): "0000000001101", (3, 12): "000000001100",
    (0, 13): "0000000001011", (1, 13): "0000000001010", (2, 13): "0000000001001", (3, 13): "0000000001100",
    (0, 14): "0000000000111", (1, 14): "00000000001011", (2, 14): "0000000000110", (3, 14): "0000000001000",
    (0, 15): "00000000001001", (1, 15): "00000000001000", (2, 15): "00000000001010", (3, 15): "0000000000001",
    (0, 16): "00000000000111", (1, 16): "00000000000110", (2, 16): "00000000000101", (3, 16): "00000000000100",
}

_CT_VLC2 = {
    (0, 0): "1111",
    (0, 1): "001111", (1, 1): "1110",
    (0, 2): "001011", (1, 2): "01111", (2, 2): "1101",
    (0, 3): "001000", (1, 3): "01100", (2, 3): "01110", (3, 3): "1100",
    (0, 4): "0001111", (1, 4): "01010", (2, 4): "01011", (3, 4): "1011",
    (0, 5): "0001011", (1, 5): "01000", (2, 5): "01001", (3, 5): "1010",
    (0, 6): "0001001", (1, 6): "001110", (2, 6): "001101", (3, 6): "1001",
    (0, 7): "0001000", (1, 7): "001010", (2, 7): "001001", (3, 7): "1000",
    (0, 8): "00001111", (1, 8): "0001110", (2, 8): "0001101", (3, 8): "01101",
    (0, 9): "00001011", (1, 9): "00001110", (2, 9): "0001010", (3, 9): "001100",
    (0, 10): "000001111", (1, 10): "00001010", (2, 10): "00001101", (3, 10): "0001100",
    (0, 11): "000001011", (1, 11): "000001110", (2, 11): "00001001", (3, 11): "00001100",
    (0, 12): "000001000", (1, 12): "000001010", (2, 12): "000001101", (3, 12): "00001000",
    (0, 13): "0000001101", (1, 13): "000000111", (2, 13): "000001001", (3, 13): "000001100",
    (0, 14): "0000001001", (1, 14): "0000001100", (2, 14): "0000001011", (3, 14): "0000001010",
    (0, 15): "0000000101", (1, 15): "0000001000", (2, 15): "0000000111", (3, 15): "0000000110",
    (0, 16): "0000000001", (1, 16): "0000000100", (2, 16): "0000000011", (3, 16): "0000000010",
}

_CT_CHROMA_DC = {
    (0, 0): "01",
    (0, 1): "000111", (1, 1): "1",
    (0, 2): "000100", (1, 2): "000110", (2, 2): "001",
    (0, 3): "000011", (1, 3): "0000011", (2, 3): "0000010", (3, 3): "000101",
    (0, 4): "000010", (1, 4): "00000011", (2, 4): "00000010", (3, 4): "0000000",
}

# total_zeros for 4x4 blocks (Tables 9-7 / 9-8): row = TotalCoeff, list
# index = total_zeros value
_TOTAL_ZEROS_4x4 = {
    1: ["1", "011", "010", "0011", "0010", "00011", "00010", "000011",
        "000010", "0000011", "0000010", "00000011", "00000010", "000000011",
        "000000010", "000000001"],
    2: ["111", "110", "101", "100", "011", "0101", "0100", "0011", "0010",
        "00011", "00010", "000011", "000010", "000001", "000000"],
    3: ["0101", "111", "110", "101", "0100", "0011", "100", "011", "0010",
        "00011", "00010", "000001", "00001", "000000"],
    4: ["00011", "111", "0101", "0100", "110", "101", "100", "0011", "011",
        "0010", "00010", "00001", "00000"],
    5: ["0101", "0100", "0011", "111", "110", "101", "100", "011", "0010",
        "00001", "0001", "00000"],
    6: ["000001", "00001", "111", "110", "101", "100", "011", "010", "0001",
        "001", "000000"],
    7: ["000001", "00001", "101", "100", "011", "11", "010", "0001", "001",
        "000000"],
    8: ["000001", "0001", "00001", "011", "11", "10", "010", "001", "000000"],
    9: ["000001", "000000", "0001", "11", "10", "001", "01", "00001"],
    10: ["00001", "00000", "001", "11", "10", "01", "0001"],
    11: ["0000", "0001", "001", "010", "1", "011"],
    12: ["0000", "0001", "01", "1", "001"],
    13: ["000", "001", "1", "01"],
    14: ["00", "01", "1"],
    15: ["0", "1"],
}

# total_zeros for 2x2 chroma DC (Table 9-9(a), maxNumCoeff 4)
_TOTAL_ZEROS_CDC = {
    1: ["1", "01", "001", "000"],
    2: ["1", "01", "00"],
    3: ["1", "0"],
}

# run_before (Table 9-10): key = min(zerosLeft, 7), list index = run_before
_RUN_BEFORE = {
    1: ["1", "0"],
    2: ["1", "01", "00"],
    3: ["11", "10", "01", "00"],
    4: ["11", "10", "01", "001", "000"],
    5: ["11", "10", "011", "010", "001", "000"],
    6: ["11", "000", "001", "011", "010", "101", "100"],
    7: ["111", "110", "101", "100", "011", "010", "001", "0001", "00001",
        "000001", "0000001", "00000001", "000000001", "0000000001",
        "00000000001"],
}


def _invert(table: dict | list) -> dict:
    """codeword -> value mapping for bit-at-a-time VLC decode."""
    if isinstance(table, dict):
        return {code: key for key, code in table.items()}
    return {code: i for i, code in enumerate(table)}


def _compile_codes(table: dict | list):
    """bitstring tables -> (value, length) pairs so the write path is
    one BitWriter.u instead of int(str, 2) parsing per codeword."""
    if isinstance(table, dict):
        return {k: (int(s, 2), len(s)) for k, s in table.items()}
    return [(int(s, 2), len(s)) for s in table]


_CT_VLC_W = [_compile_codes(t) for t in (_CT_VLC0, _CT_VLC1, _CT_VLC2)]
_CT_CDC_W = _compile_codes(_CT_CHROMA_DC)
_TZ4_W = {tc: _compile_codes(codes) for tc, codes in _TOTAL_ZEROS_4x4.items()}
_TZC_W = {tc: _compile_codes(codes) for tc, codes in _TOTAL_ZEROS_CDC.items()}
_RB_W = {zl: _compile_codes(codes) for zl, codes in _RUN_BEFORE.items()}

_CT_DECODE = [_invert(_CT_VLC0), _invert(_CT_VLC1), _invert(_CT_VLC2)]
_CT_CDC_DECODE = _invert(_CT_CHROMA_DC)
_TZ4_DECODE = {tc: _invert(codes) for tc, codes in _TOTAL_ZEROS_4x4.items()}
_TZC_DECODE = {tc: _invert(codes) for tc, codes in _TOTAL_ZEROS_CDC.items()}
_RB_DECODE = {zl: _invert(codes) for zl, codes in _RUN_BEFORE.items()}

_MAX_VLC_LEN = 19  # longest codeword across all tables, with margin


def _read_vlc(r: BitReader, table: dict):
    code = ""
    for _ in range(_MAX_VLC_LEN):
        code += "1" if r.u(1) else "0"
        v = table.get(code)
        if v is not None:
            return v
    raise H264Error("invalid VLC code")


def _coeff_token_read(r: BitReader, nC: int) -> tuple[int, int]:
    """-> (TrailingOnes, TotalCoeff)."""
    if nC == -1:
        return _read_vlc(r, _CT_CDC_DECODE)
    if nC >= 8:
        v = r.u(6)
        if v == 3:
            return (0, 0)
        return (v & 3, (v >> 2) + 1)
    ctx = 0 if nC < 2 else (1 if nC < 4 else 2)
    return _read_vlc(r, _CT_DECODE[ctx])


def _coeff_token_write(w: BitWriter, nC: int, t1: int, tc: int) -> None:
    if nC == -1:
        w.u(*_CT_CDC_W[(t1, tc)])
        return
    if nC >= 8:
        w.u(3 if tc == 0 else (((tc - 1) << 2) | t1), 6)
        return
    ctx = 0 if nC < 2 else (1 if nC < 4 else 2)
    w.u(*_CT_VLC_W[ctx][(t1, tc)])


def decode_residual_block(
    r: BitReader, nC: int, max_coeffs: int
) -> tuple[list[int], int]:
    """CAVLC residual block decode (9.2) -> ``(levels, total_coeff)``:
    the coefficient levels in scan order (zigzag for 4x4, raster for the
    2x2 chroma DC), length ``max_coeffs``, plus the block's TotalCoeff
    (the caller's nC bookkeeping input)."""
    t1, tc = _coeff_token_read(r, nC)
    if tc == 0:
        return [0] * max_coeffs, 0
    return _decode_levels(r, t1, tc, max_coeffs)


def _decode_levels(r: BitReader, t1: int, tc: int, max_coeffs: int):
    levels = []
    for i in range(t1):
        levels.append(-1 if r.u(1) else 1)
    suffix_len = 1 if (tc > 10 and t1 < 3) else 0
    for i in range(tc - t1):
        prefix = r.zeros_then_one(31, "bad level_prefix")
        level_code = min(15, prefix) << suffix_len
        if suffix_len > 0 or prefix >= 14:
            size = suffix_len
            if prefix == 14 and suffix_len == 0:
                size = 4
            elif prefix >= 15:
                size = prefix - 3
            if size:
                level_code += r.u(size)
        if prefix >= 15 and suffix_len == 0:
            level_code += 15
        if prefix >= 16:
            level_code += (1 << (prefix - 3)) - 4096
        if i == 0 and t1 < 3:
            level_code += 2
        level = (level_code + 2) >> 1 if level_code % 2 == 0 else -((level_code + 1) >> 1)
        levels.append(level)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    # total_zeros
    if tc < max_coeffs:
        if max_coeffs == 4:  # chroma DC
            tz = _read_vlc(r, _TZC_DECODE[tc]) if tc < 4 else 0
            if tc == 4:
                tz = 0
        else:
            tz = _read_vlc(r, _TZ4_DECODE[tc])
    else:
        tz = 0
    # run_before
    runs = []
    zeros_left = tz
    for i in range(tc - 1):
        if zeros_left > 0:
            run = _read_vlc(r, _RB_DECODE[min(zeros_left, 7)])
        else:
            run = 0
        runs.append(run)
        zeros_left -= run
    runs.append(zeros_left)  # last coefficient takes the remaining zeros
    # place coefficients: levels[0] is the HIGHEST-frequency coefficient
    coeffs = [0] * max_coeffs
    pos = tc + tz - 1  # scan index of the highest-frequency coefficient
    for lvl, run in zip(levels, runs):
        if pos < 0 or pos >= max_coeffs:
            raise H264Error("residual scan overflow")
        coeffs[pos] = lvl
        pos -= 1 + run
    return coeffs, tc


def encode_residual_block(w: BitWriter, coeffs: list[int], nC: int) -> int:
    """CAVLC residual block encode — the exact inverse of
    decode_residual_block over the same tables. ``coeffs`` in scan order.
    Returns TotalCoeff (for the caller's nC bookkeeping)."""
    max_coeffs = len(coeffs)
    nz = [(i, c) for i, c in enumerate(coeffs) if c != 0]
    tc = len(nz)
    if tc > (4 if max_coeffs == 4 else 16):
        raise H264Error("too many coefficients for CAVLC block")
    if tc == 0:
        _coeff_token_write(w, nC, 0, 0)
        return 0
    # trailing ones: up to three |1| levels at the high-frequency end
    t1 = 0
    for i in range(tc - 1, -1, -1):
        if abs(nz[i][1]) == 1 and t1 < 3:
            t1 += 1
        else:
            break
    _coeff_token_write(w, nC, t1, tc)
    rev = [c for _, c in reversed(nz)]  # highest frequency first
    if t1:
        sgn = 0
        for i in range(t1):
            sgn = (sgn << 1) | (1 if rev[i] < 0 else 0)
        w.u(sgn, t1)
    suffix_len = 1 if (tc > 10 and t1 < 3) else 0
    for i, level in enumerate(rev[t1:]):
        if level > 0:
            level_code = 2 * level - 2
        else:
            level_code = -2 * level - 1
        if i == 0 and t1 < 3:
            level_code -= 2
        _write_level(w, level_code, suffix_len)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    tz = nz[-1][0] + 1 - tc  # zeros below the highest-frequency coefficient
    if tc < max_coeffs:
        if max_coeffs == 4:
            if tc < 4:
                w.u(*_TZC_W[tc][tz])
        else:
            w.u(*_TZ4_W[tc][tz])
    zeros_left = tz
    positions = [i for i, _ in reversed(nz)]
    for k in range(tc - 1):
        run = positions[k] - positions[k + 1] - 1
        if zeros_left > 0:
            w.u(*_RB_W[min(zeros_left, 7)][run])
        zeros_left -= run
    return tc


def _write_level(w: BitWriter, level_code: int, suffix_len: int) -> None:
    """Inverse of the level_prefix/suffix read in _decode_levels: the
    decoder computes levelCode = (min(15, p) << sl) + suffix
    [+ 15 if p >= 15 and sl == 0] [+ (1 << (p-3)) - 4096 if p >= 16],
    with suffix size = sl normally, 4 when p == 14 and sl == 0, and
    p - 3 when p >= 15."""
    if suffix_len == 0:
        if level_code < 14:
            w.u(1, level_code + 1)  # prefix zeros then the 1
            return
        if level_code < 30:
            # prefix 14 (zeros + 1), then the 4-bit suffix, as one write
            w.u((1 << 4) | (level_code - 14), 19)
            return
        adjusted = level_code - 30  # decode adds min(15,p)=15 and the +15
    else:
        prefix = level_code >> suffix_len
        if prefix < 15:
            w.u((1 << suffix_len) | (level_code & ((1 << suffix_len) - 1)),
                prefix + 1 + suffix_len)
            return
        adjusted = level_code - (15 << suffix_len)
    # escape: prefix p >= 15 with (p-3)-bit suffix; p >= 16 additionally
    # adds (1 << (p-3)) - 4096, making the per-p ranges contiguous
    for p in range(15, 32):
        size = p - 3
        base = ((1 << size) - 4096) if p >= 16 else 0
        if base <= adjusted < base + (1 << size):
            w.u((1 << size) | (adjusted - base), p + 1 + size)
            return
    raise H264Error("level too large to encode")


# ---------------------------------------------------------------------------
# Transforms & dequantization (8.5)
# ---------------------------------------------------------------------------

# zigzag scan for 4x4 blocks, as (row, col) pairs (Table 8-13)
_ZZ4 = [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
        (2, 1), (3, 0), (3, 1), (2, 2), (1, 3), (2, 3), (3, 2), (3, 3)]

# normAdjust4x4 (Table 8-14, flat weight scale): V[qp%6][class]
_V = [(10, 16, 13), (11, 18, 14), (13, 20, 16),
      (14, 23, 18), (16, 25, 20), (18, 29, 23)]
# position class: 0 for both-even, 1 for both-odd, 2 mixed
_VCLS = [[0 if (r % 2 == 0 and c % 2 == 0) else 1 if (r % 2 and c % 2) else 2
          for c in range(4)] for r in range(4)]

# chroma qp mapping for qPi 30..51 (Table 8-15)
_QPC_MAP = [29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36,
            36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39]


def chroma_qp(qp_y: int, offset: int) -> int:
    qpi = max(0, min(51, qp_y + offset))
    return qpi if qpi < 30 else _QPC_MAP[qpi - 30]


# zigzag position k -> flat 4x4 index, and the per-(qp%6) dequant scale
# matrices, both precomputed once (dequant4x4 rebuilt `scale` from nested
# Python comprehensions per call — a per-block hot spot)
_ZZ_FLAT = np.array([r * 4 + c for r, c in _ZZ4], np.int64)
_DEQ_SCALE = np.array(
    [[[_V[m][_VCLS[r][c]] for c in range(4)] for r in range(4)]
     for m in range(6)],
    np.int64,
)


def _zigzag_to_mat(coeffs: list[int]) -> "np.ndarray":
    m = np.zeros(16, np.int64)
    m[_ZZ_FLAT] = coeffs
    return m.reshape(4, 4)


def dequant4x4(mat: "np.ndarray", qp: int) -> "np.ndarray":
    return (mat * _DEQ_SCALE[qp % 6]) << (qp // 6)


def _dequant_zz4x4(coeffs: list[int], qp: int) -> "np.ndarray":
    """Fused dequant4x4(_zigzag_to_mat(coeffs), qp) — one temp array."""
    m = np.zeros(16, np.int64)
    m[_ZZ_FLAT] = coeffs
    return (m.reshape(4, 4) * _DEQ_SCALE[qp % 6]) << (qp // 6)


def idct4x4(d: "np.ndarray") -> "np.ndarray":
    """Inverse 4x4 integer transform (8.5.12.2), WITHOUT the final
    (x+32)>>6 — callers round once after inserting into the prediction."""
    d = np.asarray(d, np.int64)  # no copy when already int64 (all callers)
    # horizontal
    e0 = d[:, 0] + d[:, 2]
    e1 = d[:, 0] - d[:, 2]
    e2 = (d[:, 1] >> 1) - d[:, 3]
    e3 = d[:, 1] + (d[:, 3] >> 1)
    f = np.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=1)
    # vertical
    g0 = f[0] + f[2]
    g1 = f[0] - f[2]
    g2 = (f[1] >> 1) - f[3]
    g3 = f[1] + (f[3] >> 1)
    return np.stack([g0 + g3, g1 + g2, g1 - g2, g0 - g3], axis=0)


_H4 = np.array([[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]],
               np.int64)


def luma_dc_dequant(levels: list[int], qp: int) -> "np.ndarray":
    """Intra16x16 luma DC path (8.5.10): zigzag levels -> inverse Hadamard
    -> qp-dependent scaling -> 4x4 array of per-block DC values."""
    c = _zigzag_to_mat(levels)
    f = _H4 @ c @ _H4
    a = _V[qp % 6][0]
    if qp >= 36:
        return (f * a) << (qp // 6 - 6)
    return (f * a + (1 << (5 - qp // 6))) >> (6 - qp // 6)


def chroma_dc_dequant(levels: list[int], qp: int) -> "np.ndarray":
    """2x2 chroma DC path (8.5.11): raster levels -> 2x2 Hadamard ->
    scaling -> 2x2 per-block DC values."""
    c = np.array([[levels[0], levels[1]], [levels[2], levels[3]]], np.int64)
    h = np.array([[1, 1], [1, -1]], np.int64)
    f = h @ c @ h
    return ((f * _V[qp % 6][0]) << (qp // 6)) >> 5


# ---------------------------------------------------------------------------
# Intra prediction (8.3)
# ---------------------------------------------------------------------------


def _pred4x4(mode: int, top: "np.ndarray | None", left: "np.ndarray | None",
             corner: int | None) -> "np.ndarray":
    """4x4 intra prediction (8.3.1.2). ``top`` has 8 samples (top-right
    substituted by the caller when unavailable); ``left`` has 4."""
    if mode == 0:  # Vertical
        if top is None:
            raise H264Error("pred4x4 vertical without top")
        return np.broadcast_to(top[:4], (4, 4)).copy()
    if mode == 1:  # Horizontal
        if left is None:
            raise H264Error("pred4x4 horizontal without left")
        return np.broadcast_to(left[:, None], (4, 4)).copy()
    if mode == 2:  # DC
        if top is not None and left is not None:
            v = (int(top[0]) + int(top[1]) + int(top[2]) + int(top[3])
                 + int(left.sum()) + 4) >> 3
        elif top is not None:
            v = (int(top[0]) + int(top[1]) + int(top[2]) + int(top[3])
                 + 2) >> 2
        elif left is not None:
            v = (int(left.sum()) + 2) >> 2
        else:
            v = 128
        return np.full((4, 4), v, np.int64)
    p = np.zeros((4, 4), np.int64)
    if mode == 3:  # Diagonal-Down-Left
        if top is None:
            raise H264Error("pred4x4 DDL without top")
        t = top
        for y in range(4):
            for x in range(4):
                if x == 3 and y == 3:
                    p[y, x] = (t[6] + 3 * t[7] + 2) >> 2
                else:
                    p[y, x] = (t[x + y] + 2 * t[x + y + 1] + t[x + y + 2] + 2) >> 2
        return p
    if mode == 7:  # Vertical-Left (top + substituted top-right only)
        if top is None:
            raise H264Error("pred4x4 VL without top")
        t = top
        for y in range(4):
            for x in range(4):
                i = x + (y >> 1)
                if y % 2 == 0:
                    p[y, x] = (t[i] + t[i + 1] + 1) >> 1
                else:
                    p[y, x] = (t[i] + 2 * t[i + 1] + t[i + 2] + 2) >> 2
        return p
    if mode == 8:  # Horizontal-Up (left only)
        if left is None:
            raise H264Error("pred4x4 HU without left")
        lf = left
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                if z % 2 == 0 and z < 6:
                    p[y, x] = (lf[y + (x >> 1)] + lf[y + (x >> 1) + 1] + 1) >> 1
                elif z % 2 == 1 and z < 5:
                    p[y, x] = (lf[y + (x >> 1)] + 2 * lf[y + (x >> 1) + 1]
                               + lf[y + (x >> 1) + 2] + 2) >> 2
                elif z == 5:
                    p[y, x] = (lf[2] + 3 * lf[3] + 2) >> 2
                else:
                    p[y, x] = lf[3]
        return p
    if top is None or left is None or corner is None:
        raise H264Error(f"pred4x4 mode {mode} without full neighbors")
    t, lf, c = top, left, corner
    if mode == 4:  # Diagonal-Down-Right
        # spec index -1 means the corner sample, NOT python wrap-around
        tg = lambda i: c if i < 0 else t[i]  # noqa: E731
        lg = lambda i: c if i < 0 else lf[i]  # noqa: E731
        for y in range(4):
            for x in range(4):
                if x > y:
                    p[y, x] = (tg(x - y - 2) + 2 * tg(x - y - 1) + t[x - y] + 2) >> 2
                elif x < y:
                    p[y, x] = (lg(y - x - 2) + 2 * lg(y - x - 1) + lf[y - x] + 2) >> 2
                else:
                    p[y, x] = (t[0] + 2 * c + lf[0] + 2) >> 2
        return p
    if mode == 5:  # Vertical-Right
        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    i = x - (y >> 1)
                    p[y, x] = ((c if i - 1 < 0 else t[i - 1]) + t[i] + 1) >> 1
                elif z >= 0:
                    i = x - (y >> 1)
                    a = c if i - 2 < 0 else t[i - 2]
                    b = c if i - 1 < 0 else t[i - 1]
                    p[y, x] = (a + 2 * b + t[i] + 2) >> 2
                elif z == -1:
                    p[y, x] = (lf[0] + 2 * c + t[0] + 2) >> 2
                else:
                    p[y, x] = (lf[y - 1] + 2 * lf[y - 2] + (lf[y - 3] if y - 3 >= 0 else c) + 2) >> 2
        return p
    if mode == 6:  # Horizontal-Down
        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    i = y - (x >> 1)
                    p[y, x] = ((c if i - 1 < 0 else lf[i - 1]) + lf[i] + 1) >> 1
                elif z >= 0:
                    i = y - (x >> 1)
                    a = c if i - 2 < 0 else lf[i - 2]
                    b = c if i - 1 < 0 else lf[i - 1]
                    p[y, x] = (a + 2 * b + lf[i] + 2) >> 2
                elif z == -1:
                    p[y, x] = (t[0] + 2 * c + lf[0] + 2) >> 2
                else:
                    p[y, x] = (t[x - 1] + 2 * t[x - 2] + (t[x - 3] if x - 3 >= 0 else c) + 2) >> 2
        return p
    raise H264Error(f"bad intra4x4 mode {mode}")


def _pred16x16(mode: int, top, left, corner) -> "np.ndarray":
    """16x16 luma prediction (8.3.3)."""
    if mode == 0:  # Vertical
        if top is None:
            raise H264Error("pred16 vertical without top")
        return np.broadcast_to(top, (16, 16)).copy()
    if mode == 1:  # Horizontal
        if left is None:
            raise H264Error("pred16 horizontal without left")
        return np.broadcast_to(left[:, None], (16, 16)).copy()
    if mode == 2:  # DC
        if top is not None and left is not None:
            v = (int(top.sum()) + int(left.sum()) + 16) >> 5
        elif top is not None:
            v = (int(top.sum()) + 8) >> 4
        elif left is not None:
            v = (int(left.sum()) + 8) >> 4
        else:
            v = 128
        return np.full((16, 16), v, np.int64)
    if mode == 3:  # Plane
        if top is None or left is None or corner is None:
            raise H264Error("pred16 plane without full neighbors")
        t = top.astype(np.int64)
        lf = left.astype(np.int64)
        h = sum((x + 1) * (int(t[8 + x]) - int(t[6 - x] if 6 - x >= 0 else corner))
                for x in range(8))
        v = sum((y + 1) * (int(lf[8 + y]) - int(lf[6 - y] if 6 - y >= 0 else corner))
                for y in range(8))
        a = 16 * (int(lf[15]) + int(t[15]))
        b = (5 * h + 32) >> 6
        c = (5 * v + 32) >> 6
        ys, xs = np.mgrid[0:16, 0:16]
        return _clip((a + b * (xs - 7) + c * (ys - 7) + 16) >> 5, 0, 255)
    raise H264Error(f"bad intra16x16 mode {mode}")


def _pred_chroma8x8(mode: int, top, left, corner) -> "np.ndarray":
    """8x8 chroma prediction (8.3.4): 0 DC, 1 Horizontal, 2 Vertical,
    3 Plane."""
    if mode == 1:
        if left is None:
            raise H264Error("chroma horizontal without left")
        return np.broadcast_to(left[:, None], (8, 8)).copy()
    if mode == 2:
        if top is None:
            raise H264Error("chroma vertical without top")
        return np.broadcast_to(top, (8, 8)).copy()
    if mode == 3:
        if top is None or left is None or corner is None:
            raise H264Error("chroma plane without full neighbors")
        t, lf = top.astype(np.int64), left.astype(np.int64)
        h = sum((x + 1) * (int(t[4 + x]) - int(t[2 - x] if 2 - x >= 0 else corner))
                for x in range(4))
        v = sum((y + 1) * (int(lf[4 + y]) - int(lf[2 - y] if 2 - y >= 0 else corner))
                for y in range(4))
        a = 16 * (int(lf[7]) + int(t[7]))
        b = (17 * h + 16) >> 5
        c = (17 * v + 16) >> 5
        ys, xs = np.mgrid[0:8, 0:8]
        return _clip((a + b * (xs - 3) + c * (ys - 3) + 16) >> 5, 0, 255)
    # DC: per-4x4-quadrant neighbor preferences (8.3.4.1-3). Quadrant
    # sums run over plain Python ints (tolist once) — the per-quadrant
    # numpy reductions were a profile hot spot at 4 per call.
    tl = top.tolist() if top is not None else None
    ll = left.tolist() if left is not None else None
    p = np.empty((8, 8), np.int64)
    for qy in (0, 1):
        for qx in (0, 1):
            ts = sum(tl[4 * qx : 4 * qx + 4]) if tl is not None else None
            ls = sum(ll[4 * qy : 4 * qy + 4]) if ll is not None else None
            if qx == qy:  # corner quadrants average both when available
                if ts is not None and ls is not None:
                    v = (ts + ls + 4) >> 3
                elif ts is not None:
                    v = (ts + 2) >> 2
                elif ls is not None:
                    v = (ls + 2) >> 2
                else:
                    v = 128
            elif qx == 1:  # top-right prefers top
                if ts is not None:
                    v = (ts + 2) >> 2
                elif ls is not None:
                    v = (ls + 2) >> 2
                else:
                    v = 128
            else:  # bottom-left prefers left
                if ls is not None:
                    v = (ls + 2) >> 2
                elif ts is not None:
                    v = (ts + 2) >> 2
                else:
                    v = 128
            p[4 * qy : 4 * qy + 4, 4 * qx : 4 * qx + 4] = v
    return p


# ---------------------------------------------------------------------------
# Frame decoder (I slices)
# ---------------------------------------------------------------------------

# coded_block_pattern me(v) mapping for Intra_4x4/Intra_8x8, ChromaArrayType
# 1 (Table 9-4, intra column): codeNum -> cbp
_CBP_INTRA = [47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
              16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4, 8,
              17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41]
_CBP_INTRA_INV = {v: i for i, v in enumerate(_CBP_INTRA)}

# Table 9-4, Inter column: code_num -> coded_block_pattern for P/B MBs
# (low code_nums favor the sparse patterns inter residuals produce)
_CBP_INTER = [0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
              14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
              17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41]
_CBP_INTER_INV = {v: i for i, v in enumerate(_CBP_INTER)}

# luma 4x4 block index (z-order) -> (x, y) pixel offset within the MB
_BLK_XY = [(((i >> 2) & 1) * 8 + (i & 1) * 4, (i >> 3) * 8 + ((i >> 1) & 1) * 4)
           for i in range(16)]

# z-order index of the block at each RASTER position within the MB (for
# batching the per-block mode writes into one sliced numpy assignment)
_BLK_Z2R = np.array(
    [next(i for i in range(16)
          if (_BLK_XY[i][1] // 4) * 4 + _BLK_XY[i][0] // 4 == p)
     for p in range(16)],
    np.int64,
)

# P_8x8 sub_mb_type -> sub-partition layout within the 8x8 (Table 7-17):
# (x, y, w, h) offsets, decode order
_SUB_PARTS = {
    0: [(0, 0, 8, 8)],
    1: [(0, 0, 8, 4), (0, 4, 8, 4)],
    2: [(0, 0, 4, 8), (4, 0, 4, 8)],
    3: [(0, 0, 4, 4), (4, 0, 4, 4), (0, 4, 4, 4), (4, 4, 4, 4)],
}


#: per-(wmb, hmb) prototypes of _Frame's constant-filled arrays: a
#: template .copy() is one C memcpy vs np.full's empty+broadcast-fill
#: Python round (~5x per call; _Frame.__init__ runs once per access unit
#: AND per encoder shadow — a top-10 kernel profile item). Bounded: the
#: cache clears at 64 distinct frame geometries (gates use ~6).
_FRAME_TMPL: dict = {}


def _frame_tmpl(wmb: int, hmb: int) -> dict:
    t = _FRAME_TMPL.get((wmb, hmb))
    if t is None:
        if len(_FRAME_TMPL) >= 64:
            _FRAME_TMPL.clear()
        t = {
            "cb": np.full((hmb * 8, wmb * 8), 128, np.int64),
            "blk_slice": np.full((hmb * 4, wmb * 4), -1, np.int32),
            "blk_mode": np.full((hmb * 4, wmb * 4), -1, np.int32),
            "mb_slice": np.full((hmb, wmb), -1, np.int32),
            "blk_ref": np.full((hmb * 4, wmb * 4), -2, np.int32),
            "mb_deblock": np.ones((hmb, wmb), np.int32),
        }
        _FRAME_TMPL[(wmb, hmb)] = t
    return t


class _Frame:
    """Decode state for one I-frame: planes + per-4x4-block bookkeeping."""

    def __init__(self, sps: dict):
        self.wmb, self.hmb = sps["width_mbs"], sps["height_mbs"]
        tmpl = _frame_tmpl(self.wmb, self.hmb)
        self.y = np.zeros((self.hmb * 16, self.wmb * 16), np.int64)
        self.cb = tmpl["cb"].copy()
        self.cr = tmpl["cb"].copy()
        # per-4x4 luma block: decoded flag, slice id, nnz, intra4x4 mode
        self.blk_done = np.zeros((self.hmb * 4, self.wmb * 4), bool)
        self.blk_slice = tmpl["blk_slice"].copy()
        self.blk_nnz = np.zeros((self.hmb * 4, self.wmb * 4), np.int32)
        self.blk_mode = tmpl["blk_mode"].copy()
        # per-2x2 chroma block (per component) nnz + done/slice at MB level
        self.cnnz = [np.zeros((self.hmb * 2, self.wmb * 2), np.int32)
                     for _ in range(2)]
        self.mb_done = np.zeros((self.hmb, self.wmb), bool)
        self.mb_slice = tmpl["mb_slice"].copy()
        self.mb_i4 = np.zeros((self.hmb, self.wmb), bool)  # is I_4x4 (for
        # predIntra4x4PredMode: non-I_4x4 neighbors predict DC)
        #: current slice's explicit weighted-prediction table (set per
        #: slice during decode; None = unweighted)
        self._wp: dict | None = None
        # CABAC coded_block_flag neighbor state (9.3.3.1.1.9), by block
        # position; 0 for never-decoded blocks, which the context rules
        # conflate with decoded-zero — exactly the spec's condTermFlag
        # behavior for absent transform blocks. I_PCM sets all to 1.
        # Allocated LAZILY (_ensure_cabac_state): only CABAC slices touch
        # these seven arrays, and _Frame.__init__ is a per-frame profile
        # hot spot for the CAVLC-only gates.
        self.cbf_luma = None
        self.cbf_lumadc = None
        self.cbf_cdc = None
        self.cbf_cac = None
        #: intra_chroma_pred_mode per MB (ctx 64 neighbor increment)
        self.mb_cpm = None
        #: per-MB coded_block_pattern (CABAC cbp context increments)
        self.mb_cbpl = None
        self.mb_cbpc = None
        # deblocking inputs, captured per MB at decode time (the filter
        # runs as a second pass after all slices): the MB's QPy (0 for
        # I_PCM per 8.7), the slice's disable idc and alpha/beta offsets
        self.mb_qp = np.zeros((self.hmb, self.wmb), np.int32)
        self.mb_cqpo = np.zeros((self.hmb, self.wmb), np.int32)
        # Cr's own offset (PPS second_chroma_qp_index_offset; == mb_cqpo
        # unless the PPS extension tail set it) — deblock reads per plane
        self.mb_cqpo2 = np.zeros((self.hmb, self.wmb), np.int32)
        # inter-prediction state (P slices): per-4x4-block motion vector
        # (quarter-pel) and reference index. blk_ref is the tri-state
        # availability marker the MV predictor and the deblock bS rules
        # read: -2 = not yet decoded, -1 = intra (mv treated as (0,0),
        # "different reference" per 8.4.1.3.2), >=0 = inter refIdxL0.
        self.blk_mv = np.zeros((self.hmb * 4, self.wmb * 4, 2), np.int32)
        self.blk_ref = tmpl["blk_ref"].copy()
        # list-1 motion state (B slices): ref -2 = undecoded, -1 = block
        # does not use list 1 (intra, P, or one-list B)
        self.blk_mv1 = np.zeros((self.hmb * 4, self.wmb * 4, 2), np.int32)
        self.blk_ref1 = tmpl["blk_ref"].copy()
        #: RefPicList1 for the current B picture (POC-future first)
        self.refs_l1: list = []
        #: pic_order_cnt_lsb (poc_type 0 streams; None = poc_type 2)
        self.poc_lsb: "int | None" = None
        #: full PicOrderCnt (8.2.1.1) when poc_lsb is present
        self.poc: "int | None" = None
        #: decoded reference frames' planes ({"y","cb","cr"}), most
        #: recent first — the default P RefPicList0 for an in-order
        #: no-gap stream; [] for IDR/I-only decode
        self.refs: list = []
        self.mb_deblock = tmpl["mb_deblock"].copy()
        self.mb_off_a = np.zeros((self.hmb, self.wmb), np.int32)
        self.mb_off_b = np.zeros((self.hmb, self.wmb), np.int32)

    def _ensure_cabac_state(self) -> None:
        """Allocate the CABAC neighbor-context arrays on first use (a
        CABAC slice decode/encode touching this frame)."""
        if self.cbf_luma is not None:
            return
        self.cbf_luma = np.zeros((self.hmb * 4, self.wmb * 4), np.int8)
        self.cbf_lumadc = np.zeros((self.hmb, self.wmb), np.int8)
        self.cbf_cdc = [np.zeros((self.hmb, self.wmb), np.int8)
                        for _ in range(2)]
        self.cbf_cac = [np.zeros((self.hmb * 2, self.wmb * 2), np.int8)
                        for _ in range(2)]
        self.mb_cpm = np.zeros((self.hmb, self.wmb), np.int8)
        self.mb_cbpl = np.zeros((self.hmb, self.wmb), np.int8)
        self.mb_cbpc = np.zeros((self.hmb, self.wmb), np.int8)


def _nc_luma(fr: _Frame, bx: int, by: int, slice_id: int) -> int:
    """nC for the luma 4x4 block at block coords (bx, by) (9.2.1)."""
    na = nb = None
    if bx > 0 and fr.blk_done[by, bx - 1] and fr.blk_slice[by, bx - 1] == slice_id:
        na = int(fr.blk_nnz[by, bx - 1])
    if by > 0 and fr.blk_done[by - 1, bx] and fr.blk_slice[by - 1, bx] == slice_id:
        nb = int(fr.blk_nnz[by - 1, bx])
    if na is not None and nb is not None:
        return (na + nb + 1) >> 1
    if na is not None:
        return na
    if nb is not None:
        return nb
    return 0


def _nc_chroma(fr: _Frame, comp: int, cx: int, cy: int, mbx: int, mby: int,
               slice_id: int, cur_done: list) -> int:
    """nC for a chroma AC 4x4 block at chroma-block coords (cx, cy).
    ``cur_done`` marks blocks of the CURRENT MB already decoded this MB
    (chroma blocks of one MB are decoded in raster order)."""
    def get(x, y):
        if x < 0 or y < 0:
            return None
        oy, ox = y // 2, x // 2  # owning MB
        if ox == mbx and oy == mby:
            return int(fr.cnnz[comp][y, x]) if cur_done[y % 2][x % 2] else None
        if fr.mb_done[oy, ox] and fr.mb_slice[oy, ox] == slice_id:
            return int(fr.cnnz[comp][y, x])
        return None

    na, nb = get(cx - 1, cy), get(cx, cy - 1)
    if na is not None and nb is not None:
        return (na + nb + 1) >> 1
    if na is not None:
        return na
    if nb is not None:
        return nb
    return 0


def _luma_neighbors(fr: _Frame, px: int, py: int, slice_id: int, size: int):
    """(top, left, corner) reconstructed-sample neighbors for a luma block
    at pixel (px, py); ``size`` 4 or 16. ``top`` for 4x4 blocks carries 8
    samples with the top-right substitution rule."""
    bh = fr.y.shape[0]
    bw = fr.y.shape[1]

    def blk_ok(bx, by):
        return (0 <= bx < fr.blk_done.shape[1] and 0 <= by < fr.blk_done.shape[0]
                and fr.blk_done[by, bx] and fr.blk_slice[by, bx] == slice_id)

    bx, by = px // 4, py // 4
    nblk = size // 4
    top = left = corner = None
    if py > 0 and all(blk_ok(bx + i, by - 1) for i in range(nblk)):
        top = fr.y[py - 1, px : px + size].copy()
        if size == 4:
            ext = np.empty(8, np.int64)
            ext[:4] = top
            if px + 4 < bw and blk_ok(bx + 1, by - 1):
                ext[4:] = fr.y[py - 1, px + 4 : px + 8]
            else:
                ext[4:] = top[3]
            top = ext
    if px > 0 and all(blk_ok(bx - 1, by + i) for i in range(nblk)):
        left = fr.y[py : py + size, px - 1].copy()
    if px > 0 and py > 0 and blk_ok(bx - 1, by - 1):
        corner = int(fr.y[py - 1, px - 1])
    return top, left, corner


def _chroma_neighbors(fr: _Frame, plane, px: int, py: int, mbx: int, mby: int,
                      slice_id: int):
    def mb_ok(x, y):
        return (0 <= x < fr.wmb and 0 <= y < fr.hmb and fr.mb_done[y, x]
                and fr.mb_slice[y, x] == slice_id)

    top = plane[py - 1, px : px + 8].copy() if py > 0 and mb_ok(mbx, mby - 1) else None
    left = plane[py : py + 8, px - 1].copy() if px > 0 and mb_ok(mbx - 1, mby) else None
    corner = int(plane[py - 1, px - 1]) if px > 0 and py > 0 and mb_ok(mbx - 1, mby - 1) else None
    return top, left, corner


# ---------------------------------------------------------------------------
# Inter prediction (P slices, 8.4): single-reference short-GOP subset —
# P_Skip / P_L0_16x16 / 16x8 / 8x16 partitions + intra MBs in P slices;
# P_8x8 sub-partitions, multiple/modified reference lists, weighted
# prediction and B slices raise (degrading to NULL rows upstream).
# ---------------------------------------------------------------------------


def _interp_luma_block(ref_y: "np.ndarray", x0: int, y0: int, w: int, h: int,
                       mvx: int, mvy: int) -> "np.ndarray":
    """Quarter-pel luma motion-compensated block (8.4.2.2.1): 6-tap
    [1 -5 20 20 -5 1] half-pel filter, quarter positions as averages per
    Table 8-12, out-of-frame samples edge-clamped. Vectorized over the
    whole w x h block."""
    ix, fx = mvx >> 2, mvx & 3
    iy, fy = mvy >> 2, mvy & 3
    if ref_y.dtype != np.int64:  # guard the tap arithmetic against overflow
        ref_y = ref_y.astype(np.int64)
    H, W = ref_y.shape
    r0, c0 = y0 + iy, x0 + ix
    if fx == 0 and fy == 0:
        if 0 <= r0 and r0 + h <= H and 0 <= c0 and c0 + w <= W:
            # integer MV fully inside the frame (the common case): the
            # prediction IS the reference block — return a read-only view
            # (callers assign/combine, never mutate predictions in place)
            return ref_y[r0 : r0 + h, c0 : c0 + w]
        rows = _clip(np.arange(r0, r0 + h), 0, H - 1)
        cols = _clip(np.arange(c0, c0 + w), 0, W - 1)
        return ref_y[np.ix_(rows, cols)]
    if 0 <= r0 - 2 and r0 + h + 3 <= H and 0 <= c0 - 2 and c0 + w + 3 <= W:
        # in-bounds window: basic slice (view) instead of fancy indexing
        win = ref_y[r0 - 2 : r0 + h + 3, c0 - 2 : c0 + w + 3]
    else:
        rows = _clip(np.arange(r0 - 2, r0 + h + 3), 0, H - 1)
        cols = _clip(np.arange(c0 - 2, c0 + w + 3), 0, W - 1)
        win = ref_y[np.ix_(rows, cols)]  # (h+5, w+5); G at [2,2]
    G = win[2 : 2 + h, 2 : 2 + w]

    def tap6_h(a):  # horizontal 6-tap at half position right of col c+2
        return (a[:, 0:-5] - 5 * a[:, 1:-4] + 20 * a[:, 2:-3]
                + 20 * a[:, 3:-2] - 5 * a[:, 4:-1] + a[:, 5:])

    def tap6_v(a):
        return (a[0:-5, :] - 5 * a[1:-4, :] + 20 * a[2:-3, :]
                + 20 * a[3:-2, :] - 5 * a[4:-1, :] + a[5:, :])

    clip255 = lambda a: _clip(a, 0, 255)  # noqa: E731
    # half-pel planes over one extra row/col so quarter averages that
    # reach the NEXT integer position stay in range
    b_ext = clip255((tap6_h(win[2 : 3 + h, :]) + 16) >> 5)  # (h+1, w+1)
    h_ext = clip255((tap6_v(win[:, 2 : 3 + w]) + 16) >> 5)  # (h+1, w+1)
    b = b_ext[:h, :w]
    hh = h_ext[:h, :w]
    if fy == 0:  # a, b, c
        if fx == 2:
            return b
        Gr = win[2 : 2 + h, 3 : 3 + w]
        return (G + b + 1) >> 1 if fx == 1 else (Gr + b + 1) >> 1
    if fx == 0:  # d, h, n
        if fy == 2:
            return hh
        Gd = win[3 : 3 + h, 2 : 2 + w]
        return (G + hh + 1) >> 1 if fy == 1 else (Gd + hh + 1) >> 1
    # center positions need j: vertical 6-tap intermediates (no shift),
    # then horizontal 6-tap, >> 10
    vraw = tap6_v(win)  # (h+1, w+5)
    j = clip255((tap6_h(vraw[:h, :]) + 512) >> 10)  # (h, w)
    if (fx, fy) == (2, 2):
        return j
    m = h_ext[:h, 1 : 1 + w]   # half-pel h at col+1
    s = b_ext[1 : 1 + h, :w]   # half-pel b at row+1
    if fy == 1:  # e, f, g
        other = {1: hh, 2: j, 3: m}[fx]
        return (b + other + 1) >> 1
    if fx == 1 and fy == 3:  # p
        return (hh + s + 1) >> 1
    if fx == 2 and fy == 3:  # q
        return (j + s + 1) >> 1
    if fx == 3 and fy == 2:  # k
        return (j + m + 1) >> 1
    if fx == 1 and fy == 2:  # i
        return (hh + j + 1) >> 1
    # (3, 3): r
    return (m + s + 1) >> 1


def _interp_chroma_block(ref_c: "np.ndarray", x0: int, y0: int, w: int,
                         h: int, mvx: int, mvy: int) -> "np.ndarray":
    """Eighth-pel bilinear chroma MC (8.4.2.2.2); the luma quarter-pel mv
    IS the chroma eighth-pel mv in 4:2:0. Edge-clamped."""
    ix, dx = mvx >> 3, mvx & 7
    iy, dy = mvy >> 3, mvy & 7
    if ref_c.dtype != np.int64:  # guard the bilinear arithmetic
        ref_c = ref_c.astype(np.int64)
    H, W = ref_c.shape
    r0, c0 = y0 + iy, x0 + ix
    if dx == 0 and dy == 0:
        if 0 <= r0 and r0 + h <= H and 0 <= c0 and c0 + w <= W:
            # integer-pel chroma MV inside the frame: pure copy (view;
            # callers assign/combine, never mutate predictions in place)
            return ref_c[r0 : r0 + h, c0 : c0 + w]
        rows = _clip(np.arange(r0, r0 + h), 0, H - 1)
        cols = _clip(np.arange(c0, c0 + w), 0, W - 1)
        return ref_c[np.ix_(rows, cols)]
    if 0 <= r0 and r0 + h + 1 <= H and 0 <= c0 and c0 + w + 1 <= W:
        win = ref_c[r0 : r0 + h + 1, c0 : c0 + w + 1]  # in-bounds: view
    else:
        rows = _clip(np.arange(r0, r0 + h + 1), 0, H - 1)
        cols = _clip(np.arange(c0, c0 + w + 1), 0, W - 1)
        win = ref_c[np.ix_(rows, cols)]
    A = win[:h, :w]
    B = win[:h, 1:]
    C = win[1:, :w]
    D = win[1:, 1:]
    return ((8 - dx) * (8 - dy) * A + dx * (8 - dy) * B
            + (8 - dx) * dy * C + dx * dy * D + 32) >> 6


def _mv_neighbor(fr: _Frame, bx: int, by: int, slice_id: int,
                 lst: int = 0):
    """(mv, ref, mb_available) of the 4x4 block at block coords — the
    8.4.1.3.2 neighbor fetch, per reference list. Outside the frame, not
    yet decoded, or in another slice -> mv (0,0), ref -1, unavailable;
    an INTRA block (or a B block not using this list) is available with
    ref -1 (the 'different reference' the predictor and the P_Skip rule
    treat it as)."""
    Hb, Wb = fr.blk_ref.shape
    if bx < 0 or by < 0 or bx >= Wb or by >= Hb:
        return (0, 0), -1, False
    refs = fr.blk_ref if lst == 0 else fr.blk_ref1
    mvs = fr.blk_mv if lst == 0 else fr.blk_mv1
    ref = int(refs[by, bx])
    if ref == -2 or fr.blk_slice[by, bx] != slice_id:
        return (0, 0), -1, False
    return (int(mvs[by, bx, 0]), int(mvs[by, bx, 1])), ref, True


def _mv_pred(fr: _Frame, mbx: int, mby: int, ox: int, oy: int, w: int,
             h: int, slice_id: int, shortcut: str | None = None,
             ref_idx: int = 0, lst: int = 0):
    """Motion vector predictor for the partition at luma offset (ox, oy),
    size w x h (8.4.1.3): directional shortcut for 16x8/8x16 when the
    neighbor's reference matches the partition's ``ref_idx``, else the
    exactly-one-matching-reference rule, else the component median; mvA
    alone when B/C/D are all unavailable."""
    bx0, by0 = (mbx * 16 + ox) // 4, (mby * 16 + oy) // 4
    a_mv, a_ref, a_av = _mv_neighbor(fr, bx0 - 1, by0, slice_id, lst)
    b_mv, b_ref, b_av = _mv_neighbor(fr, bx0, by0 - 1, slice_id, lst)
    c_mv, c_ref, c_av = _mv_neighbor(fr, bx0 + w // 4, by0 - 1, slice_id, lst)
    if not c_av:  # C unavailable -> D (above-left)
        c_mv, c_ref, c_av = _mv_neighbor(fr, bx0 - 1, by0 - 1, slice_id, lst)
    if shortcut == "B" and b_ref == ref_idx:
        return b_mv
    if shortcut == "A" and a_ref == ref_idx:
        return a_mv
    if shortcut == "C" and c_ref == ref_idx:
        return c_mv
    if a_av and not b_av and not c_av:
        return a_mv
    matches = [mv for mv, ref in ((a_mv, a_ref), (b_mv, b_ref), (c_mv, c_ref))
               if ref == ref_idx]
    if len(matches) == 1:
        return matches[0]
    # component-wise 3-value median without the numpy call overhead
    x0, x1, x2 = a_mv[0], b_mv[0], c_mv[0]
    y0, y1, y2 = a_mv[1], b_mv[1], c_mv[1]
    return (
        x0 + x1 + x2 - min(x0, x1, x2) - max(x0, x1, x2),
        y0 + y1 + y2 - min(y0, y1, y2) - max(y0, y1, y2),
    )


def _skip_mv(fr: _Frame, mbx: int, mby: int, slice_id: int):
    """P_Skip motion vector (8.4.1.1): the 16x16 predictor, forced to
    (0,0) when mbA/mbB is unavailable or either has ref0 zero-mv."""
    bx0, by0 = mbx * 4, mby * 4
    a_mv, a_ref, a_av = _mv_neighbor(fr, bx0 - 1, by0, slice_id)
    b_mv, b_ref, b_av = _mv_neighbor(fr, bx0, by0 - 1, slice_id)
    if not a_av or not b_av:
        return (0, 0)
    if (a_ref == 0 and a_mv == (0, 0)) or (b_ref == 0 and b_mv == (0, 0)):
        return (0, 0)
    return _mv_pred(fr, mbx, mby, 0, 0, 16, 16, slice_id)


def _wp_apply(x: "np.ndarray", w: int, o: int, logwd: int) -> "np.ndarray":
    """Explicit weighted-prediction sample transform (8.4.2.3.2,
    single-direction P): scale, round at the denom, offset, clip."""
    if logwd >= 1:
        return _clip(((x * w + (1 << (logwd - 1))) >> logwd) + o, 0, 255)
    return _clip(x * w + o, 0, 255)


def _mc_pred(ref: dict, px: int, py: int, w: int, h: int, mv: tuple):
    """(pred_y, pred_cb, pred_cr) for one partition from one reference
    picture — the unweighted interpolation chain, shared by the P write
    path and the B one/two-list combiner."""
    pred_y = _interp_luma_block(ref["y"], px, py, w, h, mv[0], mv[1])
    cxp, cyp, cw, ch = px // 2, py // 2, w // 2, h // 2
    pred_cb = _interp_chroma_block(ref["cb"], cxp, cyp, cw, ch, mv[0], mv[1])
    pred_cr = _interp_chroma_block(ref["cr"], cxp, cyp, cw, ch, mv[0], mv[1])
    return pred_y, pred_cb, pred_cr


def _mc_partition(fr: _Frame, mbx: int, mby: int, ox: int, oy: int,
                  w: int, h: int, mv: tuple, slice_id: int,
                  ref_idx: int = 0) -> None:
    """Motion-compensate one partition from ``fr.refs[ref_idx]`` into the
    frame planes (applying the slice's explicit weighted prediction when
    present) and record (mv, ref_idx) on its 4x4 blocks."""
    ref = fr.refs[ref_idx]
    px, py = mbx * 16 + ox, mby * 16 + oy
    wp = fr._wp
    pred_y, pred_cb, pred_cr = _mc_pred(ref, px, py, w, h, mv)
    if wp is not None:
        lw, lo = wp["luma"][ref_idx]
        pred_y = _wp_apply(pred_y, lw, lo, wp["logwd_l"])
    fr.y[py : py + h, px : px + w] = pred_y
    cxp, cyp, cw, ch = px // 2, py // 2, w // 2, h // 2
    for comp, (refp, pred_c) in enumerate(
            ((fr.cb, pred_cb), (fr.cr, pred_cr))):
        if wp is not None:
            cwt, cof = wp["chroma"][ref_idx][comp]
            pred_c = _wp_apply(pred_c, cwt, cof, wp["logwd_c"])
        refp[cyp : cyp + ch, cxp : cxp + cw] = pred_c
    bx0, by0 = px // 4, py // 4
    fr.blk_mv[by0 : by0 + h // 4, bx0 : bx0 + w // 4] = mv
    fr.blk_ref[by0 : by0 + h // 4, bx0 : bx0 + w // 4] = ref_idx
    fr.blk_ref1[by0 : by0 + h // 4, bx0 : bx0 + w // 4] = -1  # P: no L1
    fr.blk_slice[by0 : by0 + h // 4, bx0 : bx0 + w // 4] = slice_id


def _finish_inter_mb(fr: _Frame, mbx: int, mby: int, slice_id: int,
                     qp: int) -> None:
    bx0, by0 = mbx * 4, mby * 4
    fr.blk_done[by0 : by0 + 4, bx0 : bx0 + 4] = True
    fr.mb_done[mby, mbx] = True
    fr.mb_qp[mby, mbx] = qp


def _decode_p_skip(fr: _Frame, mb: int, slice_id: int, qp: int) -> None:
    mbx, mby = mb % fr.wmb, mb // fr.wmb
    fr.mb_slice[mby, mbx] = slice_id
    mv = _skip_mv(fr, mbx, mby, slice_id)
    _mc_partition(fr, mbx, mby, 0, 0, 16, 16, mv, slice_id)
    bx0, by0 = mbx * 4, mby * 4
    fr.blk_nnz[by0 : by0 + 4, bx0 : bx0 + 4] = 0
    for comp in range(2):
        fr.cnnz[comp][mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 0
    _finish_inter_mb(fr, mbx, mby, slice_id, qp)
    fr._last_qp = qp




def _inter_residual_tail(fr: _Frame, r: BitReader, pps: dict, mb: int,
                         slice_id: int, qp: int) -> None:
    """CBP + residual decode/add for a non-skip inter MB (7.3.5 tail) —
    shared by the P partition types and the B 16x16 types: the residual
    syntax and reconstruction are list-independent."""
    mbx, mby = mb % fr.wmb, mb // fr.wmb
    px, py = mbx * 16, mby * 16
    cx, cy = mbx * 8, mby * 8
    code_num = r.ue()
    if code_num > 47:
        raise H264Error("bad coded_block_pattern code")
    cbp = _CBP_INTER[code_num]
    cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
    if cbp_chroma > 2:
        raise H264Error("bad chroma cbp")
    if cbp_luma or cbp_chroma:
        qp = (qp + r.se() + 52) % 52
    fr._last_qp = qp
    luma_coeffs, chroma_dc, chroma_ac = _decode_residuals(
        fr, r, mbx, mby, slice_id, cbp_luma, cbp_chroma, i16=False
    )
    for i in range(16):
        if luma_coeffs[i] is None:
            continue
        ox, oy = _BLK_XY[i]
        d = _dequant_zz4x4(luma_coeffs[i], qp)
        blk = (fr.y[py + oy : py + oy + 4, px + ox : px + ox + 4]
               + ((idct4x4(d) + 32) >> 6))
        fr.y[py + oy : py + oy + 4, px + ox : px + ox + 4] = _clip(blk, 0, 255)
    preds = (
        fr.cb[cy : cy + 8, cx : cx + 8].copy(),
        fr.cr[cy : cy + 8, cx : cx + 8].copy(),
    )
    _add_chroma_residual(fr, pps, qp, cx, cy, preds, chroma_dc, chroma_ac,
                         cbp_chroma)
    _finish_inter_mb(fr, mbx, mby, slice_id, qp)


#: Table 7-14 B macroblock types 1-21: (partition shape, per-partition
#: prediction modes). 0 = B_Direct (refused), 22 = B_8x8 (refused),
#: 23+ = intra.
_B_MB_TYPES = {
    1: ("16x16", ("l0",)),
    2: ("16x16", ("l1",)),
    3: ("16x16", ("bi",)),
    4: ("16x8", ("l0", "l0")),
    5: ("8x16", ("l0", "l0")),
    6: ("16x8", ("l1", "l1")),
    7: ("8x16", ("l1", "l1")),
    8: ("16x8", ("l0", "l1")),
    9: ("8x16", ("l0", "l1")),
    10: ("16x8", ("l1", "l0")),
    11: ("8x16", ("l1", "l0")),
    12: ("16x8", ("l0", "bi")),
    13: ("8x16", ("l0", "bi")),
    14: ("16x8", ("l1", "bi")),
    15: ("8x16", ("l1", "bi")),
    16: ("16x8", ("bi", "l0")),
    17: ("8x16", ("bi", "l0")),
    18: ("16x8", ("bi", "l1")),
    19: ("8x16", ("bi", "l1")),
    20: ("16x8", ("bi", "bi")),
    21: ("8x16", ("bi", "bi")),
}

#: partition rectangles + the 8.4.1.3 directional mvp shortcuts (same
#: geometry as the P path)
_B_PART_RECTS = {
    "16x16": [(0, 0, 16, 16, None)],
    "16x8": [(0, 0, 16, 8, "B"), (0, 8, 16, 8, "A")],
    "8x16": [(0, 0, 8, 16, "A"), (8, 0, 8, 16, "C")],
}


def _decode_mb_inter_b(fr: _Frame, r: BitReader, pps: dict, mb: int,
                       slice_id: int, qp: int, btype: int,
                       n_ref0: int = 1, n_ref1: int = 1) -> None:
    """B inter macroblock types 1-21 (Table 7-14): 16x16 / 16x8 / 8x16
    partitions, each predicted from L0, L1 or both. Syntax per 7.3.5.1:
    ALL ref_idx_l0 (partitions using l0, in order), ALL ref_idx_l1, ALL
    mvd_l0, ALL mvd_l1 — per-list median/directional MV prediction
    (8.4.1.3 over that list's neighbor motion; a partition not using a
    list records ref -1 there, the 'not available for this list' state
    later predictors see), one- or two-list motion compensation with
    the DEFAULT bi-predictive average (8.4.2.3.2 — weighted bipred
    refuses at the slice header), then the shared inter residual tail.
    B_Direct/B_Skip and B_8x8 refuse upstream."""
    mbx, mby = mb % fr.wmb, mb // fr.wmb
    fr.mb_slice[mby, mbx] = slice_id
    shape, modes = _B_MB_TYPES[btype]
    parts = _B_PART_RECTS[shape]
    uses0 = [m in ("l0", "bi") for m in modes]
    uses1 = [m in ("l1", "bi") for m in modes]

    def read_ref(n: int, refs: list) -> int:
        if n <= 1:
            return 0
        ri = (1 - r.u(1)) if n == 2 else r.ue()
        if ri >= n or ri >= len(refs):
            raise H264Error(f"ref_idx {ri} outside the reference list")
        return ri

    ri0 = [read_ref(n_ref0, fr.refs) if u else -1 for u in uses0]
    ri1 = [read_ref(n_ref1, fr.refs_l1) if u else -1 for u in uses1]
    mv0: list = [None] * len(parts)
    mv1: list = [None] * len(parts)
    for lst, uses, ris, mvs, blk_mv, blk_ref in (
        (0, uses0, ri0, mv0, fr.blk_mv, fr.blk_ref),
        (1, uses1, ri1, mv1, fr.blk_mv1, fr.blk_ref1),
    ):
        for k, (ox, oy, w, h, sc) in enumerate(parts):
            bx = (mbx * 16 + ox) // 4
            by = (mby * 16 + oy) // 4
            if uses[k]:
                mvd = (r.se(), r.se())
                mvp = _mv_pred(fr, mbx, mby, ox, oy, w, h, slice_id,
                               shortcut=sc, ref_idx=ris[k], lst=lst)
                mvs[k] = (mvp[0] + mvd[0], mvp[1] + mvd[1])
                blk_mv[by : by + h // 4, bx : bx + w // 4] = mvs[k]
            blk_ref[by : by + h // 4, bx : bx + w // 4] = ris[k]
            fr.blk_slice[by : by + h // 4, bx : bx + w // 4] = slice_id
    for k, (ox, oy, w, h, _sc) in enumerate(parts):
        px, py = mbx * 16 + ox, mby * 16 + oy
        preds = []
        if uses0[k]:
            preds.append(_mc_pred(fr.refs[ri0[k]], px, py, w, h, mv0[k]))
        if uses1[k]:
            preds.append(_mc_pred(fr.refs_l1[ri1[k]], px, py, w, h, mv1[k]))
        if len(preds) == 2:
            y = (preds[0][0] + preds[1][0] + 1) >> 1
            cb = (preds[0][1] + preds[1][1] + 1) >> 1
            cr = (preds[0][2] + preds[1][2] + 1) >> 1
        else:
            y, cb, cr = preds[0]
        fr.y[py : py + h, px : px + w] = y
        cxp, cyp, cw, ch = px // 2, py // 2, w // 2, h // 2
        fr.cb[cyp : cyp + ch, cxp : cxp + cw] = cb
        fr.cr[cyp : cyp + ch, cxp : cxp + cw] = cr
    _inter_residual_tail(fr, r, pps, mb, slice_id, qp)


def _decode_mb_inter(fr: _Frame, r: BitReader, pps: dict, mb: int,
                     slice_id: int, qp: int, ptype: int,
                     n_ref: int = 1) -> None:
    mbx, mby = mb % fr.wmb, mb // fr.wmb
    px, py = mbx * 16, mby * 16
    cx, cy = mbx * 8, mby * 8
    fr.mb_slice[mby, mbx] = slice_id
    if ptype > 4:
        raise H264Error(f"bad P mb_type {ptype}")

    def read_ref():
        """ref_idx_l0: te(v) against n_ref-1 — absent (inferred 0) when
        the active list holds one picture (7.3.5.1)."""
        if n_ref <= 1:
            return 0
        ri = (1 - r.u(1)) if n_ref == 2 else r.ue()
        if ri >= n_ref or ri >= len(fr.refs):
            raise H264Error(f"ref_idx_l0 {ri} outside the reference list")
        return ri

    # Syntax order (7.3.5.1 / 7.3.5.2): ALL ref_idx_l0 first, THEN all
    # mvd_l0 in the same (sub-)partition decode order
    if ptype >= 3:  # P_8x8 / P_8x8ref0: per-8x8 sub_mb_type
        subtypes = []
        for _ in range(4):
            st = r.ue()
            if st > 3:
                raise H264Error(f"bad sub_mb_type {st}")
            subtypes.append(st)
        # P_8x8ref0 (mb_type 4) infers every ref_idx as 0
        refs8 = [0] * 4 if ptype == 4 else [read_ref() for _ in range(4)]
        for k in range(4):
            ox8, oy8 = (k % 2) * 8, (k // 2) * 8
            for sox, soy, w, h in _SUB_PARTS[subtypes[k]]:
                mvd = (r.se(), r.se())
                mvp = _mv_pred(fr, mbx, mby, ox8 + sox, oy8 + soy, w, h,
                               slice_id, ref_idx=refs8[k])
                _mc_partition(fr, mbx, mby, ox8 + sox, oy8 + soy, w, h,
                              (mvp[0] + mvd[0], mvp[1] + mvd[1]), slice_id,
                              ref_idx=refs8[k])
    else:
        parts = {
            0: [(0, 0, 16, 16, None)],
            1: [(0, 0, 16, 8, "B"), (0, 8, 16, 8, "A")],
            2: [(0, 0, 8, 16, "A"), (8, 0, 8, 16, "C")],
        }[ptype]
        prefs = [read_ref() for _ in parts]
        for (ox, oy, w, h, sc), ri in zip(parts, prefs):
            mvd = (r.se(), r.se())
            mvp = _mv_pred(fr, mbx, mby, ox, oy, w, h, slice_id,
                           shortcut=sc, ref_idx=ri)
            mv = (mvp[0] + mvd[0], mvp[1] + mvd[1])
            # written before the next partition predicts: the second
            # 16x8/8x16 partition's A/B/C neighbors may be the first
            _mc_partition(fr, mbx, mby, ox, oy, w, h, mv, slice_id,
                          ref_idx=ri)
    _inter_residual_tail(fr, r, pps, mb, slice_id, qp)


def _decode_slice(fr: "_Frame | None", rbsp: bytes, sps_map: dict,
                  pps_map: dict, slice_id: int, idr: bool,
                  ref_idc: int, refs: list | None = None,
                  poc_ctx: dict | None = None) -> _Frame:
    r = BitReader(rbsp)
    first_mb = r.ue()
    slice_type = r.ue()
    st = slice_type % 5
    if st not in (0, 1, 2):
        raise H264Error(f"unsupported slice_type {slice_type} (I/P/B only)")
    is_p = st == 0
    is_b = st == 1
    if (is_p or is_b) and idr:
        raise H264Error("inter slice in an IDR access unit")
    pps_id = r.ue()
    pps = pps_map.get(pps_id)
    if pps is None:
        raise H264Error(f"slice references unknown PPS {pps_id}")
    sps = sps_map.get(pps["sps_id"])
    if sps is None:
        raise H264Error(f"PPS references unknown SPS {pps['sps_id']}")
    if fr is None:
        fr = _Frame(sps)
        fr.sps = sps
        fr.refs = refs or []
    elif (fr.wmb, fr.hmb) != (sps["width_mbs"], sps["height_mbs"]):
        raise H264Error("slice SPS disagrees with frame geometry")
    fn = r.u(sps["log2_max_frame_num"])  # frame_num (7.4.3)
    if getattr(fr, "frame_num", None) is None:
        fr.frame_num = fn
        fr.is_ref = ref_idc != 0  # nal_ref_idc != 0 -> reference picture
    elif fr.frame_num != fn or fr.is_ref != (ref_idc != 0):
        raise H264Error(
            "slices of one picture disagree on frame_num/nal_ref_idc")
    if idr:
        r.ue()  # idr_pic_id
    if sps["poc_type"] == 0:
        poc_lsb = r.u(sps["log2_max_poc_lsb"])
        if fr.poc_lsb is None:
            fr.poc_lsb = poc_lsb
            # 8.2.1.1: msb wrap against the previous reference picture's
            # (msb, lsb) — supplied by the GOP walk; a bare access-unit
            # decode (no ctx) reads the lsb as the POC, which is exact
            # for streams that never wrap
            max_lsb = 1 << sps["log2_max_poc_lsb"]
            if idr or poc_ctx is None:
                fr.poc = poc_lsb
            else:
                pm = poc_ctx.get("prev_msb", 0)
                pl = poc_ctx.get("prev_lsb", 0)
                if poc_lsb < pl and pl - poc_lsb >= max_lsb // 2:
                    msb = pm + max_lsb
                elif poc_lsb > pl and poc_lsb - pl > max_lsb // 2:
                    msb = pm - max_lsb
                else:
                    msb = pm
                fr.poc = msb + poc_lsb
        elif fr.poc_lsb != poc_lsb:
            raise H264Error("slices of one picture disagree on poc_lsb")
        if pps["bottom_field_poc"]:
            r.se()  # delta_pic_order_cnt_bottom
    elif sps["poc_type"] == 1 and not sps["delta_poc_always_zero"]:
        r.se()  # delta_pic_order_cnt[0]
        if pps["bottom_field_poc"]:
            r.se()  # delta_pic_order_cnt[1]
    if pps["redundant_pic_cnt_present"]:
        r.ue()
    if pps["entropy_cabac"] and (is_p or is_b):
        # CABAC inter slices need the inter context families (mb_skip,
        # mvd, ref_idx, sub_mb_type) — not implemented; degrade to NULLs
        raise H264Error("CABAC inter slices unsupported (CABAC I only)")
    n_ref = 1
    n_ref1 = 1
    fr._wp = None  # per-slice explicit weighted-prediction table
    if is_b:
        # B-slice contract (bounded, loud): default POC-split reference
        # lists (8.2.4.2.3 short-term initialization — no reordering),
        # default bi-prediction only, no direct/skip modes, deblocking
        # off (bS over two-list motion is not implemented)
        if not fr.refs:
            raise H264Error("B slice without reference frames")
        if fr.poc_lsb is None or fr.poc is None:
            raise H264Error("B slice requires SPS poc_type 0")
        if any("poc" not in rf or rf["poc"] is None for rf in fr.refs):
            raise H264Error("B slice needs POC-tagged reference pictures")
        if pps["constrained_intra_pred"]:
            raise H264Error("constrained intra in B slices unsupported")
        if pps["weighted_bipred_idc"] != 0:
            raise H264Error("weighted bi-prediction unsupported "
                            "(default average only)")
        # 8.2.4.2.3: L0 = past by POC descending then future ascending;
        # L1 = future ascending then past descending
        past = sorted((rf for rf in fr.refs if rf["poc"] < fr.poc),
                      key=lambda rf: -rf["poc"])
        fut = sorted((rf for rf in fr.refs if rf["poc"] > fr.poc),
                     key=lambda rf: rf["poc"])
        fr.refs = past + fut
        fr.refs_l1 = fut + past
        if not fr.refs_l1:
            raise H264Error("B slice with an empty RefPicList1")
        r.flag()  # direct_spatial_mv_pred_flag (direct modes refuse)
        n_ref = pps["num_ref_idx_l0_default"]
        n_ref1 = pps["num_ref_idx_l1_default"]
        if r.flag():  # num_ref_idx_active_override
            n_ref = r.ue() + 1
            n_ref1 = r.ue() + 1
        if n_ref > 16 or n_ref1 > 16:
            raise H264Error("bad num_ref_idx_active")
        if r.flag():  # ref_pic_list_modification_flag_l0
            raise H264Error("ref pic list modification unsupported")
        if r.flag():  # ref_pic_list_modification_flag_l1
            raise H264Error("ref pic list modification unsupported")
    if is_p:
        # short-GOP contract: the DEFAULT reference list over in-order
        # past frames (most recent first), unreordered — reordering
        # raises and degrades to the honest NULL row upstream
        if not fr.refs:
            raise H264Error("P slice without a reference frame")
        if pps["constrained_intra_pred"]:
            raise H264Error("constrained intra in P slices unsupported")
        n_ref = pps["num_ref_idx_l0_default"]
        if r.flag():  # num_ref_idx_active_override
            n_ref = r.ue() + 1
        if n_ref > 16:
            raise H264Error(f"bad num_ref_idx_l0_active {n_ref}")
        if r.flag():  # ref_pic_list_modification_flag_l0
            raise H264Error("ref pic list modification unsupported")
        if pps["weighted_pred"]:
            # pred_weight_table (7.3.3.2): explicit per-reference
            # luma/chroma weights + offsets; absent flags default to the
            # identity weight (1 << logWD, offset 0)
            logwd_l = r.ue()
            logwd_c = r.ue()
            if logwd_l > 7 or logwd_c > 7:
                raise H264Error("bad weight denom")
            luma, chroma = [], []
            for _ in range(n_ref):
                if r.flag():
                    luma.append((r.se(), r.se()))
                else:
                    luma.append((1 << logwd_l, 0))
                if r.flag():
                    cb = (r.se(), r.se())
                    cr = (r.se(), r.se())
                    chroma.append((cb, cr))
                else:
                    chroma.append(((1 << logwd_c, 0), (1 << logwd_c, 0)))
            fr._wp = {"logwd_l": logwd_l, "logwd_c": logwd_c,
                      "luma": luma, "chroma": chroma}
    # dec_ref_pic_marking is present only for REFERENCE pictures
    # (nal_ref_idc != 0, 7.3.3) — a disposable coded I slice omits it
    if ref_idc != 0:
        if idr:
            r.flag()  # no_output_of_prior_pics
            r.flag()  # long_term_reference
        else:
            if r.flag():  # adaptive_ref_pic_marking
                raise H264Error("adaptive ref pic marking unsupported")
    qp = pps["pic_init_qp"] + r.se()
    # deblocking parameters: idc 0 = filter all edges (the default when
    # the PPS carries no control flag), 1 = off, 2 = all but slice edges
    disable_deblock, off_a, off_b = 0, 0, 0
    if pps["deblocking_control_present"]:
        disable_deblock = r.ue()
        if disable_deblock > 2:
            raise H264Error("bad disable_deblocking_filter_idc")
        if disable_deblock != 1:
            off_a = 2 * r.se()
            off_b = 2 * r.se()
    if is_b and disable_deblock != 1:
        # 8.7.2.1 bS for B edges compares BOTH lists' refs/mvs — not
        # implemented; filtering with L0-only state would be silently
        # wrong, so a filtering B slice refuses instead
        raise H264Error("deblocking in B slices unsupported")
    n_mbs = fr.wmb * fr.hmb

    def mb_slice_params(m):
        mx, my = m % fr.wmb, m // fr.wmb
        fr.mb_deblock[my, mx] = disable_deblock
        fr.mb_off_a[my, mx] = off_a
        fr.mb_off_b[my, mx] = off_b
        fr.mb_cqpo[my, mx] = pps["chroma_qp_index_offset"]
        fr.mb_cqpo2[my, mx] = pps["second_chroma_qp_index_offset"]

    mb = first_mb
    if pps["entropy_cabac"]:
        # 7.3.4: cabac_alignment_one_bit padding, then arithmetic-coded
        # macroblock layer with a Terminate-coded end_of_slice_flag per MB
        r.byte_align(bit=1)
        cd = CabacDecoder(r, qp)
        while True:
            if mb >= n_mbs:
                raise H264Error("slice overruns frame")
            _decode_mb_cabac(fr, cd, sps, pps, mb, slice_id, qp)
            qp = fr._last_qp
            mb_slice_params(mb)
            mb += 1
            if cd.decode_terminate():  # end_of_slice_flag
                break
        return fr
    if not is_p and not is_b:
        while True:
            if mb >= n_mbs:
                raise H264Error("slice overruns frame")
            _decode_mb(fr, r, sps, pps, mb, slice_id, qp)
            qp = fr._last_qp  # mb_qp_delta accumulates across the slice
            mb_slice_params(mb)
            mb += 1
            if not r.more_rbsp_data():
                break
        return fr
    # P/B slice MB loop (7.3.4): a skip RUN precedes each coded MB; a
    # trailing run may carry to the end of the slice. In B slices a
    # skipped MB is B_Skip (direct-mode inference) — unsupported.
    while True:
        skip_run = r.ue()
        if is_b and skip_run:
            raise H264Error("B_Skip (direct mode) unsupported")
        for _ in range(skip_run):
            if mb >= n_mbs:
                raise H264Error("skip run overruns frame")
            _decode_p_skip(fr, mb, slice_id, qp)
            mb_slice_params(mb)
            mb += 1
        if not r.more_rbsp_data():
            break
        if mb >= n_mbs:
            raise H264Error("slice overruns frame")
        _decode_mb(fr, r, sps, pps, mb, slice_id, qp, is_p=is_p,
                   n_ref=n_ref, is_b=is_b, n_ref1=n_ref1)
        qp = fr._last_qp
        mb_slice_params(mb)
        mb += 1
        if not r.more_rbsp_data():
            break
    return fr


def _decode_residuals(fr: _Frame, r: BitReader, mbx: int, mby: int,
                      slice_id: int, cbp_luma: int, cbp_chroma: int,
                      i16: bool):
    """CAVLC residual entropy for one MB (shared by the intra and inter
    paths): per-4x4 luma blocks in z-order per cbp quadrant (AC-only for
    I_16x16), chroma DC pair, chroma AC grid. Updates the nC bookkeeping
    (blk_nnz/blk_done/cnnz) as each block's TotalCoeff is known."""
    luma_coeffs = [None] * 16
    bx0, by0 = mbx * 4, mby * 4
    # Batched bookkeeping (exact): the whole MB's done/slice flags and a
    # zero nnz base are written in three sliced ops instead of 48 scalar
    # numpy writes. Safe because _nc_luma only probes the A/B neighbors,
    # which in z-order always PRECEDE the probing block — their nnz is
    # already final by the time it is read — and non-coded blocks' nnz
    # stays the 0 written here.
    fr.blk_done[by0 : by0 + 4, bx0 : bx0 + 4] = True
    fr.blk_slice[by0 : by0 + 4, bx0 : bx0 + 4] = slice_id
    fr.blk_nnz[by0 : by0 + 4, bx0 : bx0 + 4] = 0
    if cbp_luma:
        for i in range(16):
            if not (cbp_luma & (1 << (i // 4))):
                continue
            bx = bx0 + _BLK_XY[i][0] // 4
            by = by0 + _BLK_XY[i][1] // 4
            nc = _nc_luma(fr, bx, by, slice_id)
            if i16:
                ac, tc = decode_residual_block(r, nc, 15)
                luma_coeffs[i] = [0] + ac
            else:
                full, tc = decode_residual_block(r, nc, 16)
                luma_coeffs[i] = full
            fr.blk_nnz[by, bx] = tc
    chroma_dc = [[0] * 4, [0] * 4]
    if cbp_chroma & 3:
        for comp in range(2):
            chroma_dc[comp], _ = decode_residual_block(r, -1, 4)
    chroma_ac = [[None] * 4, [None] * 4]
    cx0, cy0 = mbx * 2, mby * 2
    if cbp_chroma == 2:
        for comp in range(2):
            done = [[False, False], [False, False]]
            for j in range(4):  # raster within the 2x2 chroma block grid
                bx2, by2 = cx0 + j % 2, cy0 + j // 2
                nc = _nc_chroma(fr, comp, bx2, by2, mbx, mby, slice_id, done)
                ac, tc = decode_residual_block(r, nc, 15)
                chroma_ac[comp][j] = [0] + ac
                fr.cnnz[comp][by2, bx2] = tc
                done[j // 2][j % 2] = True
    else:
        fr.cnnz[0][cy0 : cy0 + 2, cx0 : cx0 + 2] = 0
        fr.cnnz[1][cy0 : cy0 + 2, cx0 : cx0 + 2] = 0
    return luma_coeffs, chroma_dc, chroma_ac


def _add_chroma_residual(fr: _Frame, pps: dict, qp: int, cx: int, cy: int,
                         preds, chroma_dc, chroma_ac, cbp_chroma: int) -> None:
    """Reconstruct the two chroma 8x8s from per-component predictions +
    decoded residuals. Cb and Cr each dequantize at their OWN chroma QP
    (8.5.8: Cr uses second_chroma_qp_index_offset, inferred equal to the
    first when the PPS extension tail is absent)."""
    qpc_by_comp = (
        chroma_qp(qp, pps["chroma_qp_index_offset"]),
        chroma_qp(qp, pps["second_chroma_qp_index_offset"]),
    )
    for comp, plane in ((0, fr.cb), (1, fr.cr)):
        qpc = qpc_by_comp[comp]
        pred = preds[comp]
        if not cbp_chroma:
            # no chroma residual at all: the whole 8x8 is the prediction
            plane[cy : cy + 8, cx : cx + 8] = _clip(pred, 0, 255)
            continue
        dc = chroma_dc_dequant(chroma_dc[comp], qpc)
        if all(a is None for a in chroma_ac[comp]):
            res8 = np.repeat(np.repeat((dc + 32) >> 6, 4, 0), 4, 1)
            plane[cy : cy + 8, cx : cx + 8] = _clip(pred + res8, 0, 255)
            continue
        for j in range(4):
            ox, oy = (j % 2) * 4, (j // 2) * 4
            if chroma_ac[comp][j] is not None:
                d = _dequant_zz4x4(chroma_ac[comp][j], qpc)
                d[0, 0] = dc[j // 2, j % 2]
                res = (idct4x4(d) + 32) >> 6
            elif cbp_chroma:
                res = np.full((4, 4), (int(dc[j // 2, j % 2]) + 32) >> 6, np.int64)
            else:
                res = 0
            blk = pred[oy : oy + 4, ox : ox + 4] + res
            plane[cy + oy : cy + oy + 4, cx + ox : cx + ox + 4] = _clip(blk, 0, 255)


def _decode_mb(fr: _Frame, r: BitReader, sps: dict, pps: dict, mb: int,
               slice_id: int, qp: int, is_p: bool = False,
               n_ref: int = 1, is_b: bool = False,
               n_ref1: int = 1) -> None:
    mbx, mby = mb % fr.wmb, mb // fr.wmb
    px, py = mbx * 16, mby * 16
    cx, cy = mbx * 8, mby * 8
    mb_type = r.ue()
    if is_b:
        # Table 7-14: 0 = B_Direct_16x16, 1-3 = one/two-list 16x16,
        # 4-21 = partitions, 22 = B_8x8, 23+ = intra (offset 23)
        if mb_type == 0:
            raise H264Error("B_Direct_16x16 unsupported")
        if mb_type <= 21:
            _decode_mb_inter_b(fr, r, pps, mb, slice_id, qp, mb_type,
                               n_ref, n_ref1)
            return
        if mb_type == 22:
            raise H264Error("B_8x8 (sub-macroblock) unsupported")
        mb_type -= 23  # intra MB in a B slice
    elif is_p:
        if mb_type < 5:  # inter MB types (P_L0_16x16 / 16x8 / 8x16 / 8x8)
            _decode_mb_inter(fr, r, pps, mb, slice_id, qp, mb_type, n_ref)
            return
        mb_type -= 5  # intra MB in a P slice: same layout, offset by 5
    fr.mb_slice[mby, mbx] = slice_id
    bxa, bya = mbx * 4, mby * 4
    fr.blk_ref[bya : bya + 4, bxa : bxa + 4] = -1  # intra: 'different ref'
    fr.blk_ref1[bya : bya + 4, bxa : bxa + 4] = -1
    if mb_type == 25:  # I_PCM
        r.byte_align()
        raw = np.frombuffer(r.read_aligned_bytes(384), np.uint8).astype(np.int64)
        y = raw[:256].reshape(16, 16)
        cb = raw[256:320].reshape(8, 8)
        cr = raw[320:].reshape(8, 8)
        fr.y[py : py + 16, px : px + 16] = y
        fr.cb[cy : cy + 8, cx : cx + 8] = cb
        fr.cr[cy : cy + 8, cx : cx + 8] = cr
        bx, by = mbx * 4, mby * 4
        fr.blk_done[by : by + 4, bx : bx + 4] = True
        fr.blk_slice[by : by + 4, bx : bx + 4] = slice_id
        fr.blk_nnz[by : by + 4, bx : bx + 4] = 16  # 9.2.1: PCM counts as 16
        fr.blk_mode[by : by + 4, bx : bx + 4] = 2
        for comp in range(2):
            fr.cnnz[comp][mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 16
        fr.mb_done[mby, mbx] = True
        fr.mb_qp[mby, mbx] = 0  # 8.7: I_PCM filters as QPy = 0
        fr._last_qp = qp
        return
    if mb_type > 25:
        raise H264Error(f"non-intra mb_type {mb_type} in I slice")

    if mb_type == 0:  # I_4x4
        modes = []
        local: dict = {}
        for i in range(16):
            bx = mbx * 4 + _BLK_XY[i][0] // 4
            by = mby * 4 + _BLK_XY[i][1] // 4
            pred_mode = _predicted_i4_mode(fr, bx, by, slice_id, local)
            if r.flag():
                mode = pred_mode
            else:
                rem = r.u(3)
                mode = rem if rem < pred_mode else rem + 1
            modes.append(mode)
            # visible to LATER blocks of this MB (z-order guarantees the
            # A/B neighbors of any block precede it); later MBs read the
            # batched frame write below
            local[(bx, by)] = mode
        bx0, by0 = mbx * 4, mby * 4
        fr.blk_mode[by0 : by0 + 4, bx0 : bx0 + 4] = (
            np.array(modes, np.int32)[_BLK_Z2R].reshape(4, 4))
        fr.blk_done[by0 : by0 + 4, bx0 : bx0 + 4] = True
        fr.blk_slice[by0 : by0 + 4, bx0 : bx0 + 4] = slice_id
        chroma_mode = r.ue()
        code_num = r.ue()
        if code_num > 47:
            raise H264Error("bad coded_block_pattern code")
        cbp = _CBP_INTRA[code_num]
        cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
        i16_pred = None
    else:  # I_16x16
        t = mb_type - 1
        i16_pred = t % 4
        cbp_chroma = (t // 4) % 3
        cbp_luma = 15 if t >= 12 else 0
        chroma_mode = r.ue()
        modes = None
    if cbp_chroma > 2:
        raise H264Error("bad chroma cbp")
    if chroma_mode > 3:
        raise H264Error("bad chroma pred mode")
    if mb_type != 0 or cbp_luma or cbp_chroma:
        qp = (qp + r.se() + 52) % 52
    fr._last_qp = qp

    # ---- residual decode (all entropy first, reconstruction after) ----
    dc_levels = None
    if i16_pred is not None:
        nc = _nc_luma(fr, mbx * 4, mby * 4, slice_id)
        dc_levels, _ = decode_residual_block(r, nc, 16)
    luma_coeffs, chroma_dc, chroma_ac = _decode_residuals(
        fr, r, mbx, mby, slice_id, cbp_luma, cbp_chroma,
        i16=i16_pred is not None,
    )

    _reconstruct_intra(fr, mb, slice_id, qp, pps, i16_pred, modes,
                       chroma_mode, dc_levels, luma_coeffs, chroma_dc,
                       chroma_ac, cbp_chroma)


def _reconstruct_intra(fr: _Frame, mb: int, slice_id: int, qp: int,
                       pps: dict, i16_pred, modes, chroma_mode: int,
                       dc_levels, luma_coeffs, chroma_dc, chroma_ac,
                       cbp_chroma: int) -> None:
    """Intra-MB pixel reconstruction from fully-decoded syntax — shared
    by the CAVLC and CABAC entropy paths (identical descriptors must
    yield identical pixels regardless of the entropy coder)."""
    mbx, mby = mb % fr.wmb, mb // fr.wmb
    px, py = mbx * 16, mby * 16
    cx, cy = mbx * 8, mby * 8
    # (blk_done was set during entropy decode for nC purposes; prediction
    # below relies on PIXELS, which for blocks of this MB are written in
    # the same z-order the spec decodes them, so the done flags are
    # consistent with sample availability at each step)
    if i16_pred is not None:
        top, left, corner = _luma_neighbors(fr, px, py, slice_id, 16)
        pred = _pred16x16(i16_pred, top, left, corner)
        dc = luma_dc_dequant(dc_levels, qp)
        if all(c is None for c in luma_coeffs):
            # DC-only MB (no AC blocks): every 4x4's residual is the
            # constant (dc + 32) >> 6 — reconstruct the whole 16x16 in
            # one vector op instead of 16 small-array rounds
            res16 = np.repeat(np.repeat((dc + 32) >> 6, 4, 0), 4, 1)
            fr.y[py : py + 16, px : px + 16] = _clip(
                pred + res16, 0, 255
            )
        else:
            for i in range(16):
                ox, oy = _BLK_XY[i]
                if luma_coeffs[i] is not None:
                    d = _dequant_zz4x4(luma_coeffs[i], qp)
                    d[0, 0] = dc[oy // 4, ox // 4]
                    res = idct4x4(d)
                    blk = pred[oy : oy + 4, ox : ox + 4] + ((res + 32) >> 6)
                else:
                    # residual-free block: the rounded DC is one scalar —
                    # skip the 4x4 np.full + array add round
                    d0 = int(dc[oy // 4, ox // 4])
                    blk = pred[oy : oy + 4, ox : ox + 4] + ((d0 + 32) >> 6)
                fr.y[py + oy : py + oy + 4, px + ox : px + ox + 4] = _clip(
                    blk, 0, 255
                )
    else:
        # I_4x4: per-block predict + reconstruct, in z-order, so later
        # blocks see earlier blocks' reconstructed samples.
        # blk_done is already True for nC; prediction availability must use
        # pixel-written state, tracked locally.
        written = [[False] * 4 for _ in range(4)]

        def blk_written(bx, by):
            ox, oy = bx - mbx * 4, by - mby * 4
            if 0 <= ox < 4 and 0 <= oy < 4:
                return written[oy][ox]
            return (0 <= bx < fr.blk_done.shape[1] and 0 <= by < fr.blk_done.shape[0]
                    and fr.mb_done[by // 4, bx // 4]
                    and fr.blk_slice[by, bx] == slice_id)

        for i in range(16):
            ox, oy = _BLK_XY[i]
            bpx, bpy = px + ox, py + oy
            bx, by = bpx // 4, bpy // 4
            if modes[i] == 2 and luma_coeffs[i] is None:
                # DC-predicted residual-free block = one constant
                # (8.3.1.2 mode-2): compute it scalar and skip the
                # small-array prediction round — the dominant case in
                # flat I_4x4 regions
                ts = ls = None
                if bpy > 0 and blk_written(bx, by - 1):
                    r0 = fr.y[bpy - 1]
                    ts = (int(r0[bpx]) + int(r0[bpx + 1])
                          + int(r0[bpx + 2]) + int(r0[bpx + 3]))
                if bpx > 0 and blk_written(bx - 1, by):
                    yp = fr.y
                    ls = (int(yp[bpy, bpx - 1]) + int(yp[bpy + 1, bpx - 1])
                          + int(yp[bpy + 2, bpx - 1])
                          + int(yp[bpy + 3, bpx - 1]))
                if ts is not None and ls is not None:
                    v = (ts + ls + 4) >> 3
                elif ts is not None:
                    v = (ts + 2) >> 2
                elif ls is not None:
                    v = (ls + 2) >> 2
                else:
                    v = 128
                fr.y[bpy : bpy + 4, bpx : bpx + 4] = v
                written[oy // 4][ox // 4] = True
                continue
            top = left = corner = None
            if bpy > 0 and blk_written(bx, by - 1):
                t4 = fr.y[bpy - 1, bpx : bpx + 4]
                ext = np.empty(8, np.int64)
                ext[:4] = t4
                if bpx + 4 < fr.y.shape[1] and blk_written(bx + 1, by - 1):
                    ext[4:] = fr.y[bpy - 1, bpx + 4 : bpx + 8]
                else:
                    ext[4:] = t4[3]
                top = ext
            if bpx > 0 and blk_written(bx - 1, by):
                left = fr.y[bpy : bpy + 4, bpx - 1].copy()
            if bpx > 0 and bpy > 0 and blk_written(bx - 1, by - 1):
                corner = int(fr.y[bpy - 1, bpx - 1])
            pred = _pred4x4(modes[i], top, left, corner)
            if luma_coeffs[i] is not None:
                d = _dequant_zz4x4(luma_coeffs[i], qp)
                blk = pred + ((idct4x4(d) + 32) >> 6)
            else:
                blk = pred
            fr.y[bpy : bpy + 4, bpx : bpx + 4] = _clip(blk, 0, 255)
            written[oy // 4][ox // 4] = True

    preds = []
    for comp, plane in ((0, fr.cb), (1, fr.cr)):
        top, left, corner = _chroma_neighbors(fr, plane, cx, cy, mbx, mby, slice_id)
        preds.append(_pred_chroma8x8(chroma_mode, top, left, corner))
    _add_chroma_residual(fr, pps, qp, cx, cy, preds, chroma_dc, chroma_ac,
                         cbp_chroma)

    fr.mb_done[mby, mbx] = True
    fr.mb_qp[mby, mbx] = qp
    if modes is None:
        bx, by = mbx * 4, mby * 4
        fr.blk_mode[by : by + 4, bx : bx + 4] = 2  # I16 neighbors predict DC
    else:
        fr.mb_i4[mby, mbx] = True


def _predicted_i4_mode(fr: _Frame, bx: int, by: int, slice_id: int,
                       local: "dict | None" = None) -> int:
    """predIntra4x4PredMode (8.3.1.1): min of neighbor modes, DC (2) when a
    neighbor is unavailable or not itself an I_4x4 block.

    ``local`` holds the CURRENT MB's already-coded block modes keyed by
    (bx, by) — by z-order every in-MB A/B neighbor precedes its user, and
    for those blocks the frame-state path below returns exactly the
    recorded mode (blk_done set, same slice, mb_i4 still False -> the
    "recorded mode wins" branch), so the dict hit is a pure fast path:
    one lookup instead of four numpy scalar reads per neighbor."""
    blk_done, blk_slice = fr.blk_done, fr.blk_slice
    blk_mode, mb_i4 = fr.blk_mode, fr.mb_i4

    def nmode(x, y):
        if local is not None:
            m = local.get((x, y))
            if m is not None:
                return m
        if x < 0 or y < 0:
            return None  # outside frame
        if not blk_done[y, x] or blk_slice[y, x] != slice_id:
            return None
        if not mb_i4[y // 4, x // 4]:
            # neighbor MB decoded but not I_4x4 (I_16x16/I_PCM) -> DC
            # (also hit for earlier blocks of the CURRENT I_4x4 MB, whose
            # mb_i4 flag is only set at MB end — their recorded mode wins)
            m = blk_mode[y, x]
            return int(m) if m >= 0 else 2
        return int(blk_mode[y, x])

    a = nmode(bx - 1, by)
    b = nmode(bx, by - 1)
    if a is None or b is None:
        return 2
    return min(a, b)


def _seed_param_maps(sps: dict | None, pps: dict | None):
    """Normalize pre-parsed SPS/PPS seeds (single dicts or the by-id maps
    from parse_avcc) into by-id maps."""
    sps_map: dict[int, dict] = {}
    pps_map: dict[int, dict] = {}
    for seed, target in ((sps, sps_map), (pps, pps_map)):
        if isinstance(seed, dict) and seed and all(
            isinstance(k, int) for k in seed
        ):
            target.update(seed)  # already a by-id map
        elif seed is not None:
            target[seed.get("sps_id") if target is sps_map else seed.get("pps_id")] = seed
    return sps_map, pps_map


def decode_access_unit(nals: list[bytes], sps_map: dict, pps_map: dict,
                       ref: "dict | list | None" = None,
                       poc_ctx: dict | None = None) -> _Frame:
    """Decode one access unit (list of NAL units) to a post-deblock
    :class:`_Frame`. In-band SPS/PPS update the maps in place; each slice
    resolves its OWN pps_id, so multi-parameter-set files use the
    parameters they reference. ``ref`` supplies the reference list P
    slices predict from — a single frame dict or a most-recent-first
    list (the default P RefPicList0 for an in-order no-gap stream);
    None/[] -> P slices raise."""
    refs = [ref] if isinstance(ref, dict) else list(ref or [])
    fr = None
    slice_id = 0
    for nal in nals:
        if not nal:
            continue
        nal_type = nal[0] & 0x1F
        ref_idc = (nal[0] >> 5) & 3
        rbsp = rbsp_unescape(nal[1:])
        if nal_type == 7:
            sp = parse_sps(rbsp)
            sps_map[sp["sps_id"]] = sp
        elif nal_type == 8:
            pp = parse_pps(rbsp)
            pps_map[pp["pps_id"]] = pp
        elif nal_type in (1, 5):
            if not sps_map or not pps_map:
                raise H264Error("slice before SPS/PPS")
            fr = _decode_slice(fr, rbsp, sps_map, pps_map, slice_id,
                               idr=(nal_type == 5), ref_idc=ref_idc,
                               refs=refs, poc_ctx=poc_ctx)
            slice_id += 1
        # SEI (6), AUD (9), filler (12) etc.: skipped
    if fr is None:
        raise H264Error("no slice NAL in access unit")
    if not fr.mb_done.all():
        raise H264Error("frame has undecoded macroblocks")
    if (fr.mb_deblock != 1).any():
        deblock_frame(fr)
    return fr


def _frame_rgb(fr: _Frame) -> "np.ndarray":
    """YCbCr 4:2:0 planes -> cropped RGB uint8 (BT.601 full-range)."""
    cbmm = (int(fr.cb.min()), int(fr.cb.max()))
    crmm = (int(fr.cr.min()), int(fr.cr.max()))
    if cbmm == (128, 128) and crmm == (128, 128):
        # neutral chroma (gray content): every BT.601 chroma term is
        # exactly 0, so R = G = B = Y — skip the float conversion pass
        # (integer clip matches the float path's rint+clip exactly).
        rgb = np.repeat(
            _clip(fr.y, 0, 255).astype(np.uint8)[:, :, None], 3, axis=2
        )
    else:
        y = fr.y.astype(np.float64)
        cb = fr.cb.repeat(2, axis=0).repeat(2, axis=1).astype(np.float64) - 128.0
        cr = fr.cr.repeat(2, axis=0).repeat(2, axis=1).astype(np.float64) - 128.0
        rgb = np.stack(
            [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
            axis=2,
        )
        rgb = _clip(np.rint(rgb), 0, 255).astype(np.uint8)
    left, right, top, bottom = fr.sps["crop"]
    h = fr.hmb * 16 - 2 * (top + bottom)
    w = fr.wmb * 16 - 2 * (left + right)
    if h <= 0 or w <= 0:
        raise H264Error("cropped frame is empty")
    return rgb[2 * top : 2 * top + h, 2 * left : 2 * left + w]


def decode_i_frame(nals: list[bytes], sps: dict | None = None,
                   pps: dict | None = None) -> "np.ndarray":
    """Decode one I/IDR access unit to an RGB array (no reference frame,
    so P slices raise — the keyframe-sampling entry point)."""
    sps_map, pps_map = _seed_param_maps(sps, pps)
    return _frame_rgb(decode_access_unit(nals, sps_map, pps_map, None))


def decode_gop(units: list[list[bytes]], sps: dict | None = None,
               pps: dict | None = None,
               max_refs: int = 16) -> list["np.ndarray | None"]:
    """Decode a sequence of access units with reference-list chaining
    (short-GOP contract: in-order no-gap streams, default RefPicList0 =
    up to ``max_refs`` past decoded frames most-recent-first; IDR units
    reset the list). Returns one RGB array per unit, or None where a
    unit failed — and every subsequent P unit until the next IDR is
    None too (its references are suspect), the honest degradation
    decode_frames surfaces as NULL rows.

    Reference-picture bookkeeping (8.2.5 sliding window over the
    in-order contract): only pictures whose slice NALs carry
    nal_ref_idc != 0 enter RefPicList0 — disposable pictures
    (nal_ref_idc == 0) are decoded and returned but never referenced.
    frame_num is tracked across units: an IDR must carry 0, any other
    picture must carry PrevRefFrameNum or (PrevRefFrameNum + 1) %
    MaxFrameNum (7.4.3); a discontinuity raises inside the unit and
    degrades it — and the chain until the next IDR — to None rows
    rather than decoding silently wrong pixels off a shifted list."""
    sps_map, pps_map = _seed_param_maps(sps, pps)
    out: list = []
    refs: list = []
    prev_ref_fn: int | None = None  # PrevRefFrameNum; None = unseeded
    poc_ctx: dict = {}  # 8.2.1.1 prev reference (msb, lsb) state
    for nals in units:
        idr = any(n and (n[0] & 0x1F) == 5 for n in nals)
        if idr:
            refs = []  # IDR never references across itself
            prev_ref_fn = None
            poc_ctx = {}
        try:
            fr = decode_access_unit(nals, sps_map, pps_map, refs, poc_ctx)
            max_fn = 1 << fr.sps["log2_max_frame_num"]
            if idr:
                if fr.frame_num != 0:
                    raise H264Error(
                        f"IDR frame_num {fr.frame_num} != 0 (7.4.3)")
            elif prev_ref_fn is not None and fr.frame_num not in (
                    prev_ref_fn, (prev_ref_fn + 1) % max_fn):
                raise H264Error(
                    f"frame_num discontinuity: {fr.frame_num} after "
                    f"PrevRefFrameNum {prev_ref_fn}")
            out.append(_frame_rgb(fr))
            if fr.is_ref:
                refs = ([{"y": fr.y, "cb": fr.cb, "cr": fr.cr,
                          "poc": fr.poc}]
                        + refs[: max_refs - 1])
                prev_ref_fn = fr.frame_num
                if fr.poc is not None:
                    # 8.2.1.1: wrap state advances on REFERENCE pictures
                    poc_ctx["prev_msb"] = fr.poc - fr.poc_lsb
                    poc_ctx["prev_lsb"] = fr.poc_lsb
        except DECODABLE_ERRORS:
            out.append(None)
            refs = []  # poison the chain until the next IDR
            prev_ref_fn = None
            poc_ctx = {}
    return out


#: errors decode_gop degrades to None rows (mirrors multimodal's
#: DECODE_ERRORS contract without importing it)
DECODABLE_ERRORS = (H264Error, ValueError, IndexError, struct.error)


# ---------------------------------------------------------------------------
# Fixture encoder: conformant Baseline I-frame streams for the multimodal
# gates and the round-trip tests. Mirrors the decoder's syntax exactly and
# shares its nC bookkeeping via a _Frame shadow (no pixel reconstruction —
# entropy contexts only).
# ---------------------------------------------------------------------------


def _nal(nal_type: int, rbsp: bytes, ref_idc: int = 3) -> bytes:
    return bytes([(ref_idc << 5) | nal_type]) + rbsp_escape(rbsp)


#: bounded memo of encoded parameter-set NAL pairs (pure function of
#: its arguments; the fixture synth calls it per document)
_SPS_PPS_CACHE: dict[tuple, tuple[bytes, bytes]] = {}


def encode_sps_pps(w_mbs: int, h_mbs: int, crop_right: int = 0,
                   crop_bottom: int = 0, qp: int = 26,
                   second_cqpo: int | None = None,
                   pps_id: int = 0, cqpo: int = 0,
                   weighted_pred: bool = False,
                   cabac: bool = False, poc_type: int = 2,
                   max_refs: int = 1,
                   profile_idc: int = 66) -> tuple[bytes, bytes]:
    """-> (sps_nal, pps_nal). Crop values in luma pixels (must be even:
    4:2:0 crop units are 2 px). ``second_cqpo`` emits the PPS extension
    tail (transform_8x8=0, no scaling matrices, the given
    second_chroma_qp_index_offset) — the fixture for the honored-tail
    decode path. ``poc_type=0`` emits explicit pic_order_cnt_lsb slice
    headers (8 bits) — REQUIRED for B streams, whose output order
    differs from decode order (poc_type 2 forbids that); pair with
    ``max_refs>=2`` and ``profile_idc=77`` (Main — B slices are not a
    Baseline tool)."""
    if crop_right % 2 or crop_bottom % 2:
        raise H264Error("crop must be even (4:2:0 crop units)")
    key = (w_mbs, h_mbs, crop_right, crop_bottom, qp, second_cqpo, pps_id,
           cqpo, weighted_pred, cabac, poc_type, max_refs, profile_idc)
    hit = _SPS_PPS_CACHE.get(key)
    if hit is not None:
        return hit
    w = BitWriter()
    w.u(profile_idc, 8)
    w.u(0xC0 if profile_idc == 66 else 0, 8)  # constraint flags
    w.u(30, 8)   # level 3.0
    w.ue(0)      # sps_id
    w.ue(0)      # log2_max_frame_num_minus4
    w.ue(poc_type)  # pic_order_cnt_type
    if poc_type == 0:
        w.ue(4)  # log2_max_pic_order_cnt_lsb_minus4 -> 8-bit poc_lsb
    w.ue(max_refs)  # max_num_ref_frames
    w.u(0, 1)    # gaps_in_frame_num_value_allowed
    w.ue(w_mbs - 1)
    w.ue(h_mbs - 1)
    w.u(1, 1)    # frame_mbs_only
    w.u(0, 1)    # direct_8x8_inference
    if crop_right or crop_bottom:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_right // 2)
        w.ue(0)
        w.ue(crop_bottom // 2)
    else:
        w.u(0, 1)
    w.u(0, 1)    # vui_parameters_present
    w.rbsp_trailing()
    sps_nal = _nal(7, w.tobytes())

    w = BitWriter()
    w.ue(pps_id)
    w.ue(0)      # sps_id
    w.u(1 if cabac else 0, 1)  # entropy_coding_mode: CAVLC/CABAC
    w.u(0, 1)    # bottom_field_pic_order_in_frame_present
    w.ue(0)      # num_slice_groups_minus1
    w.ue(0)      # num_ref_idx_l0_default_active_minus1
    w.ue(0)      # num_ref_idx_l1_default_active_minus1
    w.u(1 if weighted_pred else 0, 1)  # weighted_pred
    w.u(0, 2)    # weighted_bipred_idc
    w.se(qp - 26)  # pic_init_qp_minus26
    w.se(0)      # pic_init_qs_minus26
    w.se(cqpo)   # chroma_qp_index_offset
    w.u(1, 1)    # deblocking_filter_control_present
    w.u(0, 1)    # constrained_intra_pred
    w.u(0, 1)    # redundant_pic_cnt_present
    if second_cqpo is not None:  # PPS extension tail (7.3.2.2)
        w.u(0, 1)  # transform_8x8_mode_flag
        w.u(0, 1)  # pic_scaling_matrix_present_flag
        w.se(second_cqpo)
    w.rbsp_trailing()
    if len(_SPS_PPS_CACHE) >= 256:
        _SPS_PPS_CACHE.clear()
    out = (sps_nal, _nal(8, w.tobytes()))
    _SPS_PPS_CACHE[key] = out
    return out


def encode_i_frame(mbs: list, w_mbs: int, h_mbs: int, qp: int = 26,
                   deblock_idc: int = 1,
                   qp_deltas: "list[int] | None" = None,
                   poc_lsb: "int | None" = None) -> bytes:
    """One IDR slice NAL covering the whole frame. ``mbs`` is a raster list
    of MB descriptors:

    - ``("pcm", y16x16, cb8x8, cr8x8)`` — raw samples (exact);
    - ``("i16", pred_mode, dc_levels16, chroma_dc_pair_or_None)`` —
      I_16x16 with DC-only luma residual (cbp_luma 0);
    - ``("i4", modes16, coeffs16, chroma_dc_pair_or_None)`` — I_4x4 with
      full per-block zigzag coefficient lists (None = no residual for
      that block; the cbp luma bits derive from which 8x8 quadrants hold
      any residual — blocks in a coded quadrant with None become
      explicit all-zero blocks, as the syntax requires).
    """
    if len(mbs) != w_mbs * h_mbs:
        raise H264Error("mb list does not cover the frame")
    return encode_i_frame_slices(mbs, w_mbs, h_mbs, qp, deblock_idc,
                                 qp_deltas=qp_deltas, poc_lsb=poc_lsb)[0]


def encode_i_frame_slices(mbs: list, w_mbs: int, h_mbs: int, qp: int = 26,
                          deblock_idc: int = 1,
                          slice_starts: tuple = (0,),
                          qp_deltas: "list[int] | None" = None,
                          poc_lsb: "int | None" = None) -> list[bytes]:
    """Like encode_i_frame but splitting the MB raster into one IDR slice
    NAL per entry of ``slice_starts`` (ascending, first must be 0). The
    shared shadow state carries SLICE IDS so predicted intra modes and
    CAVLC nC contexts reset at slice boundaries exactly as a conformant
    decoder resets them — a mode equal to its predictor in 1-slice form
    may need explicit signaling in 2-slice form, and vice versa."""
    if len(mbs) != w_mbs * h_mbs:
        raise H264Error("mb list does not cover the frame")
    if not slice_starts or slice_starts[0] != 0 or list(slice_starts) != sorted(set(slice_starts)):
        raise H264Error("slice_starts must be ascending and start at 0")
    shadow = _Frame({"width_mbs": w_mbs, "height_mbs": h_mbs})
    bounds = list(slice_starts) + [len(mbs)]
    nals = []
    for sid in range(len(slice_starts)):
        first, last = bounds[sid], bounds[sid + 1]
        if first >= last:
            raise H264Error("empty slice")
        w = BitWriter()
        w.ue(first)  # first_mb_in_slice
        w.ue(7)      # slice_type: I (all slices in picture)
        w.ue(0)      # pps_id
        w.u(0, 4)    # frame_num (log2_max_frame_num = 4)
        w.ue(0)      # idr_pic_id
        if poc_lsb is not None:  # SPS poc_type 0: explicit 8-bit lsb
            w.u(poc_lsb & 0xFF, 8)
        w.u(0, 1)    # no_output_of_prior_pics
        w.u(0, 1)    # long_term_reference
        w.se(0)      # slice_qp_delta
        w.ue(deblock_idc)  # 1 = off (the fixtures' default); 0/2 filter
        if deblock_idc != 1:
            w.se(0)  # slice_alpha_c0_offset_div2
            w.se(0)  # slice_beta_offset_div2
        for mb in range(first, last):
            _encode_mb(w, shadow, mb, mbs[mb], qp, sid,
                       qp_delta=qp_deltas[mb] if qp_deltas else 0)
        w.rbsp_trailing()
        nals.append(_nal(5, w.tobytes()))
    return nals


def _chroma_cbp(cdc, cac) -> int:
    """cbp_chroma from the fixture descriptors: 2 when any chroma AC is
    present (DC blocks then encode even if all-zero, as the syntax
    requires), 1 for DC-only, 0 for none."""
    if cac is not None and any(
        blk is not None and any(blk)
        for comp in cac for blk in comp
    ):
        return 2
    return 1 if cdc is not None else 0


def _encode_chroma_residuals(w: BitWriter, fr: _Frame, mbx: int, mby: int,
                             slice_id: int, cbp_chroma: int,
                             cdc, cac) -> None:
    """Chroma residual emission shared by the i16/i4 CAVLC paths: DC pair
    (nC = -1) when cbp_chroma >= 1, then the per-component AC grid in
    raster order with live _nc_chroma bookkeeping when cbp_chroma == 2 —
    the exact consumption order of _decode_residuals."""
    if cbp_chroma:
        for comp in range(2):
            dc = cdc[comp] if cdc is not None else [0] * 4
            encode_residual_block(w, list(dc), -1)
    if cbp_chroma != 2:
        cx0, cy0 = mbx * 2, mby * 2
        fr.cnnz[0][cy0 : cy0 + 2, cx0 : cx0 + 2] = 0
        fr.cnnz[1][cy0 : cy0 + 2, cx0 : cx0 + 2] = 0
        return
    for comp in range(2):
        done = [[False, False], [False, False]]
        for j in range(4):
            bx2, by2 = mbx * 2 + j % 2, mby * 2 + j // 2
            blk = cac[comp][j] if cac[comp][j] is not None else [0] * 15
            nc = _nc_chroma(fr, comp, bx2, by2, mbx, mby, slice_id, done)
            tc = encode_residual_block(w, list(blk), nc)
            fr.cnnz[comp][by2, bx2] = tc
            done[j // 2][j % 2] = True


def _encode_mb(w: BitWriter, fr: _Frame, mb: int, desc, qp: int,
               slice_id: int = 0, ptype_off: int = 0,
               qp_delta: int = 0) -> None:
    """Emit one INTRA macroblock (``ptype_off`` = 5 inside P slices,
    where intra mb_types sit above the inter ones)."""
    mbx, mby = mb % fr.wmb, mb // fr.wmb
    kind = desc[0]
    fr.mb_slice[mby, mbx] = slice_id
    bx0, by0 = mbx * 4, mby * 4
    fr.blk_ref[by0 : by0 + 4, bx0 : bx0 + 4] = -1  # intra (MV-pred state)
    if kind == "pcm":
        if qp_delta:
            raise H264Error("I_PCM carries no mb_qp_delta")
        _, y, cb, cr = desc
        w.ue(25 + ptype_off)
        w.byte_align(0)  # pcm_alignment_zero_bit
        w.put_bytes(np.asarray(y, np.int64).reshape(-1).astype(np.uint8).tobytes())
        for plane in (cb, cr):
            w.put_bytes(
                np.asarray(plane, np.int64).reshape(-1).astype(np.uint8).tobytes()
            )
        fr.blk_done[by0 : by0 + 4, bx0 : bx0 + 4] = True
        fr.blk_slice[by0 : by0 + 4, bx0 : bx0 + 4] = slice_id
        fr.blk_nnz[by0 : by0 + 4, bx0 : bx0 + 4] = 16
        fr.blk_mode[by0 : by0 + 4, bx0 : bx0 + 4] = 2
        for comp in range(2):
            fr.cnnz[comp][mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 16
        fr.mb_done[mby, mbx] = True
        return

    if kind == "i16":
        pred_mode, dc_levels, cdc = desc[1], desc[2], desc[3]
        ac16 = desc[4] if len(desc) > 4 else None
        cac = desc[5] if len(desc) > 5 else None
        if ac16 is not None and not any(
            blk is not None and any(blk) for blk in ac16
        ):
            ac16 = None
        cbp_luma = 15 if ac16 is not None else 0
        if cdc is not None and not (any(cdc[0]) or any(cdc[1])):
            cdc = None
        cbp_chroma = _chroma_cbp(cdc, cac)
        w.ue(1 + pred_mode + 4 * cbp_chroma + 12 * (1 if cbp_luma else 0)
             + ptype_off)
        w.ue(0)  # intra_chroma_pred_mode: DC
        w.se(qp_delta)  # mb_qp_delta
        nc = _nc_luma(fr, bx0, by0, slice_id)
        encode_residual_block(w, list(dc_levels), nc)
        fr.blk_mode[by0 : by0 + 4, bx0 : bx0 + 4] = 2
        # Batched bookkeeping, mirroring _decode_residuals: whole-MB
        # done/slice flags + zero nnz base in three sliced writes (exact:
        # _nc_luma only probes A/B neighbors, which z-order places BEFORE
        # their prober, so per-block tc writes below are final when read)
        fr.blk_done[by0 : by0 + 4, bx0 : bx0 + 4] = True
        fr.blk_slice[by0 : by0 + 4, bx0 : bx0 + 4] = slice_id
        fr.blk_nnz[by0 : by0 + 4, bx0 : bx0 + 4] = 0
        # AC blocks in z-order, nC bookkeeping advancing per block —
        # the exact order the decoder's _decode_residuals consumes
        if cbp_luma:
            for i in range(16):
                bx = bx0 + _BLK_XY[i][0] // 4
                by = by0 + _BLK_XY[i][1] // 4
                ac = ac16[i] if ac16[i] is not None else [0] * 15
                nc = _nc_luma(fr, bx, by, slice_id)
                tc = encode_residual_block(w, list(ac), nc)
                fr.blk_nnz[by, bx] = tc
        _encode_chroma_residuals(w, fr, mbx, mby, slice_id, cbp_chroma,
                                 cdc, cac)
        fr.mb_done[mby, mbx] = True
        return

    if kind != "i4":
        raise H264Error(f"unknown MB descriptor {kind!r}")
    modes, coeffs, cdc = desc[1], desc[2], desc[3]
    cac = desc[4] if len(desc) > 4 else None
    w.ue(ptype_off)
    # quadrant cbp bits; inside a coded quadrant every block is written
    cbp_luma = 0
    for i in range(16):
        if coeffs[i] is not None and any(coeffs[i]):
            cbp_luma |= 1 << (i // 4)
    if cdc is not None and not (any(cdc[0]) or any(cdc[1])):
        cdc = None
    cbp_chroma = _chroma_cbp(cdc, cac)
    # intra4x4 pred modes (need blk_mode state as the decoder builds it)
    local = {}
    for i in range(16):
        bx = bx0 + _BLK_XY[i][0] // 4
        by = by0 + _BLK_XY[i][1] // 4
        pred = _predicted_i4_mode(fr, bx, by, slice_id, local)
        mode = modes[i]
        if mode == pred:
            w.u(1, 1)
        else:
            rem = mode if mode < pred else mode - 1
            if rem >= 8:
                raise H264Error("cannot signal mode equal to predictor")
            w.u(rem, 4)  # 0 flag + 3-bit rem_intra4x4_pred_mode
        local[(bx, by)] = mode
    fr.blk_mode[by0 : by0 + 4, bx0 : bx0 + 4] = (
        np.array(modes, np.int32)[_BLK_Z2R].reshape(4, 4))
    fr.blk_done[by0 : by0 + 4, bx0 : bx0 + 4] = True
    fr.blk_slice[by0 : by0 + 4, bx0 : bx0 + 4] = slice_id
    w.ue(0)  # intra_chroma_pred_mode: DC
    w.ue(_CBP_INTRA_INV[cbp_luma | (cbp_chroma << 4)])
    if cbp_luma or cbp_chroma:
        w.se(qp_delta)  # mb_qp_delta
    elif qp_delta:
        raise H264Error(
            "qp_delta on an I_4x4 MB with no coded residual has no "
            "syntax slot (7.3.5: mb_qp_delta only with coded_block_pattern)"
        )
    fr.blk_nnz[by0 : by0 + 4, bx0 : bx0 + 4] = 0
    if cbp_luma:
        for i in range(16):
            if not (cbp_luma & (1 << (i // 4))):
                continue
            bx = bx0 + _BLK_XY[i][0] // 4
            by = by0 + _BLK_XY[i][1] // 4
            blk = coeffs[i] if coeffs[i] is not None else [0] * 16
            nc = _nc_luma(fr, bx, by, slice_id)
            tc = encode_residual_block(w, list(blk), nc)
            fr.blk_nnz[by, bx] = tc
    _encode_chroma_residuals(w, fr, mbx, mby, slice_id, cbp_chroma, cdc, cac)
    fr.mb_done[mby, mbx] = True


def i16dc_recon_value(dc_level: int, qp: int = 26) -> int:
    """Closed-form reconstructed luma value of a DC-predicted I_16x16 MB
    whose Hadamard-domain DC level is ``dc_level`` on a 128 baseline —
    the inverse the fixtures and the gate oracle both state independently
    of the decoder: dequant (8.5.10 DC path), DC-only inverse transform
    ((dc + 32) >> 6), added to the 128 DC prediction."""
    a = _V[qp % 6][0]
    if qp >= 36:
        dc = (dc_level * a) << (qp // 6 - 6)
    else:
        dc = (dc_level * a + (1 << (5 - qp // 6))) >> (6 - qp // 6)
    return max(0, min(255, 128 + ((dc + 32) >> 6)))


def encode_solid_gray_stream(w_mbs: int, h_mbs: int, dc_level: int,
                             qp: int = 26, crop_right: int = 0,
                             crop_bottom: int = 0,
                             deblock_idc: int = 1) -> tuple[bytes, bytes, bytes]:
    """-> (sps_nal, pps_nal, idr_nal) for a uniform gray frame of luma
    value ``i16dc_recon_value(dc_level, qp)``: MB 0 carries the DC
    residual, every other MB is a residual-free DC-predicted I_16x16, so
    the value propagates across the frame through prediction alone —
    one wrong neighbor average anywhere breaks every later MB. With
    ``deblock_idc=0`` the in-loop filter RUNS and must be a no-op on the
    flat result (every delta it can compute is zero) — the same closed
    form holds, so gates can drive the filter code path too."""
    dc16 = [0] * 16
    dc16[0] = dc_level
    mbs: list = [("i16", 2, dc16, None)]
    mbs += [("i16", 2, [0] * 16, None)] * (w_mbs * h_mbs - 1)
    sps_nal, pps_nal = encode_sps_pps(w_mbs, h_mbs, crop_right, crop_bottom, qp)
    return sps_nal, pps_nal, encode_i_frame(mbs, w_mbs, h_mbs, qp, deblock_idc)


def _encode_p_inter_mb(w: BitWriter, fr: _Frame, mb: int, desc, qp: int,
                       slice_id: int, n_ref: int = 1) -> None:
    """Emit one inter macroblock of a P slice. Descriptors:

    - ``("p16", (mvx, mvy), coeffs16_or_None, cdc_or_None[, ref_idx])``
      — P_L0_16x16 with optional per-4x4 luma residual lists (i4-style)
      and optional chroma DC pair;
    - ``("p16x8", mv_top, mv_bot, coeffs16_or_None, cdc_or_None
      [, (ri0, ri1)])``;
    - ``("p8x16", mv_left, mv_right, coeffs16_or_None, cdc_or_None
      [, (ri0, ri1)])``;
    - ``("p8x8", subs, coeffs16_or_None, cdc_or_None)`` where ``subs``
      is four ``(sub_mb_type, [mv, ...][, ref_idx])`` tuples
      (Table 7-17 layouts).

    ref_idx defaults to 0; with ``n_ref > 1`` every ref_idx emits as
    te(v) in the 7.3.5 order (ALL refs before ALL mvds). MV prediction
    mirrors the decoder exactly (shared ``_mv_pred`` over the same
    shadow-frame state), so the emitted mvd round-trips."""
    mbx, mby = mb % fr.wmb, mb // fr.wmb
    kind = desc[0]
    fr.mb_slice[mby, mbx] = slice_id
    bx0, by0 = mbx * 4, mby * 4

    def put_ref(ri):
        if n_ref <= 1:
            if ri:
                raise H264Error("nonzero ref_idx with a 1-entry list")
            return
        if n_ref == 2:
            w.u(1 - ri, 1)  # te(v), max 1
        else:
            w.ue(ri)

    def put_part(ox, oy, pw, ph, mv, sc=None, ri=0):
        mvp = _mv_pred(fr, mbx, mby, ox, oy, pw, ph, slice_id, shortcut=sc,
                       ref_idx=ri)
        w.se(mv[0] - mvp[0])
        w.se(mv[1] - mvp[1])
        bx, by = (mbx * 16 + ox) // 4, (mby * 16 + oy) // 4
        fr.blk_mv[by : by + ph // 4, bx : bx + pw // 4] = mv
        fr.blk_ref[by : by + ph // 4, bx : bx + pw // 4] = ri
        fr.blk_slice[by : by + ph // 4, bx : bx + pw // 4] = slice_id

    if kind == "p8x8":
        _, subs, coeffs, cdc = desc
        w.ue(3)
        for sub in subs:
            w.ue(sub[0])
        for sub in subs:
            put_ref(sub[2] if len(sub) > 2 else 0)
        for k, sub in enumerate(subs):
            stype, mvs = sub[0], sub[1]
            ri = sub[2] if len(sub) > 2 else 0
            ox8, oy8 = (k % 2) * 8, (k // 2) * 8
            if len(mvs) != len(_SUB_PARTS[stype]):
                raise H264Error("sub-partition mv count mismatch")
            for (sox, soy, pw, ph), mv in zip(_SUB_PARTS[stype], mvs):
                put_part(ox8 + sox, oy8 + soy, pw, ph, mv, ri=ri)
    else:
        if kind == "p16":
            ptype, parts, mvs = 0, [(0, 0, 16, 16, None)], [desc[1]]
            coeffs, cdc = desc[2], desc[3]
            rids = [desc[4] if len(desc) > 4 else 0]
        elif kind == "p16x8":
            ptype = 1
            parts = [(0, 0, 16, 8, "B"), (0, 8, 16, 8, "A")]
            mvs, coeffs, cdc = [desc[1], desc[2]], desc[3], desc[4]
            rids = list(desc[5]) if len(desc) > 5 else [0, 0]
        elif kind == "p8x16":
            ptype = 2
            parts = [(0, 0, 8, 16, "A"), (8, 0, 8, 16, "C")]
            mvs, coeffs, cdc = [desc[1], desc[2]], desc[3], desc[4]
            rids = list(desc[5]) if len(desc) > 5 else [0, 0]
        else:
            raise H264Error(f"unknown P MB descriptor {kind!r}")
        w.ue(ptype)
        for ri in rids:
            put_ref(ri)
        for (ox, oy, pw, ph, sc), mv, ri in zip(parts, mvs, rids):
            put_part(ox, oy, pw, ph, mv, sc, ri)
    cbp_luma = 0
    if coeffs is not None:
        for i in range(16):
            if coeffs[i] is not None and any(coeffs[i]):
                cbp_luma |= 1 << (i // 4)
    if cdc is not None and not (any(cdc[0]) or any(cdc[1])):
        cdc = None
    cbp_chroma = 1 if cdc is not None else 0
    w.ue(_CBP_INTER_INV[cbp_luma | (cbp_chroma << 4)])
    if cbp_luma or cbp_chroma:
        w.se(0)  # mb_qp_delta
    for i in range(16):
        bx = bx0 + _BLK_XY[i][0] // 4
        by = by0 + _BLK_XY[i][1] // 4
        if cbp_luma & (1 << (i // 4)):
            blk = coeffs[i] if coeffs[i] is not None else [0] * 16
            nc = _nc_luma(fr, bx, by, slice_id)
            tc = encode_residual_block(w, list(blk), nc)
            fr.blk_nnz[by, bx] = tc
        else:
            fr.blk_nnz[by, bx] = 0
        fr.blk_done[by, bx] = True
    if cbp_chroma:
        for comp in range(2):
            encode_residual_block(w, list(cdc[comp]), -1)
    fr.mb_done[mby, mbx] = True


def encode_p_frame(mbs: list, w_mbs: int, h_mbs: int, qp: int = 26,
                   frame_num: int = 1, deblock_idc: int = 1,
                   n_ref: int = 1, weights: dict | None = None,
                   ref_idc: int = 3,
                   poc_lsb: "int | None" = None) -> bytes:
    """One non-IDR P slice NAL covering the whole frame — the fixture for
    the short-GOP inter decode path. ``mbs`` is a raster list of MB
    descriptors: ``("skip",)`` (P_Skip — motion from the shared skip-MV
    rule), the inter shapes of :func:`_encode_p_inter_mb`, or any INTRA
    descriptor ``encode_i_frame`` accepts (emitted with the +5 P-slice
    mb_type offset). Slice header: default reference list of ``n_ref``
    past frames (override emitted when > 1), sliding-window marking.
    ``weights`` emits a pred_weight_table (pair with a PPS built with
    ``weighted_pred=True``): ``{"logwd_l": n, "logwd_c": n, "luma":
    [(w, o) or None per ref], "chroma": [((wcb, ocb), (wcr, ocr)) or
    None per ref]}`` — None entries emit flag 0 (identity defaults).
    ``ref_idc=0`` emits a DISPOSABLE (non-reference) picture: nal_ref_idc
    0 in the NAL header and no dec_ref_pic_marking (7.3.3)."""
    if len(mbs) != w_mbs * h_mbs:
        raise H264Error("mb list does not cover the frame")
    shadow = _Frame({"width_mbs": w_mbs, "height_mbs": h_mbs})
    w = BitWriter()
    w.ue(0)      # first_mb_in_slice
    w.ue(5)      # slice_type: P (all slices in picture)
    w.ue(0)      # pps_id
    w.u(frame_num % 16, 4)  # frame_num (log2_max_frame_num = 4)
    if poc_lsb is not None:  # SPS poc_type 0: explicit 8-bit lsb
        w.u(poc_lsb & 0xFF, 8)
    if n_ref == 1:
        w.u(0, 1)  # num_ref_idx_active_override (PPS default = 1 ref)
    else:
        w.u(1, 1)
        w.ue(n_ref - 1)
    w.u(0, 1)    # ref_pic_list_modification_flag_l0
    if weights is not None:  # pred_weight_table (7.3.3.2)
        w.ue(weights["logwd_l"])
        w.ue(weights["logwd_c"])
        for i in range(n_ref):
            lw = weights["luma"][i]
            if lw is None:
                w.u(0, 1)
            else:
                w.u(1, 1)
                w.se(lw[0])
                w.se(lw[1])
            cw = weights["chroma"][i]
            if cw is None:
                w.u(0, 1)
            else:
                w.u(1, 1)
                for wt, of in cw:
                    w.se(wt)
                    w.se(of)
    if ref_idc != 0:  # dec_ref_pic_marking only on reference pictures
        w.u(0, 1)    # adaptive_ref_pic_marking (sliding window)
    w.se(0)      # slice_qp_delta
    w.ue(deblock_idc)
    if deblock_idc != 1:
        w.se(0)  # slice_alpha_c0_offset_div2
        w.se(0)  # slice_beta_offset_div2
    mb = 0
    n = len(mbs)
    while mb < n:
        run = 0
        while mb + run < n and mbs[mb + run][0] == "skip":
            run += 1
        w.ue(run)
        for k in range(run):
            m = mb + k
            mx, my = m % w_mbs, m // w_mbs
            shadow.mb_slice[my, mx] = 0
            mv = _skip_mv(shadow, mx, my, 0)
            bx, by = mx * 4, my * 4
            shadow.blk_mv[by : by + 4, bx : bx + 4] = mv
            shadow.blk_ref[by : by + 4, bx : bx + 4] = 0
            shadow.blk_slice[by : by + 4, bx : bx + 4] = 0
            shadow.blk_nnz[by : by + 4, bx : bx + 4] = 0
            shadow.blk_done[by : by + 4, bx : bx + 4] = True
            shadow.mb_done[my, mx] = True
        mb += run
        if mb >= n:
            break
        desc = mbs[mb]
        if desc[0] in ("p16", "p16x8", "p8x16", "p8x8"):
            _encode_p_inter_mb(w, shadow, mb, desc, qp, 0, n_ref=n_ref)
        else:
            _encode_mb(w, shadow, mb, desc, qp, 0, ptype_off=5)
        mb += 1
    w.rbsp_trailing()
    return _nal(1, w.tobytes(), ref_idc=ref_idc)


def _encode_b_inter_mb(w: BitWriter, fr: _Frame, mb: int, desc, qp: int,
                       slice_id: int, n_ref0: int = 1,
                       n_ref1: int = 1) -> None:
    """Emit one inter macroblock of a B slice. Descriptors:

    - ``("bl0", mv, coeffs16_or_None, cdc_or_None[, ref_idx])`` —
      B_L0_16x16 (mb_type 1);
    - ``("bl1", mv, coeffs16_or_None, cdc_or_None[, ref_idx])`` —
      B_L1_16x16 (mb_type 2);
    - ``("bbi", mv_l0, mv_l1, coeffs16_or_None, cdc_or_None
      [, (ri0, ri1)])`` — B_Bi_16x16 (mb_type 3).

    Syntax per 7.3.5.1: mb_type, ref_idx_l0 (if used), ref_idx_l1 (if
    used), mvd_l0, mvd_l1, then CBP + residual. MV prediction mirrors
    the decoder exactly (shared per-list ``_mv_pred`` over the same
    shadow state)."""
    mbx, mby = mb % fr.wmb, mb // fr.wmb
    kind = desc[0]
    fr.mb_slice[mby, mbx] = slice_id
    bx0, by0 = mbx * 4, mby * 4

    def put_ref(ri, n):
        if n <= 1:
            if ri:
                raise H264Error("nonzero ref_idx with a 1-entry list")
            return
        if n == 2:
            w.u(1 - ri, 1)
        else:
            w.ue(ri)

    # normalize every descriptor to (mb_type, [(mode, mv_l0, mv_l1,
    # ri0, ri1) per partition])
    if kind == "bl0":
        coeffs, cdc = desc[2], desc[3]
        specs = [("l0", desc[1], None, desc[4] if len(desc) > 4 else 0, -1)]
        btype = 1
    elif kind == "bl1":
        coeffs, cdc = desc[2], desc[3]
        specs = [("l1", None, desc[1], -1, desc[4] if len(desc) > 4 else 0)]
        btype = 2
    elif kind == "bbi":
        coeffs, cdc = desc[3], desc[4]
        r0, r1 = desc[5] if len(desc) > 5 else (0, 0)
        specs = [("bi", desc[1], desc[2], r0, r1)]
        btype = 3
    elif kind in ("b16x8", "b8x16"):
        # ("b16x8"|"b8x16", [(mode, mv_l0_or_None, mv_l1_or_None
        #  [, ri0, ri1]), x2], coeffs16_or_None, cdc_or_None)
        shape = "16x8" if kind == "b16x8" else "8x16"
        coeffs, cdc = desc[2], desc[3]
        specs = []
        for part in desc[1]:
            mode, pmv0, pmv1 = part[0], part[1], part[2]
            pr0 = part[3] if len(part) > 3 else (0 if pmv0 is not None else -1)
            pr1 = part[4] if len(part) > 4 else (0 if pmv1 is not None else -1)
            specs.append((mode, pmv0, pmv1, pr0, pr1))
        modes = tuple(sp[0] for sp in specs)
        btype = next(
            t for t, (sh, md) in _B_MB_TYPES.items()
            if sh == shape and md == modes
        )
    else:
        raise H264Error(f"unknown B MB descriptor {kind!r}")
    w.ue(btype)
    shape, modes = _B_MB_TYPES[btype]
    parts = _B_PART_RECTS[shape]
    for sp in specs:           # ALL ref_idx_l0 first (7.3.5.1)
        if sp[0] in ("l0", "bi"):
            put_ref(sp[3], n_ref0)
    for sp in specs:           # then ALL ref_idx_l1
        if sp[0] in ("l1", "bi"):
            put_ref(sp[4], n_ref1)
    for lst, mv_i, ri_i, blk_mv, blk_ref, lset in (
        (0, 1, 3, fr.blk_mv, fr.blk_ref, ("l0", "bi")),
        (1, 2, 4, fr.blk_mv1, fr.blk_ref1, ("l1", "bi")),
    ):
        for sp, (ox, oy, pw, ph, sc) in zip(specs, parts):
            bx = (mbx * 16 + ox) // 4
            by = (mby * 16 + oy) // 4
            if sp[0] in lset:
                mv = sp[mv_i]
                mvp = _mv_pred(fr, mbx, mby, ox, oy, pw, ph, slice_id,
                               shortcut=sc, ref_idx=sp[ri_i], lst=lst)
                w.se(mv[0] - mvp[0])
                w.se(mv[1] - mvp[1])
                blk_mv[by : by + ph // 4, bx : bx + pw // 4] = mv
            blk_ref[by : by + ph // 4, bx : bx + pw // 4] = sp[ri_i]
            fr.blk_slice[by : by + ph // 4, bx : bx + pw // 4] = slice_id
    cbp_luma = 0
    if coeffs is not None:
        for i in range(16):
            if coeffs[i] is not None and any(coeffs[i]):
                cbp_luma |= 1 << (i // 4)
    if cdc is not None and not (any(cdc[0]) or any(cdc[1])):
        cdc = None
    cbp_chroma = 1 if cdc is not None else 0
    w.ue(_CBP_INTER_INV[cbp_luma | (cbp_chroma << 4)])
    if cbp_luma or cbp_chroma:
        w.se(0)  # mb_qp_delta
    for i in range(16):
        bx = bx0 + _BLK_XY[i][0] // 4
        by = by0 + _BLK_XY[i][1] // 4
        if cbp_luma & (1 << (i // 4)):
            blk = coeffs[i] if coeffs[i] is not None else [0] * 16
            nc = _nc_luma(fr, bx, by, slice_id)
            tc = encode_residual_block(w, list(blk), nc)
            fr.blk_nnz[by, bx] = tc
        else:
            fr.blk_nnz[by, bx] = 0
        fr.blk_done[by, bx] = True
    if cbp_chroma:
        for comp in range(2):
            encode_residual_block(w, list(cdc[comp]), -1)
    fr.mb_done[mby, mbx] = True


def encode_b_frame(mbs: list, w_mbs: int, h_mbs: int, qp: int = 26,
                   frame_num: int = 2, poc_lsb: int = 2,
                   deblock_idc: int = 1, n_ref0: int = 1,
                   n_ref1: int = 1, ref_idc: int = 0) -> bytes:
    """One non-IDR B slice NAL covering the whole frame. Requires an SPS
    built with ``poc_type=0`` (the pic_order_cnt_lsb field is mandatory
    for out-of-display-order pictures) and pairs with decode_gop's
    default POC-split reference lists. ``mbs`` descriptors are the
    shapes of :func:`_encode_b_inter_mb` plus any INTRA descriptor
    ``encode_i_frame`` accepts (emitted with the +23 B-slice mb_type
    offset). ``ref_idc=0`` (the default) emits a DISPOSABLE picture —
    the common case for B frames — so no dec_ref_pic_marking is
    written. ``deblock_idc`` must be 1 (the decoder's B contract)."""
    if len(mbs) != w_mbs * h_mbs:
        raise H264Error("mb list does not cover the frame")
    if deblock_idc != 1:
        raise H264Error("B fixture requires deblocking off (idc 1)")
    shadow = _Frame({"width_mbs": w_mbs, "height_mbs": h_mbs})
    w = BitWriter()
    w.ue(0)      # first_mb_in_slice
    w.ue(6)      # slice_type: B (all slices in picture)
    w.ue(0)      # pps_id
    w.u(frame_num % 16, 4)  # frame_num (log2_max_frame_num = 4)
    w.u(poc_lsb & 0xFF, 8)  # pic_order_cnt_lsb (SPS poc_type 0, 8 bits)
    w.u(0, 1)    # direct_spatial_mv_pred_flag (no direct MBs emitted)
    if (n_ref0, n_ref1) == (1, 1):
        w.u(0, 1)  # num_ref_idx_active_override (PPS defaults = 1, 1)
    else:
        w.u(1, 1)
        w.ue(n_ref0 - 1)
        w.ue(n_ref1 - 1)
    w.u(0, 1)    # ref_pic_list_modification_flag_l0
    w.u(0, 1)    # ref_pic_list_modification_flag_l1
    if ref_idc != 0:  # dec_ref_pic_marking only on reference pictures
        w.u(0, 1)    # adaptive_ref_pic_marking (sliding window)
    w.se(0)      # slice_qp_delta
    w.ue(deblock_idc)
    for mb, desc in enumerate(mbs):
        w.ue(0)  # mb_skip_run (B_Skip = direct mode: never emitted)
        if desc[0] in ("bl0", "bl1", "bbi", "b16x8", "b8x16"):
            _encode_b_inter_mb(w, shadow, mb, desc, qp, 0,
                               n_ref0=n_ref0, n_ref1=n_ref1)
        else:
            mx, my = mb % w_mbs, mb // w_mbs
            shadow.blk_ref1[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = -1
            _encode_mb(w, shadow, mb, desc, qp, 0, ptype_off=23)
    w.rbsp_trailing()
    return _nal(1, w.tobytes(), ref_idc=ref_idc)


# ---------------------------------------------------------------------------
# In-loop deblocking filter (8.7), I-frame subset: bS is 4 on macroblock
# edges and 3 on internal 4x4 edges (every MB is intra), so only the
# bS=3 column of the tc0 table and the strong-filter path are exercised.
# Tables transcribed from Tables 8-16/8-17; validated by monotonicity +
# anchor checks and a second independent transcription in the tests
# (same external-interop caveat as the CAVLC tables — no reference
# decoder exists in this container).
# ---------------------------------------------------------------------------

_ALPHA = [0] * 16 + [4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25,
                     28, 32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113,
                     127, 144, 162, 182, 203, 226, 255, 255]
_BETA = [0] * 16 + [2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9, 9,
                    10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16,
                    17, 17, 18, 18]
# tc0 by (indexA, bS-1); bS in 1..3
_TC0 = [[0, 0, 0]] * 17 + [
    [0, 0, 1], [0, 0, 1], [0, 1, 1], [0, 1, 1], [1, 1, 1], [1, 1, 1],
    [1, 1, 1], [1, 1, 2], [1, 1, 2], [1, 1, 2], [1, 1, 2], [1, 2, 3],
    [1, 2, 3], [2, 2, 3], [2, 2, 4], [2, 3, 4], [2, 3, 4], [3, 3, 5],
    [3, 4, 6], [3, 4, 6], [4, 5, 7], [4, 5, 8], [4, 6, 9], [5, 7, 10],
    [6, 8, 11], [6, 8, 13], [7, 10, 14], [8, 11, 16], [9, 12, 18],
    [10, 13, 20], [11, 15, 23], [13, 17, 25], [14, 19, 28], [16, 21, 31],
    [18, 23, 34],
]


def _clip3(lo, hi, v):
    return lo if v < lo else hi if v > hi else v


def _filter_edge_luma(plane, xs, ys, dx, dy, bs, qpa, off_a, off_b):
    """Filter one 4-sample luma edge segment starting at (xs, ys), with
    the edge normal along (dx, dy) (p side at -1, q side at 0) and the
    edge direction perpendicular. ``plane`` is row-indexable
    (``plane[y][x]``): deblock_frame passes nested Python lists — per-
    sample indexing of a numpy array is ~5x slower, and this is the
    decoder's hottest loop — while unit tests may pass ndarrays."""
    idx_a = _clip3(0, 51, qpa + off_a)
    idx_b = _clip3(0, 51, qpa + off_b)
    alpha, beta = _ALPHA[idx_a], _BETA[idx_b]
    if alpha == 0 or beta == 0:
        return
    ex, ey = (0, 1) if dx else (1, 0)  # direction along the edge
    for k in range(4):
        x, y = xs + k * ex, ys + k * ey
        # p0..p3 at offsets -1..-4 along the normal; q0..q3 at 0..3
        # (unrolled into locals: the two 4-element list builds per sample
        # line were ~25% of this function's cost, the decoder's hottest)
        if dx:
            row = plane[y]
            p0 = row[x - 1]
            p1 = row[x - 2]
            p2 = row[x - 3]
            q0 = row[x]
            q1 = row[x + 1]
            q2 = row[x + 2]
        else:
            p0 = plane[y - 1][x]
            p1 = plane[y - 2][x]
            p2 = plane[y - 3][x]
            q0 = plane[y][x]
            q1 = plane[y + 1][x]
            q2 = plane[y + 2][x]
        # Uniform-line no-op exit (exact algebra, any stream): with
        # p2==p1==p0==q0==q1==q2 the weak filter's delta and p1/q1
        # updates are 0, and the strong filter reproduces every sample
        # — provided p3/q3 match too, which only the strong path reads.
        if p0 == q0 and p1 == p0 and q1 == p0 and p2 == p0 and q2 == p0:
            if bs != 4:
                continue
            if dx:
                if row[x - 4] == p0 and row[x + 3] == p0:
                    continue
            elif plane[y - 4][x] == p0 and plane[y + 3][x] == p0:
                continue
        if not (abs(p0 - q0) < alpha and abs(p1 - p0) < beta
                and abs(q1 - q0) < beta):
            continue
        ap = abs(p2 - p0) < beta
        aq = abs(q2 - q0) < beta
        if bs == 4:
            strong = abs(p0 - q0) < (alpha >> 2) + 2
            if ap and strong:
                p3 = plane[y][x - 4] if dx else plane[y - 4][x]
                np0 = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
                np1 = (p2 + p1 + p0 + q0 + 2) >> 2
                np2 = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
            else:
                np0 = (2 * p1 + p0 + q1 + 2) >> 2
                np1, np2 = p1, p2
            if aq and strong:
                q3 = plane[y][x + 3] if dx else plane[y + 3][x]
                nq0 = (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3
                nq1 = (q2 + q1 + q0 + p0 + 2) >> 2
                nq2 = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
            else:
                nq0 = (2 * q1 + q0 + p1 + 2) >> 2
                nq1, nq2 = q1, q2
            if dx:
                row[x - 1] = np0
                row[x - 2] = np1
                row[x - 3] = np2
                row[x] = nq0
                row[x + 1] = nq1
                row[x + 2] = nq2
            else:
                plane[y - 1][x] = np0
                plane[y - 2][x] = np1
                plane[y - 3][x] = np2
                plane[y][x] = nq0
                plane[y + 1][x] = nq1
                plane[y + 2][x] = nq2
        else:
            tc0 = _TC0[idx_a][bs - 1]
            tc = tc0 + (1 if ap else 0) + (1 if aq else 0)
            delta = _clip3(-tc, tc,
                           (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
            np0 = _clip3(0, 255, p0 + delta)
            nq0 = _clip3(0, 255, q0 - delta)
            if dx:
                row[x - 1] = np0
                row[x] = nq0
                if ap:
                    row[x - 2] = p1 + _clip3(
                        -tc0, tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1
                    )
                if aq:
                    row[x + 1] = q1 + _clip3(
                        -tc0, tc0, (q2 + ((q0 + p0 + 1) >> 1) - 2 * q1) >> 1
                    )
            else:
                plane[y - 1][x] = np0
                plane[y][x] = nq0
                if ap:
                    plane[y - 2][x] = p1 + _clip3(
                        -tc0, tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1
                    )
                if aq:
                    plane[y + 1][x] = q1 + _clip3(
                        -tc0, tc0, (q2 + ((q0 + p0 + 1) >> 1) - 2 * q1) >> 1
                    )


def _filter_edge_chroma(plane, xs, ys, dx, dy, bs, qpa, off_a, off_b):
    """One 2-sample chroma edge segment (chroma filters only p0/q0)."""
    idx_a = _clip3(0, 51, qpa + off_a)
    idx_b = _clip3(0, 51, qpa + off_b)
    alpha, beta = _ALPHA[idx_a], _BETA[idx_b]
    if alpha == 0 or beta == 0:
        return
    ex, ey = (0, 1) if dx else (1, 0)
    for k in range(2):
        x, y = xs + k * ex, ys + k * ey
        if dx:
            row = plane[y]
            p0, p1 = row[x - 1], row[x - 2]
            q0, q1 = row[x], row[x + 1]
        else:
            p0, p1 = plane[y - 1][x], plane[y - 2][x]
            q0, q1 = plane[y][x], plane[y + 1][x]
        # uniform-line no-op exit (exact: both branches reproduce p0/q0)
        if p0 == q0 and p1 == p0 and q1 == p0:
            continue
        if not (abs(p0 - q0) < alpha and abs(p1 - p0) < beta
                and abs(q1 - q0) < beta):
            continue
        if bs == 4:
            np0 = (2 * p1 + p0 + q1 + 2) >> 2
            nq0 = (2 * q1 + q0 + p1 + 2) >> 2
        else:
            tc = _TC0[idx_a][bs - 1] + 1
            delta = _clip3(-tc, tc,
                           (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
            np0 = _clip3(0, 255, p0 + delta)
            nq0 = _clip3(0, 255, q0 - delta)
        if dx:
            row[x - 1] = np0
            row[x] = nq0
        else:
            plane[y - 1][x] = np0
            plane[y][x] = nq0


def _edge_bs_fast(refl, nnzl, mvl, pbx: int, pby: int, qbx: int, qby: int,
                  mb_edge: bool) -> int:
    """_edge_bs over row-indexable block state (nested lists in the hot
    path; deblock_frame extracts them from the frame once)."""
    p_ref, q_ref = refl[pby][pbx], refl[qby][qbx]
    if p_ref < 0 or q_ref < 0:  # intra (-1) — and -2 never survives decode
        return 4 if mb_edge else 3
    if nnzl[pby][pbx] or nnzl[qby][qbx]:
        return 2
    if p_ref != q_ref:
        return 1
    pmv, qmv = mvl[pby][pbx], mvl[qby][qbx]
    if abs(pmv[0] - qmv[0]) >= 4 or abs(pmv[1] - qmv[1]) >= 4:
        return 1
    return 0


def _edge_bs(fr: _Frame, pbx: int, pby: int, qbx: int, qby: int,
             mb_edge: bool) -> int:
    """Boundary strength for the edge between 4x4 blocks p and q
    (8.7.2.1, I/P subset): 4/3 when either side is intra (MB edge /
    internal), 2 when either side carries coefficients, 1 on a >=1-pel
    quarter-mv component difference or reference mismatch, else 0 (the
    edge is not filtered)."""
    return _edge_bs_fast(fr.blk_ref, fr.blk_nnz, fr.blk_mv,
                         pbx, pby, qbx, qby, mb_edge)


def deblock_frame(fr: _Frame) -> None:
    """Apply the in-loop deblocking filter to the reconstructed frame
    (8.7, I/P subset). Per-MB state captured during decode drives it:
    ``fr.mb_qp`` (0 for I_PCM per the spec), ``fr.mb_deblock`` (the
    slice's disable_deblocking_filter_idc), ``fr.mb_off_a``/``mb_off_b``
    (slice alpha/beta offsets), ``fr.mb_cqpo`` (the slice's PPS chroma
    qp offset — per MB, since slices may reference different PPS),
    ``fr.mb_slice``; boundary strengths come per 4-sample segment from
    ``_edge_bs`` over the blocks' intra/nnz/mv/ref state. MBs filter in
    raster order — vertical edges left-to-right then horizontal
    top-to-bottom — each edge reading the partially filtered samples, as
    the spec requires.

    The per-sample loops run over nested Python LISTS extracted from the
    numpy state once and written back once at the end: the filter reads/
    writes individual samples in data-dependent order (inherently
    scalar), and numpy per-element indexing made this the decoder's
    hottest path (the r12 bench's top non-store cost) — the list-backed
    pass is ~4x faster with bit-identical integer math."""
    if int(fr.mb_deblock.min()) == 1:
        return  # every slice disabled the filter: nothing to do
    # All-zero-bS whole-frame skip (exact sufficient condition): with no
    # intra block (ref >= 0 everywhere; -1 intra / -2 undecoded are < 0),
    # no residual coefficients, one reference and one uniform mv, every
    # edge's boundary strength is 0 — P_Skip-dominated frames filter
    # nothing, so skip the 12 tolist conversions and the MB loop.
    ref = fr.blk_ref
    if not (ref < 0).any() and not fr.blk_nnz.any():
        mvf = fr.blk_mv.reshape(-1, 2)
        if (ref == ref.flat[0]).all() and (mvf == mvf[0]).all():
            return
    yl = fr.y.tolist()
    cbl = fr.cb.tolist()
    crl = fr.cr.tolist()
    refl = fr.blk_ref.tolist()
    nnzl = fr.blk_nnz.tolist()
    mvl = fr.blk_mv.tolist()
    mbq = fr.mb_qp.tolist()
    mbd = fr.mb_deblock.tolist()
    mba = fr.mb_off_a.tolist()
    mbb = fr.mb_off_b.tolist()
    mbsl = fr.mb_slice.tolist()
    cq1 = fr.mb_cqpo.tolist()
    cq2 = fr.mb_cqpo2.tolist()
    for mby in range(fr.hmb):
        for mbx in range(fr.wmb):
            idc = mbd[mby][mbx]
            if idc == 1:
                continue
            off_a = mba[mby][mbx]
            off_b = mbb[mby][mbx]
            qp_cur = mbq[mby][mbx]
            sid = mbsl[mby][mbx]

            def neighbor_ok(nx, ny):
                if nx < 0 or ny < 0:
                    return False
                if idc == 2 and mbsl[ny][nx] != sid:
                    return False  # idc 2: don't cross slice boundaries
                return True

            px, py = mbx * 16, mby * 16
            cx, cy = mbx * 8, mby * 8
            bx0, by0 = mbx * 4, mby * 4
            # vertical edges (normal = x)
            for e in range(4):
                if e == 0:
                    if not neighbor_ok(mbx - 1, mby):
                        continue
                    qp_n = mbq[mby][mbx - 1]
                else:
                    qp_n = qp_cur
                qpa = (qp_cur + qp_n + 1) >> 1
                seg_bs = [
                    _edge_bs_fast(refl, nnzl, mvl, bx0 + e - 1, by0 + seg,
                                  bx0 + e, by0 + seg, mb_edge=(e == 0))
                    for seg in range(4)
                ]
                for seg in range(4):
                    if seg_bs[seg]:
                        _filter_edge_luma(yl, px + 4 * e, py + 4 * seg,
                                          1, 0, seg_bs[seg], qpa, off_a, off_b)
                if e in (0, 2):
                    # per-plane offsets: Cr deblocks at its own QPc when
                    # the PPS set second_chroma_qp_index_offset (8.7.2)
                    for plane, cqpo in (
                        (cbl, cq1[mby][mbx]),
                        (crl, cq2[mby][mbx]),
                    ):
                        qpc_a = (chroma_qp(qp_cur, cqpo)
                                 + chroma_qp(qp_n, cqpo) + 1) >> 1
                        for seg in range(4):
                            if seg_bs[seg]:
                                _filter_edge_chroma(plane, cx + 2 * e,
                                                    cy + 2 * seg, 1, 0,
                                                    seg_bs[seg],
                                                    qpc_a, off_a, off_b)
            # horizontal edges (normal = y)
            for e in range(4):
                if e == 0:
                    if not neighbor_ok(mbx, mby - 1):
                        continue
                    qp_n = mbq[mby - 1][mbx]
                else:
                    qp_n = qp_cur
                qpa = (qp_cur + qp_n + 1) >> 1
                seg_bs = [
                    _edge_bs_fast(refl, nnzl, mvl, bx0 + seg, by0 + e - 1,
                                  bx0 + seg, by0 + e, mb_edge=(e == 0))
                    for seg in range(4)
                ]
                for seg in range(4):
                    if seg_bs[seg]:
                        _filter_edge_luma(yl, px + 4 * seg, py + 4 * e,
                                          0, 1, seg_bs[seg], qpa, off_a, off_b)
                if e in (0, 2):
                    for plane, cqpo in (
                        (cbl, cq1[mby][mbx]),
                        (crl, cq2[mby][mbx]),
                    ):
                        qpc_a = (chroma_qp(qp_cur, cqpo)
                                 + chroma_qp(qp_n, cqpo) + 1) >> 1
                        for seg in range(4):
                            if seg_bs[seg]:
                                _filter_edge_chroma(plane, cx + 2 * seg,
                                                    cy + 2 * e, 0, 1,
                                                    seg_bs[seg],
                                                    qpc_a, off_a, off_b)
    fr.y[...] = yl
    fr.cb[...] = cbl
    fr.cr[...] = crl


# ===========================================================================
# CABAC entropy coding (ITU-T H.264 clause 9.3), I-slice subset.
#
# What is spec-exact here (transcribed from the published clause text):
# the arithmetic decoding engine (9.3.3.2: DecodeDecision/DecodeBypass/
# DecodeTerminate with the 64-state LPS range table and state-transition
# tables), the encoding engine (9.3.4 flowcharts incl. PutBit outstanding
# -bit handling and EncodeFlush), binarizations (9.3.2: U, TU, FL, UEG0
# with uCoff=14 for levels), context SELECTION topology (9.3.3.1: every
# neighbor-derived ctxIdxInc rule for the I-slice syntax elements), and
# the residual significance-map flow (7.3.5.3.3).
#
# What is best-effort: the context INITIALIZATION constants (_CTX_INIT_I,
# the I-slice column of Tables 9-12..9-23) are transcribed from working
# knowledge of the published tables and could carry per-entry errors.
# Consequences are bounded: the fixture encoder below shares the table,
# so every in-repo stream round-trips bit-exactly regardless; an init
# mismatch against an EXTERNAL conformant stream desynchronizes the
# arithmetic decoder, which in practice hits a syntax violation within a
# few macroblocks and degrades to the documented NULL row (no reference
# decoder exists in this environment to validate against — the same
# residual-interop caveat COVERAGE.md records for CAVLC, wider here).
#
# Scope refusals (honest NULL rows upstream): CABAC P slices only (the
# inter context families' ~800 init constants have no in-sandbox ground
# truth — fabricating them would be known-wrong). mb_qp_delta != 0 is
# both decoded AND emitted (qp_deltas=, cross-entropy-tested); I_PCM
# inside CABAC slices WORKS as of r13 (mid-slice engine
# re-initialization per 9.3.1.2, contexts persisting; the
# encoder/decoder bit-position contract at the terminate-bin flush was
# verified constant over randomized prefixes).
# ===========================================================================

#: Table 9-44: rangeTabLPS[pStateIdx][qCodIRangeIdx]
_RANGE_LPS = (
    (128, 176, 208, 240), (128, 167, 197, 227), (128, 158, 187, 216),
    (123, 150, 178, 205), (116, 142, 169, 195), (111, 135, 160, 185),
    (105, 128, 152, 175), (100, 122, 144, 166), (95, 116, 137, 158),
    (90, 110, 130, 150), (85, 104, 123, 142), (81, 99, 117, 135),
    (77, 94, 111, 128), (73, 89, 105, 122), (69, 85, 100, 116),
    (66, 80, 95, 110), (62, 76, 90, 104), (59, 72, 86, 99),
    (56, 69, 81, 94), (53, 65, 77, 89), (51, 62, 73, 85),
    (48, 59, 69, 80), (46, 56, 66, 76), (43, 53, 63, 72),
    (41, 50, 59, 69), (39, 48, 56, 65), (37, 45, 54, 62),
    (35, 43, 51, 59), (33, 41, 48, 56), (32, 39, 46, 53),
    (30, 37, 43, 50), (29, 35, 41, 48), (27, 33, 39, 45),
    (26, 31, 37, 43), (24, 30, 35, 41), (23, 28, 33, 39),
    (22, 27, 32, 37), (21, 26, 30, 35), (20, 24, 29, 33),
    (19, 23, 27, 31), (18, 22, 26, 30), (17, 21, 25, 28),
    (16, 20, 23, 27), (15, 19, 22, 25), (14, 18, 21, 24),
    (14, 17, 20, 23), (13, 16, 19, 22), (12, 15, 18, 21),
    (12, 14, 17, 20), (11, 14, 16, 19), (11, 13, 15, 18),
    (10, 12, 15, 17), (10, 12, 14, 16), (9, 11, 13, 15),
    (9, 11, 12, 14), (8, 10, 12, 14), (8, 9, 11, 13),
    (7, 9, 11, 12), (7, 9, 10, 12), (7, 8, 10, 11),
    (6, 8, 9, 11), (6, 7, 9, 10), (6, 7, 8, 9), (2, 2, 2, 2),
)

#: Table 9-45: transIdxLPS (MPS transition is min(state+1, 62))
_TRANS_LPS = (
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 23, 22, 23, 24,
    24, 25, 26, 26, 27, 28, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
    33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63,
)

#: I-slice context initialization (m, n) — Tables 9-12..9-23 intra column
#: for the context families the I-slice decoder uses (see the epistemic
#: note in the section header).
_CTX_INIT_I: dict[int, tuple[int, int]] = {}
_CTX_INIT_I.update({i + 0: mn for i, mn in enumerate([
    (20, -15), (2, 54), (3, 74), (20, -15), (2, 54), (3, 74),
    (-28, 127), (-23, 104), (-6, 53), (-1, 54), (7, 51),     # 0-10 mb_type
])})
_CTX_INIT_I.update({i + 60: mn for i, mn in enumerate([
    (0, 41), (0, 63), (0, 63), (0, 63),                       # 60-63 qp_delta
    (-9, 83), (4, 86), (0, 97), (-7, 72),                     # 64-67 chroma pm
    (13, 41), (3, 62),                                        # 68-69 intra4x4
    (0, 45), (-4, 78), (-3, 96),                              # 70-72 (field)
    (-27, 126), (-28, 98), (-25, 101), (-23, 67),             # 73-76 cbp luma
    (-28, 82), (-20, 94), (-16, 83), (-22, 110),              # 77-80 cbp chroma
    (-21, 91), (-18, 102), (-13, 93), (-29, 127),             # 81-84 cbp chroma
])})
_CTX_INIT_I.update({i + 85: mn for i, mn in enumerate([
    (-7, 92), (-5, 89), (-7, 96), (-13, 108), (-3, 46),       # 85-104 cbf
    (-1, 65), (0, 57), (-9, 93), (-3, 74), (-9, 92),
    (-8, 87), (-23, 126), (5, 54), (6, 60), (6, 59),
    (6, 69), (-1, 48), (0, 68), (-4, 69), (-8, 88),
])})
_CTX_INIT_I.update({i + 105: mn for i, mn in enumerate([
    (-2, 85), (-6, 78), (-1, 75), (-7, 77), (2, 54),          # 105+ sig (frame)
    (5, 50), (-3, 68), (1, 50), (6, 42), (-4, 81),
    (1, 63), (-4, 70), (0, 67), (2, 57), (-2, 76),
    (11, 35), (4, 64), (1, 61), (11, 35), (18, 25),
    (12, 24), (13, 29), (13, 36), (-10, 93), (-7, 73),
    (-2, 73), (13, 46), (9, 49), (-7, 100), (9, 53),
    (2, 53), (5, 53), (-2, 61), (0, 56), (0, 56),
    (-13, 63), (-5, 60), (-1, 62), (4, 57), (-6, 69),
    (4, 57), (14, 39), (4, 51), (13, 68), (3, 64),
    (1, 61), (9, 63), (7, 50), (16, 39), (5, 44),
    (4, 52), (11, 48), (-5, 60), (-1, 59), (0, 59),
    (22, 33), (5, 44), (14, 43), (-1, 78), (0, 60),
    (9, 69),
])})
_CTX_INIT_I.update({i + 166: mn for i, mn in enumerate([
    (11, 28), (2, 40), (3, 44), (0, 49), (0, 46),             # 166+ last (frame)
    (2, 44), (2, 51), (0, 47), (4, 39), (2, 62),
    (6, 46), (0, 54), (3, 54), (2, 58), (4, 63),
    (6, 51), (6, 57), (7, 53), (6, 52), (6, 55),
    (11, 45), (14, 36), (8, 53), (-1, 82), (7, 55),
    (-3, 78), (15, 46), (22, 31), (-1, 84), (25, 7),
    (30, -7), (28, 3), (28, 4), (32, 0), (34, -1),
    (30, 6), (30, 6), (32, 9), (31, 19), (26, 27),
    (26, 30), (37, 20), (28, 34), (17, 70), (1, 67),
    (5, 59), (9, 67), (16, 30), (18, 32), (18, 35),
    (22, 29), (24, 31), (23, 38), (18, 43), (20, 41),
    (11, 63), (9, 59), (9, 64), (-1, 94), (-2, 89),
    (-9, 108),
])})
_CTX_INIT_I.update({i + 227: mn for i, mn in enumerate([
    (-6, 76), (-2, 44), (0, 45), (0, 52), (-3, 64),           # 227+ levels
    (-2, 59), (-4, 70), (-4, 75), (-8, 82), (-17, 102),
    (-9, 77), (3, 24), (0, 42), (0, 48), (0, 55),
    (-6, 59), (-7, 71), (-12, 83), (-11, 87), (-30, 119),
    (1, 58), (-3, 29), (-1, 36), (1, 38), (2, 43),
    (-6, 55), (0, 58), (0, 64), (-3, 74), (-10, 90),
    (0, 70), (-4, 29), (5, 31), (7, 42), (1, 59),
    (-2, 58), (-3, 72), (-3, 81), (-11, 97), (0, 58),
    (8, 5), (10, 14), (14, 18), (13, 27), (2, 40),
    (0, 58), (-3, 70), (-6, 79), (-8, 85),
])})

#: sig/last per-category base offsets (Table 9-40 layout, frame coding)
_SIG_CAT_OFF = {0: 0, 1: 15, 2: 29, 3: 44, 4: 47}
#: level per-category base offsets
_LVL_CAT_OFF = {0: 0, 1: 10, 2: 20, 3: 30, 4: 39}
#: coded_block_flag: ctx 85 + 4*cat + inc
_CBF_BASE = 85


_CTX_TEMPLATES: dict[int, tuple[bytes, bytes]] = {}


def _ctx_state_arrays(slice_qp: int) -> tuple[bytearray, bytearray]:
    """(pStateIdx, valMPS) per ctxIdx as two flat bytearrays (9.3.1.1:
    preCtxState from (m, n) and the clipped slice QP). The derivation is
    memoized per QP (52 values) as immutable bytes; each call returns
    FRESH mutable copies — the engines adapt them as they code. Flat
    byte arrays replace the former dict-of-[s,v]-lists: per-slice init
    is two C-level copies instead of a 227-entry dict build, and the
    per-bin hot path indexes bytearrays instead of dereferencing lists."""
    qp = max(0, min(51, slice_qp))
    tpl = _CTX_TEMPLATES.get(qp)
    if tpl is None:
        size = max(_CTX_INIT_I) + 1
        ss, vv = bytearray(size), bytearray(size)
        for idx, (m, n) in _CTX_INIT_I.items():
            pre = max(1, min(126, ((m * qp) >> 4) + n))
            if pre <= 63:
                ss[idx] = 63 - pre
            else:
                ss[idx], vv[idx] = pre - 64, 1
        tpl = (bytes(ss), bytes(vv))
        _CTX_TEMPLATES[qp] = tpl
    return bytearray(tpl[0]), bytearray(tpl[1])


_CTX_TEMPLATES_F: dict[int, bytes] = {}


def _ctx_state_fused(slice_qp: int) -> bytearray:
    """Single flat bytearray of (pStateIdx << 1) | valMPS per ctxIdx —
    the engines' per-bin hot path reads/writes ONE cell instead of one
    per array (decision() showed 2 reads + 1 write per bin on the split
    st_s/st_v layout). Memoized per QP like _ctx_state_arrays."""
    qp = max(0, min(51, slice_qp))
    tpl = _CTX_TEMPLATES_F.get(qp)
    if tpl is None:
        ss, vv = _ctx_state_arrays(qp)
        tpl = bytes((s << 1) | v for s, v in zip(ss, vv))
        _CTX_TEMPLATES_F[qp] = tpl
    return bytearray(tpl)


def _init_ctx_states(slice_qp: int) -> dict[int, list[int]]:
    """Dict view (ctxIdx -> [pStateIdx, valMPS]) of the initial context
    states — kept for tests/introspection; the engines use the flat
    arrays from :func:`_ctx_state_arrays` directly."""
    ss, vv = _ctx_state_arrays(slice_qp)
    return {idx: [ss[idx], vv[idx]] for idx in _CTX_INIT_I}


class CabacDecoder:
    """Arithmetic decoding engine (9.3.3.2) over a byte-aligned
    BitReader position."""

    def __init__(self, r: BitReader, slice_qp: int):
        self.r = r
        self.rng = 510
        self.off = r.u(9)
        if self.off >= 510:
            raise H264Error("invalid CABAC initial codIOffset")
        self.st = _ctx_state_fused(slice_qp)
        self.prev_qp_delta_nz = False

    def decision(self, idx: int) -> int:
        # hot path: one call per regular bin — locals over attributes,
        # renorm bit reads inlined (a method call per bit doubles cost);
        # context state is the fused (pState << 1) | valMPS byte
        st_arr = self.st
        st = st_arr[idx]
        s0 = st >> 1
        rng = self.rng
        lps = _RANGE_LPS[s0][(rng >> 6) & 3]
        rng -= lps
        off = self.off
        if off >= rng:
            v = st & 1
            bit = 1 - v
            off -= rng
            rng = lps
            # MPS flips when pState was 0: new valMPS == bit
            st_arr[idx] = (_TRANS_LPS[s0] << 1) | (bit if s0 == 0 else v)
        else:
            bit = st & 1
            if s0 < 62:
                st_arr[idx] = st + 2
        if rng < 256:
            r = self.r
            data = r.data
            pos = r.pos
            n8 = len(data) << 3
            while rng < 256:
                if pos >= n8:
                    raise H264Error("bitstream truncated")
                rng <<= 1
                off = (off << 1) | ((data[pos >> 3] >> (7 - (pos & 7))) & 1)
                pos += 1
            r.pos = pos
        self.rng = rng
        self.off = off
        return bit

    def bypass(self) -> int:
        self.off = (self.off << 1) | self.r.bit()
        if self.off >= self.rng:
            self.off -= self.rng
            return 1
        return 0

    def decode_terminate(self) -> int:
        self.rng -= 2
        if self.off >= self.rng:
            return 1
        while self.rng < 256:
            self.rng <<= 1
            self.off = (self.off << 1) | self.r.bit()
        return 0


class CabacEncoder:
    """Arithmetic encoding engine (9.3.4) writing into a byte-aligned
    BitWriter; shares the context tables/transitions with the decoder."""

    def __init__(self, w: BitWriter, slice_qp: int):
        self.w = w
        self.rng = 510
        self.low = 0
        self.first = True
        self.outstanding = 0
        self.st = _ctx_state_fused(slice_qp)
        self.prev_qp_delta_nz = False
        # pending output bits, MSB-first (value, count): _putbit runs per
        # renorm step, so buffering them into one int and flushing in
        # >= 64-bit chunks replaces ~8 BitWriter.u calls with one
        self._acc = 0
        self._an = 0

    def _putbit(self, b: int) -> None:
        if self.first:
            self.first = False
        else:
            self._acc = (self._acc << 1) | b
            self._an += 1
        o = self.outstanding
        if o:
            self._acc = (self._acc << o) | (((1 << o) - 1) if b == 0 else 0)
            self._an += o
            self.outstanding = 0
        if self._an >= 64:
            self.w.u(self._acc, self._an)
            self._acc = 0
            self._an = 0

    def _flush_bits(self) -> None:
        if self._an:
            self.w.u(self._acc, self._an)
            self._acc = 0
            self._an = 0

    def _renorm(self) -> None:
        while self.rng < 256:
            if self.low < 256:
                self._putbit(0)
            elif self.low >= 512:
                self.low -= 512
                self._putbit(1)
            else:
                self.low -= 256
                self.outstanding += 1
            self.rng <<= 1
            self.low <<= 1

    def decision(self, idx: int, bit: int) -> None:
        st_arr = self.st
        st = st_arr[idx]
        s0 = st >> 1
        lps = _RANGE_LPS[s0][(self.rng >> 6) & 3]
        self.rng -= lps
        v = st & 1
        if bit != v:
            self.low += self.rng
            self.rng = lps
            st_arr[idx] = (_TRANS_LPS[s0] << 1) | ((1 - v) if s0 == 0 else v)
        else:
            if s0 < 62:
                st_arr[idx] = st + 2
        self._renorm()

    def bypass(self, bit: int) -> None:
        self.low <<= 1
        if bit:
            self.low += self.rng
        if self.low >= 1024:
            self._putbit(1)
            self.low -= 1024
        elif self.low < 512:
            self._putbit(0)
        else:
            self.low -= 512
            self.outstanding += 1

    def terminate(self, bit: int) -> None:
        self.rng -= 2
        if bit:
            self.low += self.rng
            # EncodeFlush (9.3.4.6)
            self.rng = 2
            self._renorm()
            self._putbit((self.low >> 9) & 1)
            self._flush_bits()
            self.w.u(((self.low >> 7) & 3) | 1, 2)
        else:
            self._renorm()


# ---------------------------------------------------------------------------
# context-increment helpers (9.3.3.1) — shared by decode and the fixture
# encoder so the context SELECTION can never diverge between them
# ---------------------------------------------------------------------------

def _mb_avail(fr: _Frame, x: int, y: int, slice_id: int) -> bool:
    return (0 <= x < fr.wmb and 0 <= y < fr.hmb and fr.mb_done[y, x]
            and fr.mb_slice[y, x] == slice_id)


def _mbtype_inc(fr: _Frame, mbx: int, mby: int, slice_id: int) -> int:
    """9.3.3.1.1.3: condTermFlagN = N available and not I_4x4 (I_NxN).
    Straight-line (no per-call closures: this runs once per CABAC MB)."""
    done, msl, i4 = fr.mb_done, fr.mb_slice, fr.mb_i4
    inc = 0
    x = mbx - 1
    if x >= 0 and done[mby, x] and msl[mby, x] == slice_id and not i4[mby, x]:
        inc = 1
    y = mby - 1
    if y >= 0 and done[y, mbx] and msl[y, mbx] == slice_id and not i4[y, mbx]:
        inc += 1
    return inc


def _cpm_inc(fr: _Frame, mbx: int, mby: int, slice_id: int) -> int:
    """9.3.3.1.1.8: condTermFlagN = N available and its
    intra_chroma_pred_mode != 0. Straight-line like _mbtype_inc."""
    done, msl, cpm = fr.mb_done, fr.mb_slice, fr.mb_cpm
    inc = 0
    x = mbx - 1
    if x >= 0 and done[mby, x] and msl[mby, x] == slice_id and cpm[mby, x]:
        inc = 1
    y = mby - 1
    if y >= 0 and done[y, mbx] and msl[y, mbx] == slice_id and cpm[y, mbx]:
        inc += 1
    return inc


#: (dx_mb, within-mb 8x8 for left) / top neighbor map of the 8x8 CBP grid
def _cbp_luma_inc(fr: _Frame, mbx: int, mby: int, i8: int, cur_bits: int,
                  slice_id: int) -> int:
    """9.3.3.1.1.4: condTermFlagN = 1 iff the neighboring 8x8 block's
    luma cbp bit is 0 (unavailable neighbor -> 0); within-MB neighbors
    read the bits decoded so far (cur_bits)."""
    def bit(x, y, j):
        if x == mbx and y == mby:
            return (cur_bits >> j) & 1
        if not _mb_avail(fr, x, y, slice_id):
            return None
        return (int(fr.mb_cbpl[y, x]) >> j) & 1
    if i8 % 2 == 0:
        a = bit(mbx - 1, mby, i8 + 1)
    else:
        a = bit(mbx, mby, i8 - 1)
    if i8 < 2:
        b = bit(mbx, mby - 1, i8 + 2)
    else:
        b = bit(mbx, mby, i8 - 2)
    ca = 1 if a == 0 else 0  # None (unavailable) -> 0
    cb = 1 if b == 0 else 0
    return ca + 2 * cb


def _cbp_chroma_incs(fr: _Frame, mbx: int, mby: int,
                     slice_id: int) -> tuple[int, int]:
    """(bin0 inc, bin1 inc) per 9.3.3.1.1.4: bin0 condTermFlagN =
    cbp_chroma(N) != 0; bin1 condTermFlagN = cbp_chroma(N) == 2."""
    def c(x, y, pred):
        return 1 if (_mb_avail(fr, x, y, slice_id)
                     and pred(int(fr.mb_cbpc[y, x]))) else 0
    inc0 = (c(mbx - 1, mby, lambda v: v != 0)
            + 2 * c(mbx, mby - 1, lambda v: v != 0))
    inc1 = (c(mbx - 1, mby, lambda v: v == 2)
            + 2 * c(mbx, mby - 1, lambda v: v == 2))
    return inc0, inc1


def _cbf_inc(fr: _Frame, cat: int, mbx: int, mby: int, slice_id: int,
             bx: int = 0, by: int = 0, comp: int = 0) -> int:
    """9.3.3.1.1.9 ctxIdxInc for coded_block_flag. Unavailable neighbors
    count 1 (the current MB is always intra in an I slice); available
    neighbors read the position's stored flag (0 covers both decoded-zero
    and no-such-transform-block, per the spec's condTermFlag fallbacks)."""
    if cat == 0:  # luma DC: neighbors at MB granularity
        def cond(x, y):
            if not _mb_avail(fr, x, y, slice_id):
                return 1
            return int(fr.cbf_lumadc[y, x])
        return cond(mbx - 1, mby) + 2 * cond(mbx, mby - 1)
    if cat in (1, 2):  # luma 4x4 (AC or full), position-based
        def cond(x, y):
            if x < 0 or y < 0:
                return 1
            if not _mb_avail(fr, x // 4, y // 4, slice_id) and not (
                x // 4 == mbx and y // 4 == mby
            ):
                return 1
            return int(fr.cbf_luma[y, x])
        return cond(bx - 1, by) + 2 * cond(bx, by - 1)
    if cat == 3:  # chroma DC, per component, MB granularity
        def cond(x, y):
            if not _mb_avail(fr, x, y, slice_id):
                return 1
            return int(fr.cbf_cdc[comp][y, x])
        return cond(mbx - 1, mby) + 2 * cond(mbx, mby - 1)
    # cat 4: chroma AC, per component, 2x2-per-MB grid
    def cond(x, y):
        if x < 0 or y < 0:
            return 1
        if not _mb_avail(fr, x // 2, y // 2, slice_id) and not (
            x // 2 == mbx and y // 2 == mby
        ):
            return 1
        return int(fr.cbf_cac[comp][y, x])
    return cond(bx - 1, by) + 2 * cond(bx, by - 1)


# ---------------------------------------------------------------------------
# residual block (7.3.5.3.3 residual_block_cabac)
# ---------------------------------------------------------------------------

def _residual_cabac(cd: CabacDecoder, cat: int, maxcoeff: int,
                    cbf_inc: int) -> "list[int] | None":
    """-> coefficient list (scan order, maxcoeff long) or None when
    coded_block_flag decodes 0."""
    if not cd.decision(_CBF_BASE + 4 * cat + cbf_inc):
        return None
    soff = 105 + _SIG_CAT_OFF[cat]
    loff = 166 + _SIG_CAT_OFF[cat]
    sig = [False] * maxcoeff
    last_found = False
    for i in range(maxcoeff - 1):
        if cd.decision(soff + i):
            sig[i] = True
            if cd.decision(loff + i):
                last_found = True
                break
    if not last_found:
        sig[maxcoeff - 1] = True
    coeffs = [0] * maxcoeff
    base = 227 + _LVL_CAT_OFF[cat]
    gt1 = eq1 = 0
    for i in reversed(range(maxcoeff)):
        if not sig[i]:
            continue
        # coeff_abs_level_minus1: UEG0, uCoff=14 (9.3.2.3); bin0 ctx from
        # eq1 history, later TU bins from gt1 history (9.3.3.1.3)
        inc0 = 0 if gt1 else min(4, 1 + eq1)
        n1 = 0
        if cd.decision(base + inc0):
            n1 = 1
            incr = 5 + min(3 if cat == 3 else 4, gt1)
            while n1 < 14 and cd.decision(base + incr):
                n1 += 1
            if n1 == 14:  # EG0 suffix, bypass-coded
                k = 0
                while cd.bypass():
                    n1 += 1 << k
                    k += 1
                    if k > 30:
                        raise H264Error("CABAC level suffix overrun")
                while k:
                    k -= 1
                    n1 += cd.bypass() << k
        level = n1 + 1
        if cd.bypass():  # coeff_sign_flag
            level = -level
        coeffs[i] = level
        if abs(level) > 1:
            gt1 += 1
        else:
            eq1 += 1
    return coeffs


def _encode_residual_cabac(enc: CabacEncoder, cat: int, coeffs,
                           cbf_inc: int) -> None:
    """Mirror of _residual_cabac for the fixture encoder; ``coeffs`` may
    be None / all-zero (cbf 0) or a maxcoeff-long scan-order list."""
    if coeffs is None or not any(coeffs):
        enc.decision(_CBF_BASE + 4 * cat + cbf_inc, 0)
        return
    enc.decision(_CBF_BASE + 4 * cat + cbf_inc, 1)
    maxcoeff = len(coeffs)
    soff = 105 + _SIG_CAT_OFF[cat]
    loff = 166 + _SIG_CAT_OFF[cat]
    last = max(i for i, v in enumerate(coeffs) if v)
    for i in range(min(last + 1, maxcoeff - 1)):
        s = 1 if coeffs[i] else 0
        enc.decision(soff + i, s)
        if s:
            enc.decision(loff + i, 1 if i == last else 0)
    base = 227 + _LVL_CAT_OFF[cat]
    gt1 = eq1 = 0
    for i in reversed(range(maxcoeff)):
        v = coeffs[i]
        if not v:
            continue
        mag = abs(v) - 1  # coeff_abs_level_minus1
        inc0 = 0 if gt1 else min(4, 1 + eq1)
        if mag == 0:
            enc.decision(base + inc0, 0)
        else:
            enc.decision(base + inc0, 1)
            incr = 5 + min(3 if cat == 3 else 4, gt1)
            for _ in range(min(mag, 14) - 1):
                enc.decision(base + incr, 1)
            if mag < 14:
                enc.decision(base + incr, 0)
            else:  # EG0 suffix
                s = mag - 14
                tmp = s + 1
                k = tmp.bit_length() - 1
                for _ in range(k):
                    enc.bypass(1)
                enc.bypass(0)
                for j in range(k - 1, -1, -1):
                    enc.bypass((tmp >> j) & 1)
        enc.bypass(1 if v < 0 else 0)  # coeff_sign_flag
        if abs(v) > 1:
            gt1 += 1
        else:
            eq1 += 1


# ---------------------------------------------------------------------------
# macroblock layer (7.3.5), CABAC I slices
# ---------------------------------------------------------------------------

def _decode_mb_cabac(fr: _Frame, cd: CabacDecoder, sps: dict, pps: dict,
                     mb: int, slice_id: int, qp: int) -> None:
    fr._ensure_cabac_state()
    mbx, mby = mb % fr.wmb, mb // fr.wmb
    bx0, by0 = mbx * 4, mby * 4

    # mb_type (Table 9-36 I-slice binarization; fixed ctx 3..10 after the
    # neighbor-conditioned first bin)
    inc = _mbtype_inc(fr, mbx, mby, slice_id)
    fr.mb_slice[mby, mbx] = slice_id
    fr.blk_ref[by0 : by0 + 4, bx0 : bx0 + 4] = -1
    if cd.decision(3 + inc) == 0:
        i16_pred = None  # I_4x4
    else:
        if cd.decode_terminate():
            # I_PCM (mb_type 25). The terminate bin's EncodeFlush leaves
            # the encoder and decoder at the SAME bit position (verified
            # against our 9.3.4 engine over randomized prefixes), so:
            # pcm_alignment_zero_bits to the byte boundary, 384 raw
            # sample bytes, then re-initialize the arithmetic DECODING
            # ENGINE only (9.3.1.2) — context states persist, per 9.3.1
            # context initialization happens at slice start alone.
            r = cd.r
            r.byte_align(0)
            raw = np.frombuffer(
                r.read_aligned_bytes(384), np.uint8
            ).astype(np.int64)
            px, py = mbx * 16, mby * 16
            cx, cy = mbx * 8, mby * 8
            fr.y[py : py + 16, px : px + 16] = raw[:256].reshape(16, 16)
            fr.cb[cy : cy + 8, cx : cx + 8] = raw[256:320].reshape(8, 8)
            fr.cr[cy : cy + 8, cx : cx + 8] = raw[320:].reshape(8, 8)
            fr.blk_done[by0 : by0 + 4, bx0 : bx0 + 4] = True
            fr.blk_slice[by0 : by0 + 4, bx0 : bx0 + 4] = slice_id
            fr.blk_nnz[by0 : by0 + 4, bx0 : bx0 + 4] = 16
            fr.blk_mode[by0 : by0 + 4, bx0 : bx0 + 4] = 2
            # CABAC neighbor state: coded_block_flags are 1 (9.3.3.1.1.9)
            # and coded_block_pattern infers 47 -> luma 15 / chroma 2
            # (7.4.5); intra_chroma_pred_mode condTermFlag is 0 for I_PCM
            # (mb_cpm stays 0); mb_i4 stays False (condTermFlag 1 for
            # mb_type)
            fr.cbf_luma[by0 : by0 + 4, bx0 : bx0 + 4] = 1
            fr.cbf_lumadc[mby, mbx] = 1
            for comp in range(2):
                fr.cbf_cdc[comp][mby, mbx] = 1
                fr.cbf_cac[comp][mby * 2 : mby * 2 + 2,
                                 mbx * 2 : mbx * 2 + 2] = 1
                fr.cnnz[comp][mby * 2 : mby * 2 + 2,
                              mbx * 2 : mbx * 2 + 2] = 16
            fr.mb_cbpl[mby, mbx] = 15
            fr.mb_cbpc[mby, mbx] = 2
            fr.mb_done[mby, mbx] = True
            fr.mb_qp[mby, mbx] = 0  # 8.7: I_PCM filters as QPy = 0
            fr._last_qp = qp  # 7.4.5: QPy carries over unchanged
            # 9.3.1.2: fresh engine state off the aligned bitstream
            cd.rng = 510
            cd.off = r.u(9)
            if cd.off >= 510:
                raise H264Error("invalid CABAC codIOffset after I_PCM")
            # previous mb_qp_delta is absent for I_PCM -> treated as 0
            cd.prev_qp_delta_nz = False
            return
        cbp_luma = 15 if cd.decision(6) else 0
        cbp_chroma = 1 + cd.decision(8) if cd.decision(7) else 0
        i16_pred = (cd.decision(9) << 1) | cd.decision(10)

    if i16_pred is None:
        modes = []
        local: dict = {}
        for i in range(16):
            bx = bx0 + _BLK_XY[i][0] // 4
            by = by0 + _BLK_XY[i][1] // 4
            pred_mode = _predicted_i4_mode(fr, bx, by, slice_id, local)
            if cd.decision(68):  # prev_intra4x4_pred_mode_flag
                mode = pred_mode
            else:  # rem: FL 3 bins, LSB first, all ctx 69
                rem = cd.decision(69)
                rem |= cd.decision(69) << 1
                rem |= cd.decision(69) << 2
                mode = rem if rem < pred_mode else rem + 1
            modes.append(mode)
            local[(bx, by)] = mode
        fr.blk_mode[by0 : by0 + 4, bx0 : bx0 + 4] = (
            np.array(modes, np.int32)[_BLK_Z2R].reshape(4, 4))
        fr.blk_done[by0 : by0 + 4, bx0 : bx0 + 4] = True
        fr.blk_slice[by0 : by0 + 4, bx0 : bx0 + 4] = slice_id
    else:
        modes = None

    # intra_chroma_pred_mode: TU cMax=3 (bin0 neighbor-conditioned)
    if cd.decision(64 + _cpm_inc(fr, mbx, mby, slice_id)) == 0:
        chroma_mode = 0
    elif cd.decision(67) == 0:
        chroma_mode = 1
    else:
        chroma_mode = 2 + cd.decision(67)
    fr.mb_cpm[mby, mbx] = chroma_mode

    if i16_pred is None:
        cbp_luma = 0
        for i8 in range(4):
            b = cd.decision(
                73 + _cbp_luma_inc(fr, mbx, mby, i8, cbp_luma, slice_id)
            )
            cbp_luma |= b << i8
        inc0, inc1 = _cbp_chroma_incs(fr, mbx, mby, slice_id)
        cbp_chroma = 0
        if cd.decision(77 + inc0):
            cbp_chroma = 1 + cd.decision(81 + inc1)
    fr.mb_cbpl[mby, mbx] = cbp_luma
    fr.mb_cbpc[mby, mbx] = cbp_chroma

    if i16_pred is not None or cbp_luma or cbp_chroma:
        # mb_qp_delta: U binarization, ctx 60+prev / 62 / 63 (9.3.3.1.1.5)
        k = 0
        if cd.decision(60 + (1 if cd.prev_qp_delta_nz else 0)):
            k = 1
            while k < 53 and cd.decision(62 if k == 1 else 63):
                k += 1
            if k >= 53:
                raise H264Error("mb_qp_delta overrun")
        delta = (k + 1) // 2 if k % 2 else -(k // 2)
        cd.prev_qp_delta_nz = k != 0
        qp = (qp + delta + 52) % 52
    else:
        cd.prev_qp_delta_nz = False
    fr._last_qp = qp

    # ---- residuals ----
    dc_levels = None
    if i16_pred is not None:
        dc = _residual_cabac(
            cd, 0, 16, _cbf_inc(fr, 0, mbx, mby, slice_id)
        )
        fr.cbf_lumadc[mby, mbx] = 0 if dc is None else 1
        dc_levels = dc if dc is not None else [0] * 16
    luma_coeffs = [None] * 16
    # Batched bookkeeping (exact, mirrors _decode_residuals): _cbf_inc
    # availability runs over _mb_avail + the cbf arrays, never blk_done/
    # blk_slice, and the A/B cbf neighbors always PRECEDE their prober
    # in z-order, so whole-MB slices replace 48 scalar numpy writes.
    fr.blk_done[by0 : by0 + 4, bx0 : bx0 + 4] = True
    fr.blk_slice[by0 : by0 + 4, bx0 : bx0 + 4] = slice_id
    fr.blk_nnz[by0 : by0 + 4, bx0 : bx0 + 4] = 0
    if cbp_luma:
        cat = 1 if i16_pred is not None else 2
        n = 15 if i16_pred is not None else 16
        for i in range(16):
            if not (cbp_luma & (1 << (i // 4))):
                continue
            bx = bx0 + _BLK_XY[i][0] // 4
            by = by0 + _BLK_XY[i][1] // 4
            blk = _residual_cabac(
                cd, cat, n,
                _cbf_inc(fr, cat, mbx, mby, slice_id, bx=bx, by=by),
            )
            fr.cbf_luma[by, bx] = 0 if blk is None else 1
            if blk is not None:
                luma_coeffs[i] = [0] + blk if i16_pred is not None else blk
                fr.blk_nnz[by, bx] = sum(1 for v in blk if v)
    chroma_dc = [[0] * 4, [0] * 4]
    if cbp_chroma:
        for comp in range(2):
            blk = _residual_cabac(
                cd, 3, 4, _cbf_inc(fr, 3, mbx, mby, slice_id, comp=comp)
            )
            fr.cbf_cdc[comp][mby, mbx] = 0 if blk is None else 1
            if blk is not None:
                chroma_dc[comp] = blk
    chroma_ac = [[None] * 4, [None] * 4]
    if cbp_chroma == 2:
        for comp in range(2):
            for j in range(4):
                cx2, cy2 = mbx * 2 + j % 2, mby * 2 + j // 2
                blk = _residual_cabac(
                    cd, 4, 15,
                    _cbf_inc(fr, 4, mbx, mby, slice_id,
                             bx=cx2, by=cy2, comp=comp),
                )
                fr.cbf_cac[comp][cy2, cx2] = 0 if blk is None else 1
                if blk is not None:
                    chroma_ac[comp][j] = [0] + blk
                    fr.cnnz[comp][cy2, cx2] = sum(1 for v in blk if v)
                else:
                    fr.cnnz[comp][cy2, cx2] = 0

    _reconstruct_intra(fr, mb, slice_id, qp, pps, i16_pred, modes,
                       chroma_mode, dc_levels, luma_coeffs, chroma_dc,
                       chroma_ac, cbp_chroma)


def _encode_mb_cabac(enc: CabacEncoder, fr: _Frame, mb: int, desc, qp: int,
                     slice_id: int = 0, qp_delta: int = 0) -> None:
    """Emit one INTRA macroblock of a CABAC I slice — the FULL descriptor
    vocabulary of _encode_mb including "pcm" (I_PCM: terminate-bin
    signal + EncodeFlush + byte-aligned raw samples + mid-slice engine
    re-initialization with contexts persisting, 9.3.1/9.3.1.2). The
    shadow-frame context state mirrors the decoder's exactly through
    the shared _*_inc helpers."""
    fr._ensure_cabac_state()
    mbx, mby = mb % fr.wmb, mb // fr.wmb
    bx0, by0 = mbx * 4, mby * 4
    kind = desc[0]
    if kind not in ("pcm", "i16", "i4"):
        raise H264Error(f"unknown MB descriptor {kind!r}")

    inc = _mbtype_inc(fr, mbx, mby, slice_id)
    fr.mb_slice[mby, mbx] = slice_id
    fr.blk_ref[by0 : by0 + 4, bx0 : bx0 + 4] = -1

    if kind == "pcm":
        if qp_delta:
            raise H264Error("I_PCM carries no mb_qp_delta")
        _, y, cb, cr = desc
        enc.decision(3 + inc, 1)
        enc.terminate(1)  # the I_PCM signal; terminate(1) EncodeFlushes
        w = enc.w
        w.byte_align(0)  # pcm_alignment_zero_bit
        w.put_bytes(np.asarray(y, np.int64).reshape(-1).astype(np.uint8).tobytes())
        for plane in (cb, cr):
            w.put_bytes(
                np.asarray(plane, np.int64).reshape(-1).astype(np.uint8).tobytes()
            )
        # re-initialize the ENCODING engine (the 9.3.4.3 mirror of the
        # decoder's 9.3.1.2 re-init): fresh range/low/first/outstanding,
        # context states persist
        enc.rng = 510
        enc.low = 0
        enc.first = True
        enc.outstanding = 0
        enc.prev_qp_delta_nz = False
        # frame bookkeeping identical to the decoder's I_PCM branch
        fr.blk_done[by0 : by0 + 4, bx0 : bx0 + 4] = True
        fr.blk_slice[by0 : by0 + 4, bx0 : bx0 + 4] = slice_id
        fr.blk_nnz[by0 : by0 + 4, bx0 : bx0 + 4] = 16
        fr.blk_mode[by0 : by0 + 4, bx0 : bx0 + 4] = 2
        fr.cbf_luma[by0 : by0 + 4, bx0 : bx0 + 4] = 1
        fr.cbf_lumadc[mby, mbx] = 1
        for comp in range(2):
            fr.cbf_cdc[comp][mby, mbx] = 1
            fr.cbf_cac[comp][mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 1
            fr.cnnz[comp][mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 16
        fr.mb_cbpl[mby, mbx] = 15
        fr.mb_cbpc[mby, mbx] = 2
        fr.mb_done[mby, mbx] = True
        return

    if kind == "i16":
        pred_mode, dc_levels, cdc = desc[1], desc[2], desc[3]
        ac16 = desc[4] if len(desc) > 4 else None
        cac = desc[5] if len(desc) > 5 else None
        if ac16 is not None and not any(
            blk is not None and any(blk) for blk in ac16
        ):
            ac16 = None
        cbp_luma = 15 if ac16 is not None else 0
        if cdc is not None and not (any(cdc[0]) or any(cdc[1])):
            cdc = None
        cbp_chroma = _chroma_cbp(cdc, cac)
        enc.decision(3 + inc, 1)
        enc.terminate(0)  # not I_PCM
        enc.decision(6, 1 if cbp_luma else 0)
        if cbp_chroma:
            enc.decision(7, 1)
            enc.decision(8, 1 if cbp_chroma == 2 else 0)
        else:
            enc.decision(7, 0)
        enc.decision(9, (pred_mode >> 1) & 1)
        enc.decision(10, pred_mode & 1)
        modes = None
    else:
        modes, coeffs, cdc = desc[1], desc[2], desc[3]
        cac = desc[4] if len(desc) > 4 else None
        if cdc is not None and not (any(cdc[0]) or any(cdc[1])):
            cdc = None
        cbp_luma = 0
        for i in range(16):
            if coeffs[i] is not None and any(coeffs[i]):
                cbp_luma |= 1 << (i // 4)
        cbp_chroma = _chroma_cbp(cdc, cac)
        enc.decision(3 + inc, 0)  # I_4x4
        local: dict = {}
        for i in range(16):
            bx = bx0 + _BLK_XY[i][0] // 4
            by = by0 + _BLK_XY[i][1] // 4
            pred = _predicted_i4_mode(fr, bx, by, slice_id, local)
            mode = modes[i]
            if mode == pred:
                enc.decision(68, 1)
            else:
                rem = mode if mode < pred else mode - 1
                if rem >= 8:
                    raise H264Error("cannot signal mode equal to predictor")
                enc.decision(68, 0)
                enc.decision(69, rem & 1)
                enc.decision(69, (rem >> 1) & 1)
                enc.decision(69, (rem >> 2) & 1)
            local[(bx, by)] = mode
        fr.blk_mode[by0 : by0 + 4, bx0 : bx0 + 4] = (
            np.array(modes, np.int32)[_BLK_Z2R].reshape(4, 4))
        fr.blk_done[by0 : by0 + 4, bx0 : bx0 + 4] = True
        fr.blk_slice[by0 : by0 + 4, bx0 : bx0 + 4] = slice_id

    # intra_chroma_pred_mode: DC (0) — one bin
    enc.decision(64 + _cpm_inc(fr, mbx, mby, slice_id), 0)
    fr.mb_cpm[mby, mbx] = 0

    if kind == "i4":
        bits = 0
        for i8 in range(4):
            b = (cbp_luma >> i8) & 1
            enc.decision(73 + _cbp_luma_inc(fr, mbx, mby, i8, bits,
                                            slice_id), b)
            bits |= b << i8
        inc0, inc1 = _cbp_chroma_incs(fr, mbx, mby, slice_id)
        if cbp_chroma:
            enc.decision(77 + inc0, 1)
            enc.decision(81 + inc1, 1 if cbp_chroma == 2 else 0)
        else:
            enc.decision(77 + inc0, 0)
    fr.mb_cbpl[mby, mbx] = cbp_luma
    fr.mb_cbpc[mby, mbx] = cbp_chroma

    if kind == "i16" or cbp_luma or cbp_chroma:
        # mb_qp_delta: U binarization of the 9.3.2.7 se mapping
        # (0,+1,-1,+2,-2,... -> k = 0,1,2,3,4,...), ctx 60+prev/62/63
        k = 2 * qp_delta - 1 if qp_delta > 0 else -2 * qp_delta
        prev = 1 if enc.prev_qp_delta_nz else 0
        if k == 0:
            enc.decision(60 + prev, 0)
        else:
            enc.decision(60 + prev, 1)
            j = 1
            while j < k:
                enc.decision(62 if j == 1 else 63, 1)
                j += 1
            enc.decision(62 if k == 1 else 63, 0)
        enc.prev_qp_delta_nz = k != 0
    elif qp_delta:
        raise H264Error(
            "qp_delta on an I_4x4 MB with no coded residual has no "
            "syntax slot"
        )
    else:
        enc.prev_qp_delta_nz = False

    # residuals
    if kind == "i16":
        _encode_residual_cabac(
            enc, 0, list(dc_levels), _cbf_inc(fr, 0, mbx, mby, slice_id)
        )
        fr.cbf_lumadc[mby, mbx] = 1 if any(dc_levels) else 0
        fr.blk_done[by0 : by0 + 4, bx0 : bx0 + 4] = True
        fr.blk_slice[by0 : by0 + 4, bx0 : bx0 + 4] = slice_id
        fr.blk_mode[by0 : by0 + 4, bx0 : bx0 + 4] = 2
        for i in range(16):  # AC blocks (cat 1) when cbp_luma = 15
            bx = bx0 + _BLK_XY[i][0] // 4
            by = by0 + _BLK_XY[i][1] // 4
            if cbp_luma:
                ac = ac16[i] if ac16[i] is not None else [0] * 15
                _encode_residual_cabac(
                    enc, 1, list(ac),
                    _cbf_inc(fr, 1, mbx, mby, slice_id, bx=bx, by=by),
                )
                fr.cbf_luma[by, bx] = 1 if any(ac) else 0
                fr.blk_nnz[by, bx] = sum(1 for v in ac if v)
            else:
                fr.blk_nnz[by, bx] = 0
    else:
        for i in range(16):
            bx = bx0 + _BLK_XY[i][0] // 4
            by = by0 + _BLK_XY[i][1] // 4
            if cbp_luma & (1 << (i // 4)):
                blk = coeffs[i] if coeffs[i] is not None else [0] * 16
                _encode_residual_cabac(
                    enc, 2, list(blk),
                    _cbf_inc(fr, 2, mbx, mby, slice_id, bx=bx, by=by),
                )
                fr.cbf_luma[by, bx] = 1 if any(blk) else 0
                fr.blk_nnz[by, bx] = sum(1 for v in blk if v)
            else:
                fr.blk_nnz[by, bx] = 0
    if cbp_chroma:
        for comp in range(2):
            dc = cdc[comp] if cdc is not None else [0] * 4
            _encode_residual_cabac(
                enc, 3, list(dc),
                _cbf_inc(fr, 3, mbx, mby, slice_id, comp=comp),
            )
            fr.cbf_cdc[comp][mby, mbx] = 1 if any(dc) else 0
    if cbp_chroma == 2:
        for comp in range(2):
            for j in range(4):
                cx2, cy2 = mbx * 2 + j % 2, mby * 2 + j // 2
                blk = cac[comp][j] if cac[comp][j] is not None else [0] * 15
                _encode_residual_cabac(
                    enc, 4, list(blk),
                    _cbf_inc(fr, 4, mbx, mby, slice_id,
                             bx=cx2, by=cy2, comp=comp),
                )
                fr.cbf_cac[comp][cy2, cx2] = 1 if any(blk) else 0
                fr.cnnz[comp][cy2, cx2] = sum(1 for v in blk if v)
    fr.mb_done[mby, mbx] = True
    if kind == "i4":
        fr.mb_i4[mby, mbx] = True


def encode_i_frame_cabac(mbs: list, w_mbs: int, h_mbs: int, qp: int = 26,
                         deblock_idc: int = 1,
                         qp_deltas: "list[int] | None" = None) -> bytes:
    """Single-slice convenience wrapper over
    :func:`encode_i_frame_cabac_slices`."""
    return encode_i_frame_cabac_slices(
        mbs, w_mbs, h_mbs, qp, deblock_idc, qp_deltas=qp_deltas
    )[0]


def encode_i_frame_cabac_slices(
    mbs: list, w_mbs: int, h_mbs: int, qp: int = 26,
    deblock_idc: int = 1, slice_starts: tuple = (0,),
    qp_deltas: "list[int] | None" = None,
) -> list[bytes]:
    """One CABAC IDR slice NAL covering the whole frame — the CABAC twin
    of encode_i_frame (same descriptor vocabulary minus "pcm"); pair it
    with a PPS from ``encode_sps_pps(..., cabac=True)``. Identical
    descriptors MUST reconstruct identical pixels under either entropy
    coder (both feed the shared _reconstruct_intra) — the property the
    cross-entropy tests pin."""
    if len(mbs) != w_mbs * h_mbs:
        raise H264Error("mb list does not cover the frame")
    if not slice_starts or slice_starts[0] != 0 or list(slice_starts) != sorted(set(slice_starts)):
        raise H264Error("slice_starts must be ascending and start at 0")
    shadow = _Frame({"width_mbs": w_mbs, "height_mbs": h_mbs})
    bounds = list(slice_starts) + [len(mbs)]
    nals = []
    for sid in range(len(slice_starts)):
        first, last = bounds[sid], bounds[sid + 1]
        if first >= last:
            raise H264Error("empty slice")
        w = BitWriter()
        w.ue(first)  # first_mb_in_slice
        w.ue(7)      # slice_type: I (all slices in picture)
        w.ue(0)      # pps_id
        w.u(0, 4)    # frame_num (log2_max_frame_num = 4)
        w.ue(0)      # idr_pic_id
        w.u(0, 1)    # no_output_of_prior_pics
        w.u(0, 1)    # long_term_reference
        w.se(0)      # slice_qp_delta
        w.ue(deblock_idc)
        if deblock_idc != 1:
            w.se(0)  # slice_alpha_c0_offset_div2
            w.se(0)  # slice_beta_offset_div2
        w.byte_align(1)  # cabac_alignment_one_bit (7.3.4)
        # CABAC state — contexts AND the arithmetic engine — initializes
        # fresh per slice (9.3.1), exactly as the decoder builds one
        # CabacDecoder per slice NAL
        enc = CabacEncoder(w, qp)
        for mb in range(first, last):
            _encode_mb_cabac(enc, shadow, mb, mbs[mb], qp, sid,
                             qp_delta=qp_deltas[mb] if qp_deltas else 0)
            enc.terminate(1 if mb == last - 1 else 0)  # end_of_slice_flag
        # terminate(1) ran EncodeFlush, whose trailing '1' doubles as the
        # rbsp stop bit; tobytes zero-pads the final byte (7.3.4 note)
        nals.append(_nal(5, w.tobytes()))
    return nals
