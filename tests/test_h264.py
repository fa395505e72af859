"""H.264 baseline I-frame codec tests.

Anchors, in increasing strength:
- structural table validity (prefix-free, unambiguous, Kraft bounds,
  CBP bijection) — a mistranscribed VLC row usually breaks these;
- the published CAVLC worked example (Richardson, "H.264 and MPEG-4
  Video Compression", example 1) pins VLC0 + total_zeros + run_before
  bit-exactly;
- I_PCM round-trip — pixel-exact with NO shared entropy tables on the
  sample path;
- closed-form uniform frames (I_16x16 DC chain) — the expected value is
  derived by independent integer math (i16dc_recon_value), and ONE wrong
  neighbor average anywhere breaks every downstream macroblock;
- an independent reconstruction reference (re-derived from the spec in
  this file, vectorized where the decoder loops) for I_4x4 frames with
  random modes and residuals — exercises every intra4x4 mode, the CAVLC
  contexts up to nC >= 8, cbp quadrants, and the chroma DC path.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from engine_spark.datapipe import h264 as H


# ---------------------------------------------------------------------------
# table structure
# ---------------------------------------------------------------------------


def _codes(table):
    return list(table.values()) if isinstance(table, dict) else list(table)


def _assert_prefix_free(codes, name):
    assert len(set(codes)) == len(codes), f"{name}: duplicate codes"
    for a in codes:
        for b in codes:
            if a != b and b.startswith(a):
                raise AssertionError(f"{name}: {a!r} prefixes {b!r}")


def test_vlc_tables_structurally_valid():
    for nm in ("_CT_VLC0", "_CT_VLC1", "_CT_VLC2", "_CT_CHROMA_DC"):
        codes = _codes(getattr(H, nm))
        _assert_prefix_free(codes, nm)
        kraft = sum(2.0 ** -len(c) for c in codes)
        assert kraft <= 1 + 1e-12, f"{nm}: ambiguous (kraft {kraft})"
    for tc, row in H._TOTAL_ZEROS_4x4.items():
        _assert_prefix_free(row, f"tz4[{tc}]")
        k = sum(2.0 ** -len(c) for c in row)
        # TC=1 is the spec's one incomplete row (all-zeros codeword unused)
        assert abs(k - (1 - 2**-9 if tc == 1 else 1)) < 1e-12, (tc, k)
    for tc, row in H._TOTAL_ZEROS_CDC.items():
        _assert_prefix_free(row, f"tzc[{tc}]")
        assert abs(sum(2.0 ** -len(c) for c in row) - 1) < 1e-12
    for zl, row in H._RUN_BEFORE.items():
        _assert_prefix_free(row, f"rb[{zl}]")
        if zl < 7:
            assert abs(sum(2.0 ** -len(c) for c in row) - 1) < 1e-12


def test_coeff_token_key_sets():
    for nm in ("_CT_VLC0", "_CT_VLC1", "_CT_VLC2"):
        keys = set(getattr(H, nm))
        expect = {(t1, tc) for tc in range(17) for t1 in range(min(tc, 3) + 1)}
        assert keys == expect, nm
    assert set(H._CT_CHROMA_DC) == {
        (t1, tc) for tc in range(5) for t1 in range(min(tc, 3) + 1)
    }


def test_cbp_intra_table_is_a_bijection():
    assert sorted(H._CBP_INTRA) == list(range(48))
    assert H._CBP_INTRA[3] == 0 and H._CBP_INTRA[0] == 47


def test_run_before_row_lengths():
    for zl in range(1, 7):
        assert len(H._RUN_BEFORE[zl]) == zl + 1
    assert len(H._RUN_BEFORE[7]) == 15


# ---------------------------------------------------------------------------
# CAVLC block coding
# ---------------------------------------------------------------------------


def test_published_cavlc_example_decodes_and_reencodes():
    # Richardson example 1: zigzag coeffs 0,3,0,1,-1,-1,0,1,0... with
    # nC = 0 encode to exactly 000010001110010111101101
    bits = "000010001110010111101101"
    r = H.BitReader(int(bits, 2).to_bytes(3, "big"))
    coeffs, tc = H.decode_residual_block(r, 0, 16)
    assert coeffs == [0, 3, 0, 1, -1, -1, 0, 1] + [0] * 8
    assert tc == 5 and r.pos == len(bits)
    w = H.BitWriter()
    H.encode_residual_block(w, coeffs, 0)
    assert "".join(map(str, w.bits)) == bits


def test_cavlc_roundtrip_all_contexts():
    rng = random.Random(1234)
    for _ in range(3000):
        n = rng.choice([4, 15, 16])
        maxc = 3 if n == 4 else 16
        coeffs = [0] * n
        for p in rng.sample(range(n), rng.randint(0, min(n, maxc))):
            coeffs[p] = rng.choice(
                (-30000, -3000, -200, -17, -3, -2, -1, 1, 2, 3, 17, 200, 30000)
            )
        nC = -1 if n == 4 else rng.choice([0, 1, 2, 3, 4, 7, 8, 16])
        w = H.BitWriter()
        H.encode_residual_block(w, coeffs, nC)
        w.u(0, 32)
        got, _ = H.decode_residual_block(H.BitReader(w.tobytes()), nC, n)
        assert got == coeffs, (nC, coeffs, got)


def test_exp_golomb_roundtrip():
    w = H.BitWriter()
    vals = list(range(40)) + [255, 1000, 65535]
    svals = [0, 1, -1, 2, -2, 17, -17, 300, -300]
    for v in vals:
        w.ue(v)
    for v in svals:
        w.se(v)
    w.u(0, 8)
    r = H.BitReader(w.tobytes())
    assert [r.ue() for _ in vals] == vals
    assert [r.se() for _ in svals] == svals


def test_rbsp_escape_roundtrip():
    rng = random.Random(7)
    for _ in range(200):
        raw = bytes(rng.choice([0, 0, 0, 1, 2, 3, 255]) for _ in range(rng.randint(0, 64)))
        esc = H.rbsp_escape(raw)
        # no start-code emulation survives
        assert b"\x00\x00\x00" not in esc and b"\x00\x00\x01" not in esc
        assert H.rbsp_unescape(esc) == raw


# ---------------------------------------------------------------------------
# end-to-end frames
# ---------------------------------------------------------------------------


def _bt601(y, cb, cr):
    yf = y.astype(np.float64)
    cbf = cb.repeat(2, 0).repeat(2, 1).astype(np.float64) - 128.0
    crf = cr.repeat(2, 0).repeat(2, 1).astype(np.float64) - 128.0
    rgb = np.stack(
        [yf + 1.402 * crf, yf - 0.344136 * cbf - 0.714136 * crf, yf + 1.772 * cbf],
        axis=2,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def test_pcm_frame_roundtrip_exact():
    rng = np.random.default_rng(7)
    wmb, hmb = 3, 2
    y = rng.integers(0, 256, (hmb * 16, wmb * 16), dtype=np.int64)
    cb = rng.integers(0, 256, (hmb * 8, wmb * 8), dtype=np.int64)
    cr = rng.integers(0, 256, (hmb * 8, wmb * 8), dtype=np.int64)
    mbs = [
        ("pcm",
         y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16],
         cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
         cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8])
        for my in range(hmb) for mx in range(wmb)
    ]
    sps, pps = H.encode_sps_pps(wmb, hmb)
    rgb = H.decode_i_frame([sps, pps, H.encode_i_frame(mbs, wmb, hmb)])
    assert (rgb == _bt601(y, cb, cr)).all()


@pytest.mark.parametrize("dc,qp", [(16, 26), (160, 26), (-160, 26),
                                   (500, 20), (40, 40), (0, 26), (2000, 10)])
def test_i16dc_uniform_frame(dc, qp):
    sn, pn, idr = H.encode_solid_gray_stream(4, 3, dc, qp)
    rgb = H.decode_i_frame([sn, pn, idr])
    v = H.i16dc_recon_value(dc, qp)
    assert rgb.shape == (48, 64, 3)
    assert (rgb == v).all()


def test_cropping():
    sn, pn, idr = H.encode_solid_gray_stream(2, 2, 160, 26,
                                             crop_right=6, crop_bottom=10)
    assert H.decode_i_frame([sn, pn, idr]).shape == (22, 26, 3)


# ---------------------------------------------------------------------------
# I_4x4 vs an independent reconstruction reference
# ---------------------------------------------------------------------------

_ZZ = H._ZZ4


def _ref_dequant_idct(coeffs, qp):
    """Independent transcription of 8.5.12 (vectorized, unlike the
    decoder's row/column butterflies)."""
    m = np.zeros((4, 4), np.int64)
    for k, (r, c) in enumerate(_ZZ):
        m[r, c] = coeffs[k]
    v = H._V[qp % 6]
    scale = np.array(
        [[v[0 if (r % 2 == 0 and c % 2 == 0) else 1 if (r % 2 and c % 2) else 2]
          for c in range(4)] for r in range(4)], np.int64)
    d = (m * scale) << (qp // 6)
    # matrix form of the inverse transform: T' d T with the spec's
    # half-pel rows requires the exact integer shifts, so do butterflies
    # but in a one-shot einsum-free layout distinct from the decoder's
    out = np.empty((4, 4), np.int64)
    tmp = np.empty((4, 4), np.int64)
    for i in range(4):
        d0, d1, d2, d3 = (int(x) for x in d[i])
        e0, e1 = d0 + d2, d0 - d2
        e2, e3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
        tmp[i] = (e0 + e3, e1 + e2, e1 - e2, e0 - e3)
    for j in range(4):
        d0, d1, d2, d3 = (int(x) for x in tmp[:, j])
        e0, e1 = d0 + d2, d0 - d2
        e2, e3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
        out[:, j] = (e0 + e3, e1 + e2, e1 - e2, e0 - e3)
    return out


def _ref_pred4(mode, top8, left4, corner):
    """Second transcription of 8.3.1.2 used only as the test oracle."""
    t = None if top8 is None else [int(x) for x in top8]
    lf = None if left4 is None else [int(x) for x in left4]
    c = None if corner is None else int(corner)
    p = np.zeros((4, 4), np.int64)
    if mode == 0:
        p[:] = t[:4]
    elif mode == 1:
        for y in range(4):
            p[y, :] = lf[y]
    elif mode == 2:
        if t is not None and lf is not None:
            p[:] = (sum(t[:4]) + sum(lf) + 4) >> 3
        elif t is not None:
            p[:] = (sum(t[:4]) + 2) >> 2
        elif lf is not None:
            p[:] = (sum(lf) + 2) >> 2
        else:
            p[:] = 128
    elif mode == 3:
        for y in range(4):
            for x in range(4):
                p[y, x] = ((t[6] + 3 * t[7] + 2) >> 2 if x == y == 3
                           else (t[x + y] + 2 * t[x + y + 1] + t[x + y + 2] + 2) >> 2)
    elif mode == 4:
        full = {-1: c}
        for i in range(8):
            full[i] = t[i]
        for y in range(4):
            for x in range(4):
                if x > y:
                    p[y, x] = (full[x - y - 2] + 2 * full[x - y - 1] + full[x - y] + 2) >> 2
                elif x < y:
                    lfull = {-1: c}
                    for i in range(4):
                        lfull[i] = lf[i]
                    p[y, x] = (lfull[y - x - 2] + 2 * lfull[y - x - 1] + lfull[y - x] + 2) >> 2
                else:
                    p[y, x] = (t[0] + 2 * c + lf[0] + 2) >> 2
    elif mode in (5, 6):
        tt = {-1: c}
        for i in range(8):
            tt[i] = t[i] if t is not None else None
        ll = {-1: c}
        for i in range(4):
            ll[i] = lf[i] if lf is not None else None
        a, b = (tt, ll) if mode == 5 else (ll, tt)
        for y in range(4):
            for x in range(4):
                u, v = (x, y) if mode == 5 else (y, x)
                z = 2 * u - v
                if z >= 0 and z % 2 == 0:
                    i = u - (v >> 1)
                    p[y, x] = (a[i - 1] + a[i] + 1) >> 1
                elif z >= 0:
                    i = u - (v >> 1)
                    p[y, x] = (a[i - 2] + 2 * a[i - 1] + a[i] + 2) >> 2
                elif z == -1:
                    p[y, x] = (ll[0] + 2 * c + tt[0] + 2) >> 2
                else:
                    p[y, x] = (b[v - 1] + 2 * b[v - 2] + b[v - 3] + 2) >> 2
    elif mode == 7:
        for y in range(4):
            for x in range(4):
                i = x + (y >> 1)
                p[y, x] = ((t[i] + t[i + 1] + 1) >> 1 if y % 2 == 0
                           else (t[i] + 2 * t[i + 1] + t[i + 2] + 2) >> 2)
    elif mode == 8:
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


def _ref_decode_i4_frame(wmb, hmb, all_mbs, qp):
    """Independent I_4x4 frame reconstruction from the ENCODER'S INTENT
    (modes + coefficients), bypassing entropy coding entirely."""
    y = np.zeros((hmb * 16, wmb * 16), np.int64)
    for mb, (_, modes, coeffs, cdc) in enumerate(all_mbs):
        mbx, mby = mb % wmb, mb // wmb
        px, py = mbx * 16, mby * 16
        cbp_luma = 0
        for i in range(16):
            if coeffs[i] is not None and any(coeffs[i]):
                cbp_luma |= 1 << (i // 4)
        written = set()
        for i in range(16):
            ox, oy = H._BLK_XY[i]
            bpx, bpy = px + ox, py + oy

            def ok(bx4, by4):
                if bx4 < 0 or by4 < 0 or bx4 >= wmb * 4 or by4 >= hmb * 4:
                    return False
                if by4 // 4 == mby and bx4 // 4 == mbx:
                    return (bx4, by4) in written
                return by4 // 4 * wmb + bx4 // 4 < mb

            bx4, by4 = bpx // 4, bpy // 4
            top = left = corner = None
            if ok(bx4, by4 - 1):
                top = list(y[bpy - 1, bpx : bpx + 4])
                top += (list(y[bpy - 1, bpx + 4 : bpx + 8])
                        if ok(bx4 + 1, by4 - 1) and bpx + 4 < wmb * 16
                        else [top[3]] * 4)
            if ok(bx4 - 1, by4):
                left = list(y[bpy : bpy + 4, bpx - 1])
            if ok(bx4 - 1, by4 - 1):
                corner = int(y[bpy - 1, bpx - 1])
            pred = _ref_pred4(modes[i], top, left, corner)
            if cbp_luma & (1 << (i // 4)):
                res = (_ref_dequant_idct(coeffs[i] or [0] * 16, qp) + 32) >> 6
            else:
                res = 0
            y[bpy : bpy + 4, bpx : bpx + 4] = np.clip(pred + res, 0, 255)
            written.add((bx4, by4))
    return y


def _mode_legal(mode, i, mbx, mby, wmb):
    """Which intra4x4 modes have their required neighbors available for
    block i of MB (mbx, mby) in a raster-decoded frame."""
    ox, oy = H._BLK_XY[i]
    has_top = mby > 0 or oy > 0
    has_left = mbx > 0 or ox > 0
    # top-right REAL availability doesn't matter: substitution covers it
    if mode in (0, 3, 7):
        return has_top
    if mode in (1, 8):
        return has_left
    if mode == 2:
        return True
    return has_top and has_left  # 4, 5, 6 also need the corner


def test_i4x4_random_frames_match_independent_reference():
    rng = random.Random(99)
    for trial in range(6):
        wmb, hmb, qp = 3, 2, rng.choice([20, 26, 32])
        mbs = []
        for mb in range(wmb * hmb):
            mbx, mby = mb % wmb, mb // wmb
            modes, coeffs = [], []
            for i in range(16):
                legal = [m for m in range(9) if _mode_legal(m, i, mbx, mby, wmb)]
                modes.append(rng.choice(legal))
                if rng.random() < 0.7:
                    blk = [0] * 16
                    for p in rng.sample(range(16), rng.randint(1, 6)):
                        blk[p] = rng.randint(-8, 8)
                    coeffs.append(blk if any(blk) else None)
                else:
                    coeffs.append(None)
            mbs.append(("i4", modes, coeffs, None))
        sps, pps = H.encode_sps_pps(wmb, hmb, qp=qp)
        idr = H.encode_i_frame(mbs, wmb, hmb, qp)
        rgb = H.decode_i_frame([sps, pps, idr])
        y_ref = _ref_decode_i4_frame(wmb, hmb, mbs, qp)
        # gray chroma -> R == G == B == Y exactly
        assert (rgb[:, :, 0] == y_ref).all(), f"trial {trial}"
        assert (rgb[:, :, 1] == y_ref).all() and (rgb[:, :, 2] == y_ref).all()


def test_i4x4_chroma_dc_residual():
    # one MB, flat luma, chroma DC levels shift Cb/Cr uniformly
    mbs = [("i4", [2] * 16, [None] * 16, ([40, 0, 0, 0], [-40, 0, 0, 0]))]
    sps, pps = H.encode_sps_pps(1, 1, qp=26)
    rgb = H.decode_i_frame([sps, pps, H.encode_i_frame(mbs, 1, 1, 26)])
    # independent chroma math: f = H2 c H2 with only c00=L -> f = L at all
    # four positions; dcC = ((L * V0) << (qp//6)) >> 5; res = (dc+32)>>6
    qp = H.chroma_qp(26, 0)
    for lev, chan, sign in ((40, 2, 1.772), (-40, 1, None)):
        dc = ((lev * H._V[qp % 6][0]) << (qp // 6)) >> 5
        res = (dc + 32) >> 6
        cbcr = 128 + res
        if lev == 40:  # Cb plane
            exp_b = np.clip(np.rint(128 + 1.772 * (cbcr - 128)), 0, 255)
            assert (rgb[:, :, 2] == exp_b).all()


# ---------------------------------------------------------------------------
# refusal paths (honest NULL degradation upstream)
# ---------------------------------------------------------------------------


def test_cabac_pps_accepted_and_flagged():
    """entropy_coding_mode=1 no longer refuses at PPS level (r12: CABAC
    I slices decode for real); the flag is recorded for the slice-layer
    dispatch, and CABAC P slices refuse there instead."""
    w = H.BitWriter()
    w.ue(0); w.ue(0); w.u(1, 1)  # entropy_coding_mode = CABAC
    w.u(0, 1); w.ue(0); w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 2)
    w.se(0); w.se(0); w.se(0); w.u(0, 1); w.u(0, 1); w.u(0, 1)
    w.rbsp_trailing()
    pps = H.parse_pps(w.tobytes())
    assert pps["entropy_cabac"] is True


def test_p_slice_without_reference_and_b_slice_refused():
    # keyframe-sampling entry point (no reference): a P slice raises —
    # decode_gop is the API that supplies the reference chain
    sps, pps = H.encode_sps_pps(1, 1)
    w = H.BitWriter()
    w.ue(0)
    w.ue(5)  # slice_type P (all slices)
    w.ue(0)
    w.u(0, 4)
    w.rbsp_trailing()
    nal = bytes([0x61]) + H.rbsp_escape(w.tobytes())
    with pytest.raises(H.H264Error, match="reference"):
        H.decode_i_frame([sps, pps, nal])
    # a B slice with no reference chain refuses the same way (B support
    # itself landed r13 — see the b_slice tests; SP/SI stay out of scope)
    w = H.BitWriter()
    w.ue(0)
    w.ue(6)  # slice_type B (all slices)
    w.ue(0)
    w.u(0, 4)
    w.rbsp_trailing()
    nal_b = bytes([0x61]) + H.rbsp_escape(w.tobytes())
    with pytest.raises(H.H264Error, match="reference"):
        H.decode_i_frame([sps, pps, nal_b])
    w = H.BitWriter()
    w.ue(0)
    w.ue(8)  # slice_type SP (all slices) — out of scope
    w.ue(0)
    w.u(0, 4)
    w.rbsp_trailing()
    nal_sp = bytes([0x61]) + H.rbsp_escape(w.tobytes())
    with pytest.raises(H.H264Error, match="slice_type"):
        H.decode_i_frame([sps, pps, nal_sp])


# ---------------------------------------------------------------------------
# deblocking filter (8.7, I-frame subset)
# ---------------------------------------------------------------------------


def test_deblock_tables_structure():
    for tab, lo_anchor, hi_anchor in ((H._ALPHA, (16, 4), (51, 255)),
                                      (H._BETA, (16, 2), (51, 18))):
        assert len(tab) == 52 and all(v == 0 for v in tab[:16])
        assert all(tab[i] <= tab[i + 1] for i in range(51))
        assert tab[lo_anchor[0]] == lo_anchor[1]
        assert tab[hi_anchor[0]] == hi_anchor[1]
    assert len(H._TC0) == 52
    for col in range(3):
        vals = [row[col] for row in H._TC0]
        assert all(vals[i] <= vals[i + 1] for i in range(51))
    assert H._TC0[51] == [18, 23, 34]
    # tc0 columns are ordered: larger bS never filters less
    for row in H._TC0:
        assert row[0] <= row[1] <= row[2]


def test_deblock_noop_on_uniform_frame():
    # flat content: every delta the filter can compute is zero
    dc16 = [0] * 16
    dc16[0] = 160
    mbs = [("i16", 2, dc16, None)] + [("i16", 2, [0] * 16, None)] * 11
    sps, pps = H.encode_sps_pps(4, 3)
    off = H.decode_i_frame([sps, pps, H.encode_i_frame(mbs, 4, 3, 26, deblock_idc=1)])
    on = H.decode_i_frame([sps, pps, H.encode_i_frame(mbs, 4, 3, 26, deblock_idc=0)])
    assert (off == on).all()


def test_deblock_strong_filter_hand_example():
    # isolated bS=4 vertical edge, step 136 -> 140 at qp=26 (alpha 15,
    # beta 6; |p0-q0| = 4 < (15>>2)+2 takes the strong path): boundary
    # samples hand-computed from the 8.7 strong-filter formulas
    v1, v2 = 136, 140
    plane = np.zeros((4, 8), np.int64)
    plane[:, :4] = v1
    plane[:, 4:] = v2
    H._filter_edge_luma(plane, 4, 0, 1, 0, 4, 26, 0, 0)
    p0 = (5 * v1 + 3 * v2 + 4) >> 3
    p1 = (3 * v1 + v2 + 2) >> 2
    p2 = (7 * v1 + v2 + 4) >> 3
    q0 = (5 * v2 + 3 * v1 + 4) >> 3
    q1 = (3 * v2 + v1 + 2) >> 2
    q2 = (7 * v2 + v1 + 4) >> 3
    assert list(plane[0]) == [v1, p2, p1, p0, q0, q1, q2, v2]


def test_deblock_smooths_mb_step_monotonically():
    # full-frame sanity on the same step: two I_16x16 MBs, the filtered
    # cross-edge profile must be monotone nondecreasing and pin the
    # unchanged far columns (the subsequent internal edges legitimately
    # retouch p1/q1 of the MB edge — the spec filters later edges on
    # partially filtered samples, so the exact boundary values are
    # pinned by the isolated-edge test above, the shape here)
    d1, d2 = 160, 80  # qp=26 rescale (13D+2)>>2: v1 = 136, step +4
    mb0 = [0] * 16
    mb0[0] = d1
    mb1 = [0] * 16
    mb1[0] = d2
    sps, pps = H.encode_sps_pps(2, 1)
    idr = H.encode_i_frame([("i16", 2, mb0, None), ("i16", 2, mb1, None)],
                           2, 1, 26, deblock_idc=0)
    out = H.decode_i_frame([sps, pps, idr])[:, :, 0].astype(int)
    assert (out == out[0]).all()  # every row identical (vertical edges only)
    row = out[0]
    assert row[0] == 136 and row[-1] == 140
    assert all(row[i] <= row[i + 1] for i in range(len(row) - 1))
    assert row[15] == 138 and row[16] == 139  # strong-filtered p0/q0 stay


def _ref_deblock_luma(y, wmb, hmb, qp):
    """Independent transcription of the 8.7 luma filter for single-slice
    all-intra frames with zero offsets (test oracle only)."""
    alpha, beta = H._ALPHA[qp], H._BETA[qp]
    tc0_bs3 = H._TC0[qp][2]

    def one_line(p, q, bs):
        if not (abs(p[0] - q[0]) < alpha and abs(p[1] - p[0]) < beta
                and abs(q[1] - q[0]) < beta):
            return p, q
        p, q = list(p), list(q)
        ap, aq = abs(p[2] - p[0]) < beta, abs(q[2] - q[0]) < beta
        if bs == 4:
            if ap and abs(p[0] - q[0]) < (alpha >> 2) + 2:
                np_ = [(p[2] + 2 * p[1] + 2 * p[0] + 2 * q[0] + q[1] + 4) >> 3,
                       (p[2] + p[1] + p[0] + q[0] + 2) >> 2,
                       (2 * p[3] + 3 * p[2] + p[1] + p[0] + q[0] + 4) >> 3, p[3]]
            else:
                np_ = [(2 * p[1] + p[0] + q[1] + 2) >> 2, p[1], p[2], p[3]]
            if aq and abs(p[0] - q[0]) < (alpha >> 2) + 2:
                nq_ = [(q[2] + 2 * q[1] + 2 * q[0] + 2 * p[0] + p[1] + 4) >> 3,
                       (q[2] + q[1] + q[0] + p[0] + 2) >> 2,
                       (2 * q[3] + 3 * q[2] + q[1] + q[0] + p[0] + 4) >> 3, q[3]]
            else:
                nq_ = [(2 * q[1] + q[0] + p[1] + 2) >> 2, q[1], q[2], q[3]]
            return np_, nq_
        tc = tc0_bs3 + ap + aq
        delta = max(-tc, min(tc, (((q[0] - p[0]) << 2) + (p[1] - q[1]) + 4) >> 3))
        np_, nq_ = list(p), list(q)
        np_[0] = max(0, min(255, p[0] + delta))
        nq_[0] = max(0, min(255, q[0] - delta))
        if ap:
            np_[1] = p[1] + max(-tc0_bs3, min(tc0_bs3,
                     (p[2] + ((p[0] + q[0] + 1) >> 1) - 2 * p[1]) >> 1))
        if aq:
            nq_[1] = q[1] + max(-tc0_bs3, min(tc0_bs3,
                     (q[2] + ((q[0] + p[0] + 1) >> 1) - 2 * q[1]) >> 1))
        return np_, nq_

    y = y.copy()
    for mby in range(hmb):
        for mbx in range(wmb):
            px, py = mbx * 16, mby * 16
            for e in range(4):  # vertical edges
                x = px + 4 * e
                if e == 0 and mbx == 0:
                    continue
                bs = 4 if e == 0 else 3
                for r in range(py, py + 16):
                    p = [int(y[r, x - 1 - i]) for i in range(4)]
                    q = [int(y[r, x + i]) for i in range(4)]
                    np_, nq_ = one_line(p, q, bs)
                    for i in range(4):
                        y[r, x - 1 - i] = np_[i]
                        y[r, x + i] = nq_[i]
            for e in range(4):  # horizontal edges
                yy = py + 4 * e
                if e == 0 and mby == 0:
                    continue
                bs = 4 if e == 0 else 3
                for c in range(px, px + 16):
                    p = [int(y[yy - 1 - i, c]) for i in range(4)]
                    q = [int(y[yy + i, c]) for i in range(4)]
                    np_, nq_ = one_line(p, q, bs)
                    for i in range(4):
                        y[yy - 1 - i, c] = np_[i]
                        y[yy + i, c] = nq_[i]
    return y


def test_deblock_random_i4_frames_match_independent_reference():
    rng = random.Random(4242)
    for trial in range(4):
        wmb, hmb, qp = 2, 2, rng.choice([22, 26, 30])
        mbs = []
        for mb in range(wmb * hmb):
            mbx, mby = mb % wmb, mb // wmb
            modes, coeffs = [], []
            for i in range(16):
                legal = [m for m in range(9) if _mode_legal(m, i, mbx, mby, wmb)]
                modes.append(rng.choice(legal))
                if rng.random() < 0.7:
                    blk = [0] * 16
                    for p in rng.sample(range(16), rng.randint(1, 5)):
                        blk[p] = rng.randint(-6, 6)
                    coeffs.append(blk if any(blk) else None)
                else:
                    coeffs.append(None)
            mbs.append(("i4", modes, coeffs, None))
        sps, pps = H.encode_sps_pps(wmb, hmb, qp=qp)
        unfiltered = H.decode_i_frame(
            [sps, pps, H.encode_i_frame(mbs, wmb, hmb, qp, deblock_idc=1)]
        )[:, :, 0].astype(np.int64)
        filtered = H.decode_i_frame(
            [sps, pps, H.encode_i_frame(mbs, wmb, hmb, qp, deblock_idc=0)]
        )[:, :, 0].astype(np.int64)
        ref = _ref_deblock_luma(unfiltered, wmb, hmb, qp)
        assert (filtered == ref).all(), f"trial {trial} qp {qp}"
        # and the filter genuinely fired somewhere
        assert (filtered != unfiltered).any()


def test_deblock_default_pps_filters():
    # a PPS without the deblocking control flag means filter ON with
    # zero offsets — same output as an explicit idc=0 slice
    dc16 = [0] * 16
    dc16[0] = 800
    mb1 = [0] * 16
    mb1[0] = 96
    mbs = [("i16", 2, dc16, None), ("i16", 2, mb1, None)]
    sps, pps_ctl = H.encode_sps_pps(2, 1)
    explicit = H.decode_i_frame(
        [sps, pps_ctl, H.encode_i_frame(mbs, 2, 1, 26, deblock_idc=0)]
    )
    w = H.BitWriter()
    w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 1); w.ue(0); w.ue(0); w.ue(0)
    w.u(0, 1); w.u(0, 2); w.se(0); w.se(0); w.se(0)
    w.u(0, 1)  # deblocking_filter_control_present = 0
    w.u(0, 1); w.u(0, 1)
    w.rbsp_trailing()
    no_ctl_pps = bytes([0x68]) + H.rbsp_escape(w.tobytes())
    # slice must not carry the idc field when the PPS has no control flag:
    # re-encode the slice against a control-free PPS by patching the
    # fixture slice is brittle — instead decode the SAME control-present
    # stream and assert the no-control PPS path on a fresh slice
    w2 = H.BitWriter()
    w2.ue(0); w2.ue(7); w2.ue(0); w2.u(0, 4); w2.ue(0)
    w2.u(0, 1); w2.u(0, 1); w2.se(0)
    shadow = H._Frame({"width_mbs": 2, "height_mbs": 1})
    for mb, desc in enumerate(mbs):
        H._encode_mb(w2, shadow, mb, desc, 26)
    w2.rbsp_trailing()
    idr_no_ctl = bytes([0x65]) + H.rbsp_escape(w2.tobytes())
    implicit = H.decode_i_frame([sps, no_ctl_pps, idr_no_ctl])
    assert (implicit == explicit).all()


def test_truncated_stream_raises_decode_error_class():
    sps, pps, idr = H.encode_solid_gray_stream(2, 2, 160, 26)
    with pytest.raises(ValueError):
        H.decode_i_frame([sps, pps, idr[: len(idr) // 2]])


def test_annexb_split():
    sps, pps, idr = H.encode_solid_gray_stream(2, 1, 160, 26)
    stream = b"\x00\x00\x00\x01" + sps + b"\x00\x00\x01" + pps + b"\x00\x00\x00\x01" + idr
    nals = H.split_annexb(stream)
    assert [n[0] & 0x1F for n in nals] == [7, 8, 5]
    assert (H.decode_i_frame(nals) == H.i16dc_recon_value(160, 26)).all()


# ---------------------------------------------------------------------------
# MP4 avc1 integration (pure-python side; the Spark gate covers the rest)
# ---------------------------------------------------------------------------


def test_avcc_mp4_sample_roundtrip():
    from engine_spark.datapipe import multimodal as M

    samples, values = [], []
    sps = pps = None
    for dc in (160, -160, 500):
        sps, pps, idr = H.encode_solid_gray_stream(3, 2, dc, 26)
        samples.append(len(idr).to_bytes(4, "big") + idr)
        values.append(H.i16dc_recon_value(dc, 26))
    avcc = H.build_avcc(sps, pps)
    ext = (len(avcc) + 8).to_bytes(4, "big") + b"avcC" + avcc
    mp4 = M.encode_mp4(samples, codec=b"avc1", sample_entry_ext=ext)
    info = M.parse_mp4(mp4)
    assert info["codec"] == "avc1" and info["avcc"] == avcc
    cfg = H.parse_avcc(info["avcc"])
    assert cfg["nal_length_size"] == 4
    for fi, v in enumerate(values):
        o, sz = info["offsets"][fi], info["sizes"][fi]
        arr = H.decode_i_frame(
            H.split_avcc_sample(mp4[o : o + sz], 4), cfg["sps"], cfg["pps"]
        )
        assert (arr == v).all()


# ---------------------------------------------------------------------------
# multi-slice frames: prediction/nC reset at slice boundaries, idc=2
# ---------------------------------------------------------------------------


def test_two_slice_pcm_equals_one_slice():
    rng = np.random.default_rng(11)
    wmb, hmb = 2, 2
    y = rng.integers(0, 256, (hmb * 16, wmb * 16), dtype=np.int64)
    cb = rng.integers(0, 256, (hmb * 8, wmb * 8), dtype=np.int64)
    cr = rng.integers(0, 256, (hmb * 8, wmb * 8), dtype=np.int64)
    mbs = [
        ("pcm",
         y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16],
         cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
         cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8])
        for my in range(hmb) for mx in range(wmb)
    ]
    sps, pps = H.encode_sps_pps(wmb, hmb)
    one = H.decode_i_frame([sps, pps, H.encode_i_frame(mbs, wmb, hmb)])
    nals = H.encode_i_frame_slices(mbs, wmb, hmb, slice_starts=(0, 2))
    two = H.decode_i_frame([sps, pps] + nals)
    assert (one == two).all()


def test_two_slice_prediction_resets_at_boundary():
    # slice 1 (MB row 0) carries value A via a DC residual in MB 0;
    # slice 2 (MB row 1) cannot see slice 1's pixels, so its first MB
    # predicts from the 128 baseline and needs its own residual for B
    wmb, hmb = 3, 2
    dA, dB = 160, 480  # qp=26: rA = 8 -> A = 136; rB = 25 -> B = 153
    row1 = [("i16", 2, [dA] + [0] * 15, None)] + \
           [("i16", 2, [0] * 16, None)] * (wmb - 1)
    row2 = [("i16", 2, [dB] + [0] * 15, None)] + \
           [("i16", 2, [0] * 16, None)] * (wmb - 1)
    mbs = row1 + row2
    sps, pps = H.encode_sps_pps(wmb, hmb)
    nals = H.encode_i_frame_slices(mbs, wmb, hmb, slice_starts=(0, wmb))
    out = H.decode_i_frame([sps, pps] + nals)[:, :, 0]
    a, b = H.i16dc_recon_value(dA, 26), H.i16dc_recon_value(dB, 26)
    assert a != b
    assert (out[:16] == a).all() and (out[16:] == b).all()
    # the SAME mb list as ONE slice behaves differently: slice 2's first
    # MB predicts from the row above (a) instead of the 128 baseline and
    # stacks its residual on top, so the lower half is neither b nor
    # uniform (later MBs mix the a top row into their DC averages)
    one = H.decode_i_frame(
        [sps, pps, H.encode_i_frame(mbs, wmb, hmb)]
    )[:, :, 0]
    assert (one[:16] == a).all()
    assert (one[16:] != out[16:]).any()
    assert one[16, 0] == a + (b - 128)  # first MB: residual on top of a


def test_deblock_idc2_does_not_cross_slice_boundary():
    # two uniform slices with a value step UNDER the filter's alpha(qp=26)
    # threshold (136 -> 142; a +16 step would be left alone as real
    # content): idc=0 smooths the horizontal slice boundary; idc=2 must
    # leave it untouched (and everything else here is flat, so idc=2
    # equals the unfiltered decode exactly)
    wmb, hmb = 2, 2
    dA, dB = 160, 280
    mbs = ([("i16", 2, [dA] + [0] * 15, None)]
           + [("i16", 2, [0] * 16, None)] * (wmb - 1)
           + [("i16", 2, [dB] + [0] * 15, None)]
           + [("i16", 2, [0] * 16, None)] * (wmb - 1))
    sps, pps = H.encode_sps_pps(wmb, hmb)
    outs = {}
    for idc in (0, 1, 2):
        nals = H.encode_i_frame_slices(mbs, wmb, hmb, deblock_idc=idc,
                                       slice_starts=(0, wmb))
        outs[idc] = H.decode_i_frame([sps, pps] + nals)[:, :, 0].astype(int)
    assert (outs[2] == outs[1]).all()
    assert (outs[0] != outs[1]).any()
    boundary = outs[0][14:18, 0]
    assert all(int(boundary[i]) <= int(boundary[i + 1]) for i in range(3))
    assert outs[1][15, 0] != outs[0][15, 0]  # p0 row actually filtered


def test_two_slice_i4x4_matches_slice_aware_reference():
    rng = random.Random(314)
    wmb, hmb = 2, 2
    slice_starts = (0, 2)

    def slice_of(mb):
        return 0 if mb < 2 else 1

    mbs = []
    for mb in range(wmb * hmb):
        mbx, mby = mb % wmb, mb // wmb
        modes, coeffs = [], []
        for i in range(16):
            ox, oy = H._BLK_XY[i]
            # availability under SLICE boundaries: the top neighbor MB
            # must be in the same slice for top-dependent modes
            has_top = oy > 0 or (mby > 0 and slice_of(mb - wmb) == slice_of(mb))
            has_left = ox > 0 or (mbx > 0 and slice_of(mb - 1) == slice_of(mb))
            legal = [2]
            if has_top:
                legal += [0, 3, 7]
            if has_left:
                legal += [1, 8]
            if has_top and has_left:
                legal += [4, 5, 6]
            modes.append(rng.choice(legal))
            if rng.random() < 0.6:
                blk = [0] * 16
                for p in rng.sample(range(16), rng.randint(1, 5)):
                    blk[p] = rng.randint(-6, 6)
                coeffs.append(blk if any(blk) else None)
            else:
                coeffs.append(None)
        mbs.append(("i4", modes, coeffs, None))
    qp = 26
    sps, pps = H.encode_sps_pps(wmb, hmb, qp=qp)
    nals = H.encode_i_frame_slices(mbs, wmb, hmb, qp, slice_starts=slice_starts)
    got = H.decode_i_frame([sps, pps] + nals)[:, :, 0].astype(np.int64)

    # slice-aware variant of the independent reference
    y = np.zeros((hmb * 16, wmb * 16), np.int64)
    for mb, (_, modes, coeffs, _cdc) in enumerate(mbs):
        mbx, mby = mb % wmb, mb // wmb
        px, py = mbx * 16, mby * 16
        cbp_luma = 0
        for i in range(16):
            if coeffs[i] is not None and any(coeffs[i]):
                cbp_luma |= 1 << (i // 4)
        written = set()
        for i in range(16):
            ox, oy = H._BLK_XY[i]
            bpx, bpy = px + ox, py + oy

            def ok(bx4, by4):
                if bx4 < 0 or by4 < 0 or bx4 >= wmb * 4 or by4 >= hmb * 4:
                    return False
                omb = (by4 // 4) * wmb + bx4 // 4
                if omb == mb:
                    return (bx4, by4) in written
                return omb < mb and slice_of(omb) == slice_of(mb)

            bx4, by4 = bpx // 4, bpy // 4
            top = left = corner = None
            if ok(bx4, by4 - 1):
                top = list(y[bpy - 1, bpx : bpx + 4])
                top += (list(y[bpy - 1, bpx + 4 : bpx + 8])
                        if ok(bx4 + 1, by4 - 1) and bpx + 4 < wmb * 16
                        else [top[3]] * 4)
            if ok(bx4 - 1, by4):
                left = list(y[bpy : bpy + 4, bpx - 1])
            if ok(bx4 - 1, by4 - 1):
                corner = int(y[bpy - 1, bpx - 1])
            pred = _ref_pred4(modes[i], top, left, corner)
            if cbp_luma & (1 << (i // 4)):
                res = (_ref_dequant_idct(coeffs[i] or [0] * 16, qp) + 32) >> 6
            else:
                res = 0
            y[bpy : bpy + 4, bpx : bpx + 4] = np.clip(pred + res, 0, 255)
            written.add((bx4, by4))
    assert (got == y).all()


def test_deblock_chroma_edge_filters():
    # chroma DC residuals +40 / -40 put a 4-level Cb step at the MB edge
    # (132 | 128 at qpc 26); the bS=4 chroma filter replaces only p0/q0:
    # p0' = (2*132 + 132 + 128 + 2) >> 2 = 131, q0' = (2*128+128+132+2)>>2
    # = 129 — hand-computed from 8.7's chroma path
    mb0 = ("i16", 2, [160] + [0] * 15, ([40, 0, 0, 0], [0, 0, 0, 0]))
    mb1 = ("i16", 2, [0] * 16, ([-40, 0, 0, 0], [0, 0, 0, 0]))
    sps, pps = H.encode_sps_pps(2, 1)
    spsd = H.parse_sps(H.rbsp_unescape(sps[1:]))
    ppsd = H.parse_pps(H.rbsp_unescape(pps[1:]))

    def planes(idc):
        idr = H.encode_i_frame([mb0, mb1], 2, 1, 26, deblock_idc=idc)
        fr = H._decode_slice(
            None, H.rbsp_unescape(idr[1:]),
            {spsd["sps_id"]: spsd}, {ppsd["pps_id"]: ppsd},
            0, idr=True, ref_idc=3,
        )
        if idc != 1:
            H.deblock_frame(fr)
        return fr.cb.copy()

    cb_off = planes(1)
    assert (cb_off[:, :8] == 132).all() and (cb_off[:, 8:] == 128).all()
    cb_on = planes(0)
    assert (cb_on[:, 7] == 131).all()  # p0 column
    assert (cb_on[:, 8] == 129).all()  # q0 column
    assert (cb_on[:, :7] == 132).all() and (cb_on[:, 9:] == 128).all()


def test_decode_frames_degrades_corrupt_avc1_sample_to_null_row():
    # Spark-free check of the kernel contract decode_frames relies on:
    # a truncated avc1 sample raises within DECODE_ERRORS (NULL row
    # upstream) instead of crashing the Arrow task
    from engine_spark.datapipe.multimodal import DECODE_ERRORS

    sps, pps, idr = H.encode_solid_gray_stream(2, 2, 160, 26)
    sample = len(idr).to_bytes(4, "big") + idr
    for cut in (3, 7, len(sample) // 2, len(sample) - 2):
        try:
            H.decode_i_frame(
                H.split_avcc_sample(sample[:cut], 4),
                H.parse_sps(H.rbsp_unescape(sps[1:])),
                H.parse_pps(H.rbsp_unescape(pps[1:])),
            )
            raise AssertionError(f"cut at {cut} decoded")
        except DECODE_ERRORS:
            pass


def test_decode_meta_reads_avc1_dims_from_sps(spark):
    # an avc1 MP4 with ZERO tkhd dims (common in the wild): decode_meta
    # must fall back to the SPS coded size minus cropping
    from engine_spark.datapipe.multimodal import decode_meta, encode_mp4

    sps, pps, idr = H.encode_solid_gray_stream(3, 2, 160, 26,
                                               crop_right=4, crop_bottom=2)
    avcc = H.build_avcc(sps, pps)
    ext = (len(avcc) + 8).to_bytes(4, "big") + b"avcC" + avcc
    mp4 = encode_mp4([len(idr).to_bytes(4, "big") + idr], codec=b"avc1",
                     sample_entry_ext=ext)  # width/height default 0
    df = spark.createDataFrame([(1, bytearray(mp4))], "doc_id long, payload binary")
    row = decode_meta(df).collect()[0]
    assert row["format"] == "mp4"
    assert row["width"] == 44 and row["height"] == 30  # 48-4, 32-2


# ---------------------------------------------------------------------------
# review-pass regressions: slice-header variants and parameter-set handling
# ---------------------------------------------------------------------------


def _sps_poc1_nal(wmb, hmb):
    """Hand-built SPS with pic_order_cnt_type 1 and
    delta_pic_order_always_zero_flag = 0 (slice headers then carry
    delta_pic_order_cnt fields)."""
    w = H.BitWriter()
    w.u(66, 8); w.u(0xC0, 8); w.u(30, 8)
    w.ue(0)      # sps_id
    w.ue(0)      # log2_max_frame_num_minus4
    w.ue(1)      # pic_order_cnt_type 1
    w.u(0, 1)    # delta_pic_order_always_zero_flag = 0
    w.se(0)      # offset_for_non_ref_pic
    w.se(0)      # offset_for_top_to_bottom_field
    w.ue(0)      # num_ref_frames_in_pic_order_cnt_cycle
    w.ue(1)      # max_num_ref_frames
    w.u(0, 1)
    w.ue(wmb - 1); w.ue(hmb - 1)
    w.u(1, 1); w.u(0, 1); w.u(0, 1); w.u(0, 1)
    w.rbsp_trailing()
    return H._nal(7, w.tobytes())


def _hand_slice(mbs, wmb, hmb, qp, *, poc1_delta=False, ref_idc=3,
                pps_id=0, idr=True):
    w = H.BitWriter()
    w.ue(0)          # first_mb
    w.ue(7)          # slice_type I
    w.ue(pps_id)
    w.u(0, 4)        # frame_num
    if idr:
        w.ue(0)      # idr_pic_id
    if poc1_delta:
        w.se(0)      # delta_pic_order_cnt[0]
    if ref_idc != 0:
        if idr:
            w.u(0, 1); w.u(0, 1)
        else:
            w.u(0, 1)  # adaptive_ref_pic_marking = 0
    w.se(0)          # slice_qp_delta
    w.ue(1)          # disable_deblocking_filter_idc
    shadow = H._Frame({"width_mbs": wmb, "height_mbs": hmb})
    for mb, desc in enumerate(mbs):
        H._encode_mb(w, shadow, mb, desc, qp)
    w.rbsp_trailing()
    return bytes([(ref_idc << 5) | (5 if idr else 1)]) + H.rbsp_escape(w.tobytes())


def test_poc_type1_slice_header_with_delta_fields():
    # the delta_pic_order_cnt field must be consumed or everything after
    # it (slice_qp_delta onward) misparses
    wmb, hmb, d = 2, 1, 160
    mbs = [("i16", 2, [d] + [0] * 15, None), ("i16", 2, [0] * 16, None)]
    sps = _sps_poc1_nal(wmb, hmb)
    _, pps = H.encode_sps_pps(wmb, hmb)
    idr = _hand_slice(mbs, wmb, hmb, 26, poc1_delta=True)
    out = H.decode_i_frame([sps, pps, idr])
    assert (out == H.i16dc_recon_value(d, 26)).all()


def test_non_reference_i_slice_omits_dec_ref_pic_marking():
    # nal_ref_idc == 0 on a non-IDR coded I slice: the spec omits
    # dec_ref_pic_marking; consuming a phantom flag would shift
    # slice_qp_delta
    wmb, hmb, d = 2, 1, 480
    mbs = [("i16", 2, [d] + [0] * 15, None), ("i16", 2, [0] * 16, None)]
    sps, pps = H.encode_sps_pps(wmb, hmb)
    nal = _hand_slice(mbs, wmb, hmb, 26, ref_idc=0, idr=False)
    out = H.decode_i_frame([sps, pps, nal])
    assert (out == H.i16dc_recon_value(d, 26)).all()


def test_chroma_dc_four_coefficients_roundtrip():
    # TotalCoeff = 4 is legal for the 2x2 chroma DC block; the encoder
    # guard used to reject it
    for coeffs in ([1, 1, 1, 1], [3, -2, 5, -7], [-1, -1, -1, -1]):
        w = H.BitWriter()
        H.encode_residual_block(w, coeffs, -1)
        w.u(0, 16)
        got, tc = H.decode_residual_block(H.BitReader(w.tobytes()), -1, 4)
        assert got == coeffs and tc == 4


def test_multi_pps_slice_resolves_its_own_pps():
    # two PPS with different pic_init_qp; the slice references pps_id 1
    # and must dequantize with ITS qp (32), not the other entry's (26)
    wmb, hmb, d = 2, 1, 160
    mbs = [("i16", 2, [d] + [0] * 15, None), ("i16", 2, [0] * 16, None)]
    sps, pps26 = H.encode_sps_pps(wmb, hmb, qp=26)

    w = H.BitWriter()
    w.ue(1)      # pps_id 1
    w.ue(0)      # sps_id
    w.u(0, 1); w.u(0, 1); w.ue(0); w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 2)
    w.se(32 - 26)  # pic_init_qp_minus26 -> qp 32
    w.se(0); w.se(0)
    w.u(1, 1); w.u(0, 1); w.u(0, 1)
    w.rbsp_trailing()
    pps32 = H._nal(8, w.tobytes())

    idr = _hand_slice(mbs, wmb, hmb, 32, pps_id=1)
    out = H.decode_i_frame([sps, pps26, pps32, idr])
    assert (out == H.i16dc_recon_value(d, 32)).all()
    assert H.i16dc_recon_value(d, 32) != H.i16dc_recon_value(d, 26)
    # and the avcC record keeps both entries
    rec = bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
    rec += len(sps).to_bytes(2, "big") + sps
    rec += bytes([2])
    rec += len(pps26).to_bytes(2, "big") + pps26
    rec += len(pps32).to_bytes(2, "big") + pps32
    cfg = H.parse_avcc(rec)
    assert set(cfg["pps_by_id"]) == {0, 1}
    assert cfg["pps_by_id"][1]["pic_init_qp"] == 32
    # end-to-end through the by-id maps
    out2 = H.decode_i_frame([idr], cfg["sps_by_id"], cfg["pps_by_id"])
    assert (out2 == out).all()


def test_corrupt_crop_raises_instead_of_empty_frame():
    w = H.BitWriter()
    w.u(66, 8); w.u(0xC0, 8); w.u(30, 8)
    w.ue(0); w.ue(0); w.ue(2); w.ue(1); w.u(0, 1)
    w.ue(0)  # width 1 MB
    w.ue(0)  # height 1 MB
    w.u(1, 1); w.u(0, 1)
    w.u(1, 1)   # frame_cropping
    w.ue(0); w.ue(100); w.ue(0); w.ue(0)  # right crop eats the frame
    w.u(0, 1)
    w.rbsp_trailing()
    with pytest.raises(H.H264Error, match="crop"):
        H.parse_sps(w.tobytes())


def test_fuzz_corrupted_streams_never_leak_exceptions():
    # the decode_frames contract at corpus scale: arbitrary corrupt bytes
    # either decode to a valid array (mutation hit pixel payload) or
    # raise within DECODE_ERRORS — never another exception type, never a
    # hang (all VLC/level/ue reads are length-bounded)
    from engine_spark.datapipe.multimodal import DECODE_ERRORS

    rng = random.Random(2024)
    streams = []
    for dc, idc in ((160, 1), (480, 0), (-300, 2)):
        sn, pn, _ = H.encode_solid_gray_stream(2, 2, dc, 26)
        mbs = [("i16", 2, [dc] + [0] * 15, None)] + [("i16", 2, [0] * 16, None)] * 3
        streams.append((sn, pn, H.encode_i_frame(mbs, 2, 2, 26, deblock_idc=idc)))
    mbs_i4 = []
    for _mb in range(4):
        coeffs = [[rng.randint(-5, 5) if rng.random() < 0.4 else 0
                   for _ in range(16)] for _ in range(16)]
        mbs_i4.append(("i4", [2] * 16,
                       [c if any(c) else None for c in coeffs], None))
    sn, pn = H.encode_sps_pps(2, 2)
    streams.append((sn, pn, H.encode_i_frame(mbs_i4, 2, 2, 26, deblock_idc=0)))

    for trial in range(600):
        sn, pn, idr = streams[rng.randrange(len(streams))]
        nals = [bytearray(sn), bytearray(pn), bytearray(idr)]
        for _ in range(rng.randint(1, 6)):
            nal = nals[rng.randrange(3)]
            i = rng.randrange(len(nal))
            op = rng.random()
            if op < 0.5:
                nal[i] ^= 1 << rng.randrange(8)
            elif op < 0.8:
                nal[i] = rng.randrange(256)
            elif len(nal) > 4:
                del nal[i : i + rng.randint(1, 4)]
        try:
            arr = H.decode_i_frame([bytes(n) for n in nals])
            assert arr.dtype == np.uint8 and arr.ndim == 3
        except DECODE_ERRORS:
            pass


# ---------------------------------------------------------------------------
# Hypothesis property: CAVLC block coding is a bijection on legal blocks
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def _cavlc_block(draw):
    kind = draw(st.sampled_from(["luma16", "luma15", "chroma_dc"]))
    n = {"luma16": 16, "luma15": 15, "chroma_dc": 4}[kind]
    maxc = 4 if n == 4 else n
    tc = draw(st.integers(0, maxc))
    pos = draw(st.permutations(range(n)).map(lambda p: sorted(p[:tc])))
    coeffs = [0] * n
    for p in pos:
        coeffs[p] = draw(
            st.integers(-100000, 100000).filter(lambda v: v != 0)
        )
    nC = -1 if n == 4 else draw(st.sampled_from([0, 1, 2, 3, 4, 5, 7, 8, 16, 30]))
    return coeffs, nC, n


@given(block=_cavlc_block())
@settings(max_examples=400, deadline=None)
def test_cavlc_bijection_property(block):
    # ANY legal block (any positions, any magnitudes up to the escape
    # range, any nC context) survives encode->decode bit-exactly, and
    # the decode consumes exactly the bits the encode produced
    coeffs, nC, n = block
    w = H.BitWriter()
    H.encode_residual_block(w, coeffs, nC)
    n_bits = len(w.bits)
    w.u(0, 32)
    r = H.BitReader(w.tobytes())
    got, tc = H.decode_residual_block(r, nC, n)
    assert got == coeffs
    assert tc == sum(1 for c in coeffs if c)
    assert r.pos == n_bits


def test_decode_frames_under_structured_streaming(spark, tmp_path):
    # media INGESTION shape: a binaryFile stream of arriving MP4s decodes
    # through the same mapInPandas chain as batch — keyframe metadata and
    # pixels flow from a stream source with no operator changes
    from pyspark.sql import functions as F

    from engine_spark.datapipe.multimodal import decode_frames, encode_mp4

    media = tmp_path / "media"
    media.mkdir()
    expected = {}
    for did, dc in ((0, 160), (1, 480), (2, -300)):
        sps, pps, idr = H.encode_solid_gray_stream(2, 2, dc, 26)
        avcc = H.build_avcc(sps, pps)
        ext = (len(avcc) + 8).to_bytes(4, "big") + b"avcC" + avcc
        mp4 = encode_mp4(
            [len(idr).to_bytes(4, "big") + idr], codec=b"avc1",
            sample_entry_ext=ext,
        )
        (media / f"{did}.mp4").write_bytes(mp4)
        v = H.i16dc_recon_value(dc, 26)
        expected[did] = 3 * v * 32 * 32
    src = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .load(str(media))
    )
    docs = src.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.mp4$", 1)
        .cast("long").alias("doc_id"),
        F.col("content").alias("payload"),
    )
    q = (
        decode_frames(docs, 1)
        .writeStream.format("memory").queryName("h264_stream")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "select doc_id, pix_sum from h264_stream order by doc_id"
    ).collect()
    assert {r["doc_id"]: r["pix_sum"] for r in rows} == expected


# ---------------------------------------------------------------------------
# PPS extension tail (7.3.2.2) + multi-parameter-set routing — ADVICE r10
# ---------------------------------------------------------------------------


def test_pps_extension_tail_parsed_and_second_cqpo_honored():
    """A PPS carrying the optional extension tail must PARSE it instead of
    ignoring it (a High-profile CAVLC stream would otherwise misdecode
    silently): transform_8x8 / scaling matrices refuse loudly, and
    second_chroma_qp_index_offset is HONORED — Cr dequantizes at its own
    QP while Cb keeps the first offset."""
    # tail with second offset == 0 parses and decodes bit-identically to
    # the tail-less stream
    base_sps, base_pps = H.encode_sps_pps(1, 1, qp=26)
    tail_pps = H.encode_sps_pps(1, 1, qp=26, second_cqpo=0)[1]
    pp = H.parse_pps(H.rbsp_unescape(tail_pps[1:]))
    assert pp["second_chroma_qp_index_offset"] == 0
    # absent tail → inferred equal to chroma_qp_index_offset (spec 7.4.2.2)
    pp0 = H.parse_pps(H.rbsp_unescape(base_pps[1:]))
    assert (pp0["second_chroma_qp_index_offset"]
            == pp0["chroma_qp_index_offset"])

    # one-MB frame with a Cr-only chroma DC residual: the Cr plane is the
    # only thing a second offset can change
    cdc = ([0, 0, 0, 0], [40, 0, 0, 0])  # (cb, cr) 2x2 DC levels
    mbs = [("i16", 2, [0] * 16, cdc)]
    idr = H.encode_i_frame(mbs, 1, 1, 26)
    dec_plain = H.decode_i_frame([base_sps, base_pps, idr])
    dec_tail0 = H.decode_i_frame([base_sps, tail_pps, idr])
    assert (dec_plain == dec_tail0).all()

    # nonzero second offset: Cr decodes at chroma_qp(26, 12) != chroma_qp(26, 0)
    tail12 = H.encode_sps_pps(1, 1, qp=26, second_cqpo=12)[1]
    dec_tail12 = H.decode_i_frame([base_sps, tail12, idr])
    assert not (dec_tail12 == dec_plain).all()
    # exactness of the routing: for a Cr-ONLY residual (deblock off, flat
    # prediction), decoding with second_cqpo=12 must equal decoding with
    # the FIRST offset at 12 — the first offset demonstrably reaches the
    # dequant path, so bit-equality proves the second offset reaches the
    # same path for Cr
    first12 = H.encode_sps_pps(1, 1, qp=26, cqpo=12)[1]
    assert (dec_tail12 == H.decode_i_frame([base_sps, first12, idr])).all()

    # a Cb-only residual must be IMMUNE to the second offset (it would
    # not be if the tail offset were applied to both planes)
    cdc_cb = ([40, 0, 0, 0], [0, 0, 0, 0])
    idr_cb = H.encode_i_frame([("i16", 2, [0] * 16, cdc_cb)], 1, 1, 26)
    assert (
        H.decode_i_frame([base_sps, tail12, idr_cb])
        == H.decode_i_frame([base_sps, base_pps, idr_cb])
    ).all()

    # refused tail features raise (the documented NULL-degradation path)
    w = H.BitWriter()
    w.ue(0); w.ue(0)              # pps_id, sps_id
    w.u(0, 1); w.u(0, 1)          # CAVLC, bottom_field
    w.ue(0); w.ue(0); w.ue(0)     # slice groups, ref_idx l0/l1
    w.u(0, 1); w.u(0, 2)          # weighted_pred, bipred_idc
    w.se(0); w.se(0); w.se(0)     # qp, qs, chroma_qp_index_offset
    w.u(1, 1); w.u(0, 1); w.u(0, 1)  # deblock present, constrained, redundant
    w.u(1, 1)                     # transform_8x8_mode_flag = 1 → refuse
    w.rbsp_trailing()
    with pytest.raises(H.H264Error, match="transform_8x8"):
        H.parse_pps(w.tobytes())


def test_decode_frames_uses_all_parameter_sets(spark):
    """An avc1 MP4 whose avcC carries TWO PPS entries, the FIRST a decoy
    (pps_id 1, wrong QP) and the SECOND the one the slices reference
    (pps_id 0): decode_frames must route through the by-id maps and
    decode real pixels — the first-of-each shortcut degraded these
    samples to NULL rows unnecessarily (ADVICE r10)."""
    from pyspark.sql import functions as F  # noqa: F401

    from engine_spark.datapipe.multimodal import decode_frames, encode_mp4

    sps, pps, idr = H.encode_solid_gray_stream(2, 2, 160, 26)
    decoy = H.encode_sps_pps(2, 2, qp=40, pps_id=1)[1]
    avcc = H.build_avcc(sps, decoy, extra_pps=(pps,))
    cfg = H.parse_avcc(avcc)
    assert set(cfg["pps_by_id"]) == {0, 1}
    assert cfg["pps"]["pps_id"] == 1  # first-of-each IS the decoy
    ext = (len(avcc) + 8).to_bytes(4, "big") + b"avcC" + avcc
    mp4 = encode_mp4(
        [len(idr).to_bytes(4, "big") + idr], codec=b"avc1",
        sample_entry_ext=ext,
    )
    docs = spark.createDataFrame([(7, bytearray(mp4))], "doc_id long, payload binary")
    rows = decode_frames(docs, 1).collect()
    v = H.i16dc_recon_value(160, 26)
    assert len(rows) == 1
    assert rows[0]["pix_sum"] == 3 * v * 32 * 32  # real pixels, not NULL


# ---------------------------------------------------------------------------
# CAVLC VLC1/VLC2 cross-transcription (VERDICT r10 task #6): the module's
# coeff_token tables for 2<=nC<4 and 4<=nC<8 were previously validated
# only structurally + by paired encoder/decoder round-trip (a consistent
# mistranscription would cancel out). Here a SECOND transcription of
# ITU-T H.264 Table 9-5 — written independently in this test file —
# GENERATES the coeff_token prefix of each stream, and the module decoder
# must reproduce the exact coefficients: any row where the two
# transcriptions disagree decodes a wrong (t1, tc) or desyncs the
# bitstream and fails loudly.
# ---------------------------------------------------------------------------

# Table 9-5, column 2 <= nC < 4: (TrailingOnes, TotalCoeff) -> codeword
_REF2_VLC1 = {
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

# Table 9-5, column 4 <= nC < 8
_REF2_VLC2 = {
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


def _block_with(t1, tc, rng):
    """A zigzag coefficient block with exactly tc nonzeros whose trailing
    (highest-frequency) t1 values are +/-1 and the rest have |level| >= 2
    (so the encoder derives exactly (t1, tc)). When t1 == 3 the
    immediately-preceding coefficient may also be +/-1 only if capped —
    avoid that by keeping non-T1 levels >= 2 always."""
    levels = [rng.choice((-1, 1)) for _ in range(t1)]
    levels += [rng.choice((-9, -3, -2, 2, 3, 9)) for _ in range(tc - t1)]
    # scan-order positions: place the tc values in the FIRST tc slots is
    # legal but exercise runs too — scatter with random zero gaps
    pos = sorted(rng.sample(range(16), tc))
    blk = [0] * 16
    # levels[] above are in decode order (highest frequency first); the
    # zigzag array stores them lowest-frequency-first, so reverse
    for p, lv in zip(pos, list(reversed(levels))):
        blk[p] = lv
    return blk


def test_vlc1_vlc2_streams_from_independent_transcription_decode():
    rng = random.Random(4242)
    cases = [(t, _REF2_VLC1, H._CT_VLC1) for t in ((2,), (3,))] + [
        (t, _REF2_VLC2, H._CT_VLC2) for t in ((4,), (5,), (6,), (7,))
    ]
    n_checked = 0
    for (nC,), ref_table, mod_table in cases:
        assert set(ref_table) == set(mod_table)
        for (t1, tc), ref_code in sorted(ref_table.items()):
            blk = _block_with(t1, tc, rng)
            # module encoder emits coeff_token + suffix from ITS tables;
            # swap the prefix for the independent transcription's code —
            # if the transcriptions disagree on this row, the decoder
            # reads a wrong (t1, tc) or desyncs and the assert fires
            w = H.BitWriter()
            H.encode_residual_block(w, blk, nC)
            mod_code = mod_table[(t1, tc)]
            assert "".join(map(str, w.bits[: len(mod_code)])) == mod_code
            bits = [int(b) for b in ref_code] + w.bits[len(mod_code):]
            nbits = len(bits)
            w2 = H.BitWriter()
            for b in bits:
                w2.u(b, 1)
            w2.u(0, 32)  # padding so truncated reads fail loudly
            got, got_tc = H.decode_residual_block(H.BitReader(w2.tobytes()), nC, 16)
            r2 = H.BitReader(w2.tobytes())
            H.decode_residual_block(r2, nC, 16)
            assert got == blk, (nC, t1, tc)
            assert got_tc == tc and r2.pos == nbits, (nC, t1, tc)
            n_checked += 1
    assert n_checked == 6 * len(_REF2_VLC1)


def test_dense_frames_hit_vlc1_vlc2_contexts_against_pixel_reference():
    """End-to-end: frames whose blocks carry 8-16 coefficients drive the
    decoder's nC into the VLC1/VLC2 (and FLC) contexts — asserted by
    spying the actual nC values used — and the decoded pixels must match
    the independent reconstruction reference (test_h264.py's second
    transcription of intra prediction + dequant + IDCT)."""
    rng = random.Random(7)
    wmb, hmb, qp = 3, 2, 26
    mbs = []
    for mb in range(wmb * hmb):
        mbx, mby = mb % wmb, mb // wmb
        modes, coeffs = [], []
        for i in range(16):
            legal = [m for m in range(9) if _mode_legal(m, i, mbx, mby, wmb)]
            modes.append(rng.choice(legal))
            blk = [0] * 16
            # mixed densities so neighbor-nnz averages land in EVERY
            # coeff_token context: low counts -> 2<=nC<4 (VLC1), mid ->
            # 4<=nC<8 (VLC2), high -> the nC>=8 FLC
            for p in rng.sample(range(16), rng.choice((2, 3, 3, 5, 6, 8, 12, 16))):
                blk[p] = rng.choice((-5, -2, -1, 1, 2, 5))
            coeffs.append(blk if any(blk) else None)
        mbs.append(("i4", modes, coeffs, None))
    sps, pps = H.encode_sps_pps(wmb, hmb, qp=qp)
    idr = H.encode_i_frame(mbs, wmb, hmb, qp)

    seen_nc = []
    orig = H._coeff_token_read

    def spy(r, nC):
        seen_nc.append(nC)
        return orig(r, nC)

    H._coeff_token_read = spy
    try:
        rgb = H.decode_i_frame([sps, pps, idr])
    finally:
        H._coeff_token_read = orig
    assert any(2 <= n < 4 for n in seen_nc), "VLC1 context never hit"
    assert any(4 <= n < 8 for n in seen_nc), "VLC2 context never hit"
    assert any(n >= 8 for n in seen_nc), "FLC context never hit"
    y_ref = _ref_decode_i4_frame(wmb, hmb, mbs, qp)
    assert (rgb[:, :, 0] == y_ref).all()
    assert (rgb[:, :, 1] == y_ref).all() and (rgb[:, :, 2] == y_ref).all()


# ---------------------------------------------------------------------------
# P slices (inter prediction, 8.4): short-GOP subset — skip / 16x16 /
# 16x8 / 8x16 / intra-in-P, quarter-pel 6-tap luma + eighth-pel bilinear
# chroma, per-segment deblock bS. The interpolation is validated against
# an INDEPENDENT per-sample reference implemented here from the spec.
# ---------------------------------------------------------------------------


def _ref_luma_sample(ref, x, y, mvx, mvy):
    """Independent scalar quarter-pel luma interpolation (8.4.2.2.1):
    per-sample, explicit Table 8-12 case analysis, edge clamp."""
    Hh, Ww = ref.shape

    def S(xx, yy):  # edge-clamped integer sample
        return int(ref[min(max(yy, 0), Hh - 1), min(max(xx, 0), Ww - 1)])

    ix, fx = (x * 4 + mvx) >> 2, (x * 4 + mvx) & 3
    iy, fy = (y * 4 + mvy) >> 2, (y * 4 + mvy) & 3

    def halfh(xx, yy):  # b: half-pel between (xx,yy) and (xx+1,yy)
        t = (S(xx - 2, yy) - 5 * S(xx - 1, yy) + 20 * S(xx, yy)
             + 20 * S(xx + 1, yy) - 5 * S(xx + 2, yy) + S(xx + 3, yy))
        return min(max((t + 16) >> 5, 0), 255)

    def halfv(xx, yy):
        t = (S(xx, yy - 2) - 5 * S(xx, yy - 1) + 20 * S(xx, yy)
             + 20 * S(xx, yy + 1) - 5 * S(xx, yy + 2) + S(xx, yy + 3))
        return min(max((t + 16) >> 5, 0), 255)

    def centerj(xx, yy):  # j: vertical raw 6-tap then horizontal, >>10
        def vraw(cx):
            return (S(cx, yy - 2) - 5 * S(cx, yy - 1) + 20 * S(cx, yy)
                    + 20 * S(cx, yy + 1) - 5 * S(cx, yy + 2) + S(cx, yy + 3))
        t = (vraw(xx - 2) - 5 * vraw(xx - 1) + 20 * vraw(xx)
             + 20 * vraw(xx + 1) - 5 * vraw(xx + 2) + vraw(xx + 3))
        return min(max((t + 512) >> 10, 0), 255)

    G = S(ix, iy)
    if (fx, fy) == (0, 0):
        return G
    b = halfh(ix, iy)
    h = halfv(ix, iy)
    if fy == 0:
        return b if fx == 2 else (G + b + 1) >> 1 if fx == 1 else (S(ix + 1, iy) + b + 1) >> 1
    if fx == 0:
        return h if fy == 2 else (G + h + 1) >> 1 if fy == 1 else (S(ix, iy + 1) + h + 1) >> 1
    j = centerj(ix, iy)
    m = halfv(ix + 1, iy)
    s = halfh(ix, iy + 1)
    if (fx, fy) == (1, 1):
        return (b + h + 1) >> 1
    if (fx, fy) == (2, 1):
        return (b + j + 1) >> 1
    if (fx, fy) == (3, 1):
        return (b + m + 1) >> 1
    if (fx, fy) == (1, 2):
        return (h + j + 1) >> 1
    if (fx, fy) == (2, 2):
        return j
    if (fx, fy) == (3, 2):
        return (j + m + 1) >> 1
    if (fx, fy) == (1, 3):
        return (h + s + 1) >> 1
    if (fx, fy) == (2, 3):
        return (j + s + 1) >> 1
    return (m + s + 1) >> 1  # (3, 3)


def test_interp_luma_matches_independent_reference_all_fracs():
    rng = np.random.RandomState(11)
    ref = rng.randint(0, 256, (24, 28)).astype(np.int64)
    for mvi in (-9, -1, 0, 3, 17):  # integer parts, incl. off-frame
        for fx in range(4):
            for fy in range(4):
                mvx, mvy = mvi * 4 + fx, (mvi // 2) * 4 + fy
                got = H._interp_luma_block(ref, 5, 3, 8, 8, mvx, mvy)
                exp = np.array(
                    [[_ref_luma_sample(ref, 5 + c, 3 + r, mvx, mvy)
                      for c in range(8)] for r in range(8)]
                )
                assert (got == exp).all(), (mvx, mvy)


def test_interp_chroma_matches_independent_bilinear():
    rng = np.random.RandomState(5)
    ref = rng.randint(0, 256, (12, 14)).astype(np.int64)

    def S(xx, yy):
        return int(ref[min(max(yy, 0), 11), min(max(xx, 0), 13)])

    for mvx in (-11, -3, 0, 5, 13, 29):
        for mvy in (-6, 0, 7, 18):
            got = H._interp_chroma_block(ref, 4, 2, 4, 4, mvx, mvy)
            ix, dx = mvx >> 3, mvx & 7
            iy, dy = mvy >> 3, mvy & 7
            exp = np.array([[
                ((8 - dx) * (8 - dy) * S(4 + c + ix, 2 + r + iy)
                 + dx * (8 - dy) * S(4 + c + ix + 1, 2 + r + iy)
                 + (8 - dx) * dy * S(4 + c + ix, 2 + r + iy + 1)
                 + dx * dy * S(4 + c + ix + 1, 2 + r + iy + 1) + 32) >> 6
                for c in range(4)] for r in range(4)])
            assert (got == exp).all(), (mvx, mvy)


def _textured_idr(wmb, hmb, seed=3):
    """Random-luma PCM IDR with NEUTRAL chroma (128), so the decoded RGB
    channels all equal luma and region assertions can work on one plane
    (a fractional luma MV implies a fractional CHROMA mv, so textured
    chroma would interpolate rather than shift)."""
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 256, (hmb * 16, wmb * 16))
    flat8 = np.full((8, 8), 128)
    mbs = [("pcm", y[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16],
            flat8, flat8)
           for my in range(hmb) for mx in range(wmb)]
    return H.encode_i_frame(mbs, wmb, hmb, 26)


def test_p_frame_fractional_mv_matches_reference_interp():
    """End-to-end: a P frame whose MBs carry one global fractional MV
    must equal the independent interpolation of the DECODED reference
    luma (gray chroma keeps RGB = luma)."""
    wmb, hmb = 3, 2
    sps, pps = H.encode_sps_pps(wmb, hmb, qp=26)
    rng = np.random.RandomState(9)
    y = rng.randint(0, 256, (hmb * 16, wmb * 16))
    flat = np.full((8, 8), 128)
    mbs = [("pcm", y[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16], flat, flat)
           for my in range(hmb) for mx in range(wmb)]
    idr = H.encode_i_frame(mbs, wmb, hmb, 26)
    for mv in ((5, 0), (0, 7), (6, 6), (-3, 9), (13, -5), (1, 3)):
        p = H.encode_p_frame([("p16", mv, None, None)] * (wmb * hmb), wmb, hmb)
        out = H.decode_gop([[sps, pps, idr], [p]])
        assert out[1] is not None, mv
        ref_y = out[0][:, :, 1].astype(np.int64)  # G == Y (gray chroma)
        exp = np.array([[_ref_luma_sample(ref_y, x, yy, mv[0], mv[1])
                         for x in range(wmb * 16)] for yy in range(hmb * 16)])
        assert (out[1][:, :, 1] == exp).all(), mv


def test_p_partitions_skip_runs_intra_and_residuals():
    """Composite P frame: skip run, 16x16 with luma+chroma residual,
    16x8 and 8x16 partitions with distinct MVs, an intra I_16x16 MB, and
    a trailing skip run — pixel-exact against per-region expectations."""
    wmb, hmb = 3, 3
    sps, pps = H.encode_sps_pps(wmb, hmb, qp=26)
    idr = _textured_idr(wmb, hmb)
    out0 = H.decode_gop([[sps, pps, idr]])[0]
    blk = [0] * 16
    blk[0] = 12
    coeffs = [blk] + [None] * 15  # residual only in luma 4x4 block 0
    descs = [
        ("skip",),
        ("p16", (8, 4), coeffs, None),
        ("p16x8", (4, 0), (0, 4), None, None),
        ("p8x16", (-4, 0), (0, -4), None, None),
        ("i16", 2, [320] + [0] * 15, None),
        ("skip",), ("skip",), ("skip",), ("skip",),
    ]
    p = H.encode_p_frame(descs, wmb, hmb)
    out1 = H.decode_gop([[sps, pps, idr], [p]])[1]
    assert out1 is not None
    # spot-check regions with INTEGER mv against shifted reference luma
    g0, g1 = out0[:, :, 1].astype(np.int64), out1[:, :, 1].astype(np.int64)

    def shifted(x0, y0, w, h, dx, dy):
        rows = np.clip(np.arange(y0 + dy, y0 + dy + h), 0, hmb * 16 - 1)
        cols = np.clip(np.arange(x0 + dx, x0 + dx + w), 0, wmb * 16 - 1)
        return g0[np.ix_(rows, cols)]

    # MB 0 skip: first MB's skip-mv is (0,0) -> copy
    assert (g1[0:16, 0:16] == g0[0:16, 0:16]).all()
    # MB 2 (16x8): top partition mv (1,0) int, bottom (0,1) int
    assert (g1[0:8, 32:48] == shifted(32, 0, 16, 8, 1, 0)).all()
    assert (g1[8:16, 32:48] == shifted(32, 8, 16, 8, 0, 1)).all()
    # MB 3 (8x16): left mv (-1,0), right (0,-1)
    assert (g1[16:32, 0:8] == shifted(0, 16, 8, 16, -1, 0)).all()
    assert (g1[16:32, 8:16] == shifted(8, 16, 8, 16, 0, -1)).all()
    # MB 4: intra I_16x16 in P slice — DC prediction from P neighbors
    # plus its own DC residual; just pin determinism vs a re-decode
    out1b = H.decode_gop([[sps, pps, idr], [p]])[1]
    assert (out1 == out1b).all()
    # MB 1 (16x16, mv (2,1) int, residual): MC + independent residual
    mc = shifted(16, 0, 16, 16, 2, 1)
    res = (_ref_dequant_idct(blk, 26) + 32) >> 6
    exp_blk = np.clip(mc[0:4, 0:4] + res, 0, 255)
    assert (g1[0:4, 16:20] == exp_blk).all()
    # rest of MB 1 luma: pure MC
    assert (g1[4:16, 16:32] == np.clip(mc[4:16, :], 0, 255)).all()
    # trailing skips (MBs 5-8): zero-mv copies (their neighbors' mvs are
    # nonzero, so assert against the decoder-shared skip rule only by
    # determinism and non-null decode — the closed-form cases above pin
    # the arithmetic)


def test_p_chroma_dc_residual_on_mc_prediction():
    """A P MB's chroma DC residual lands on the MOTION-COMPENSATED
    prediction: flat-128 chroma reference + zero-mv 16x16 with Cb-only
    DC level 40 reproduces the intra test's closed-form Cb shift (same
    dequant path, prediction = copied 128), Cr untouched."""
    sps, pps = H.encode_sps_pps(1, 1, qp=26)
    gray = np.full((16, 16), 128)
    flat8 = np.full((8, 8), 128)
    idr = H.encode_i_frame([("pcm", gray, flat8, flat8)], 1, 1, 26)
    p = H.encode_p_frame(
        [("p16", (0, 0), None, ([40, 0, 0, 0], [0, 0, 0, 0]))], 1, 1
    )
    out = H.decode_gop([[sps, pps, idr], [p]])[1]
    assert out is not None
    qpc = H.chroma_qp(26, 0)
    dc = ((40 * H._V[qpc % 6][0]) << (qpc // 6)) >> 5
    cb = 128 + ((dc + 32) >> 6)
    exp_b = np.clip(np.rint(128 + 1.772 * (cb - 128)), 0, 255)
    assert (out[:, :, 2] == exp_b).all()          # Cb moved
    assert (out[:, :, 0] == 128).all()            # Cr (R channel) untouched


def test_p_refusals_and_gop_poisoning():
    wmb, hmb = 2, 1
    sps, pps = H.encode_sps_pps(wmb, hmb, qp=26)
    sps_m, pps_m = H._seed_param_maps(
        H.parse_sps(H.rbsp_unescape(sps[1:])), H.parse_pps(H.rbsp_unescape(pps[1:]))
    )
    gray = np.full((16, 16), 100)
    flat8 = np.full((8, 8), 128)
    idr = H.encode_i_frame([("pcm", gray, flat8, flat8)] * 2, wmb, hmb, 26)
    ref_fr = H.decode_access_unit([sps, pps, idr], dict(sps_m), dict(pps_m))
    ref = {"y": ref_fr.y, "cb": ref_fr.cb, "cr": ref_fr.cr}

    # bad sub_mb_type refused (P_8x8 itself is supported)
    w = H.BitWriter()
    w.ue(0); w.ue(5); w.ue(0); w.u(1, 4)
    w.u(0, 1); w.u(0, 1); w.u(0, 1); w.se(0); w.ue(1)
    w.ue(0)   # skip run 0
    w.ue(3)   # mb_type P_8x8
    w.ue(4)   # sub_mb_type out of range
    w.rbsp_trailing()
    with pytest.raises(H.H264Error, match="sub_mb_type"):
        H.decode_access_unit(
            [H._nal(1, w.tobytes())], dict(sps_m), dict(pps_m), ref
        )

    # a ref_idx beyond the available reference list refuses loudly
    w = H.BitWriter()
    w.ue(0); w.ue(5); w.ue(0); w.u(1, 4)
    w.u(1, 1); w.ue(1)  # override: num_ref_idx_l0_active = 2
    w.u(0, 1)           # no list modification
    w.u(0, 1)           # sliding-window marking
    w.se(0); w.ue(1)    # qp delta, deblock off
    w.ue(0)             # skip run 0
    w.ue(0)             # mb_type P_L0_16x16
    w.u(0, 1)           # te(v) ref_idx (max 1): bit 0 -> ref_idx 1
    w.rbsp_trailing()
    with pytest.raises(H.H264Error, match="outside the reference list"):
        H.decode_access_unit(
            [H._nal(1, w.tobytes())], dict(sps_m), dict(pps_m), ref
        )

    # reordered reference lists stay refused
    w = H.BitWriter()
    w.ue(0); w.ue(5); w.ue(0); w.u(1, 4)
    w.u(0, 1)           # no override
    w.u(1, 1)           # ref_pic_list_modification_flag_l0 = 1
    w.rbsp_trailing()
    with pytest.raises(H.H264Error, match="modification"):
        H.decode_access_unit(
            [H._nal(1, w.tobytes())], dict(sps_m), dict(pps_m), ref
        )

    # GOP poisoning: IDR, good P, CORRUPT P, P (poisoned), IDR recovers
    p_ok = H.encode_p_frame([("skip",)] * 2, wmb, hmb)
    ci = len(p_ok) - 1  # flip the trailing byte (stop bit / run syntax)
    corrupt = p_ok[:ci] + bytes([p_ok[ci] ^ 0x7F]) + p_ok[ci + 1:]
    out = H.decode_gop(
        [[sps, pps, idr], [p_ok], [corrupt], [p_ok], [idr], [p_ok]]
    )
    assert out[0] is not None and out[1] is not None
    assert (out[1] == out[0]).all()
    # corrupt unit: either fails (None) or decodes to SOMETHING — if it
    # fails, the chain must poison until the IDR
    if out[2] is None:
        assert out[3] is None
    assert out[4] is not None and out[5] is not None
    assert (out[5] == out[4]).all()


def test_p_deblock_flat_noop_and_edge_bs():
    # flat skip frame with deblock ON: every bS is 0 (no coeffs, equal
    # zero mvs, same ref) -> bit-identical to deblock-off decode
    wmb, hmb = 2, 2
    sps, pps = H.encode_sps_pps(wmb, hmb, qp=26)
    rng = np.random.RandomState(17)
    y = rng.randint(0, 256, (hmb * 16, wmb * 16))
    flat8 = np.full((8, 8), 128)
    mbs = [("pcm", y[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16], flat8, flat8)
           for my in range(hmb) for mx in range(wmb)]
    idr = H.encode_i_frame(mbs, wmb, hmb, 26)
    p_on = H.encode_p_frame([("skip",)] * 4, wmb, hmb, deblock_idc=0)
    p_off = H.encode_p_frame([("skip",)] * 4, wmb, hmb, deblock_idc=1)
    out_on = H.decode_gop([[sps, pps, idr], [p_on]])[1]
    out_off = H.decode_gop([[sps, pps, idr], [p_off]])[1]
    assert out_on is not None and (out_on == out_off).all()

    # _edge_bs unit rules on synthetic state
    fr = H._Frame({"width_mbs": 2, "height_mbs": 1})
    fr.blk_ref[:] = 0
    fr.blk_nnz[:] = 0
    fr.blk_mv[:] = 0
    assert H._edge_bs(fr, 3, 0, 4, 0, mb_edge=True) == 0
    fr.blk_nnz[0, 4] = 2
    assert H._edge_bs(fr, 3, 0, 4, 0, mb_edge=True) == 2
    fr.blk_nnz[0, 4] = 0
    fr.blk_mv[0, 4] = (4, 0)  # 1-pel horizontal difference
    assert H._edge_bs(fr, 3, 0, 4, 0, mb_edge=True) == 1
    fr.blk_mv[0, 4] = (3, 0)  # < 1 pel
    assert H._edge_bs(fr, 3, 0, 4, 0, mb_edge=True) == 0
    fr.blk_ref[0, 3] = -1  # intra side
    assert H._edge_bs(fr, 3, 0, 4, 0, mb_edge=True) == 4
    assert H._edge_bs(fr, 3, 0, 4, 0, mb_edge=False) == 3


def test_decode_frames_short_gop_p_chain(spark):
    """decode_frames over an avc1 MP4 whose GOP is IDR + P + P: sampled
    P frames decode REAL pixels by chaining from the anchor; a corrupt P
    poisons the rest of its GOP (NULL rows) and the next IDR recovers."""
    from engine_spark.datapipe.multimodal import decode_frames, encode_mp4

    wmb, hmb = 2, 2
    sps, pps, idr = H.encode_solid_gray_stream(wmb, hmb, 160, 26)
    v = H.i16dc_recon_value(160, 26)
    # P1: all-skip (copy); P2: one i16 DC-residual MB on top of skips
    p1 = H.encode_p_frame([("skip",)] * 4, wmb, hmb, frame_num=1)
    p2 = H.encode_p_frame(
        [("i16", 2, [320] + [0] * 15, None)] + [("skip",)] * 3,
        wmb, hmb, frame_num=2,
    )
    avcc = H.build_avcc(sps, pps)
    ext = (len(avcc) + 8).to_bytes(4, "big") + b"avcC" + avcc

    def sample(nal):
        return len(nal).to_bytes(4, "big") + nal

    # GOP1: idr p1 p2; GOP2: idr p1
    mp4 = encode_mp4(
        [sample(idr), sample(p1), sample(p2), sample(idr), sample(p1)],
        codec=b"avc1", sample_entry_ext=ext,
    )
    docs = spark.createDataFrame(
        [(1, bytearray(mp4))], "doc_id long, payload binary"
    )
    rows = {r["frame_idx"]: r for r in decode_frames(docs, 1).collect()}
    assert len(rows) == 5
    npix = (wmb * 16) * (hmb * 16)
    assert rows[0]["pix_sum"] == 3 * v * npix
    assert rows[1]["pix_sum"] == 3 * v * npix  # skip copy
    assert rows[3]["pix_sum"] == 3 * v * npix
    assert rows[4]["pix_sum"] == 3 * v * npix
    # frame 2: MB0 replaced by an intra DC MB predicting from P-decoded
    # neighbors... its top/left are unavailable -> DC pred 128 + residual
    v2 = H.i16dc_recon_value(320, 26)
    # MB0 luma becomes v2 (DC pred over unavailable neighbors is 128
    # baseline + dequant(320)); other MBs keep v
    exp2 = 3 * (v2 * 256 + v * (npix - 256))
    assert rows[2]["pix_sum"] == exp2

    # sampling every_k=2 picks frames 0, 2, 4 — frame 2 is a P that
    # must chain through unsampled frame 1
    rows2 = {r["frame_idx"]: r for r in decode_frames(docs, 2).collect()}
    assert sorted(rows2) == [0, 2, 4]
    assert rows2[2]["pix_sum"] == exp2 and rows2[4]["pix_sum"] == 3 * v * npix

    # corrupt P1 of GOP1: frames 1 AND 2 degrade to NULL, GOP2 intact
    i1 = mp4.find(p1)
    bad = bytearray(mp4)
    bad[i1 + len(p1) - 1] ^= 0x7F
    docs_bad = spark.createDataFrame(
        [(2, bytes(bad))], "doc_id long, payload binary"
    )
    rows3 = {r["frame_idx"]: r for r in decode_frames(docs_bad, 1).collect()}
    assert rows3[0]["pix_sum"] == 3 * v * npix
    assert rows3[3]["pix_sum"] == 3 * v * npix  # next IDR recovers
    assert rows3[1]["pix_sum"] is None or rows3[2]["pix_sum"] is None


def test_p8x8_sub_partitions_integer_mvs_match_shifted_reference():
    """P_8x8 down to 4x4 sub-partitions: each sub-block carries its OWN
    integer mv, so every region must equal its shifted reference — and
    the encoder's mv prediction (shared _mv_pred over the shadow state)
    must round-trip through the decoder's, at 4x4 granularity."""
    wmb, hmb = 2, 2
    sps, pps = H.encode_sps_pps(wmb, hmb, qp=26)
    idr = _textured_idr(wmb, hmb, seed=21)
    out0 = H.decode_gop([[sps, pps, idr]])[0]
    g0 = out0[:, :, 1].astype(np.int64)

    mv_a, mv_b = (4, 0), (0, 4)          # +1px right / +1px down
    mv_c, mv_d = (-4, 4), (8, -4)        # mixed
    descs = [
        # MB0: four 8x8s with sub types 0/1/2/3
        ("p8x8", [
            (0, [mv_a]),
            (1, [mv_b, mv_a]),
            (2, [mv_c, mv_d]),
            (3, [mv_a, mv_b, mv_c, mv_d]),
        ], None, None),
        ("skip",), ("skip",), ("skip",),
    ]
    p = H.encode_p_frame(descs, wmb, hmb)
    out1 = H.decode_gop([[sps, pps, idr], [p]])[1]
    assert out1 is not None
    g1 = out1[:, :, 1].astype(np.int64)

    def shifted(x0, y0, w, h, mv):
        rows = np.clip(np.arange(y0 + mv[1] // 4, y0 + mv[1] // 4 + h),
                       0, hmb * 16 - 1)
        cols = np.clip(np.arange(x0 + mv[0] // 4, x0 + mv[0] // 4 + w),
                       0, wmb * 16 - 1)
        return g0[np.ix_(rows, cols)]

    # 8x8 sub 0 (one 8x8, mv_a)
    assert (g1[0:8, 0:8] == shifted(0, 0, 8, 8, mv_a)).all()
    # 8x8 sub 1 (two 8x4: mv_b then mv_a)
    assert (g1[0:4, 8:16] == shifted(8, 0, 8, 4, mv_b)).all()
    assert (g1[4:8, 8:16] == shifted(8, 4, 8, 4, mv_a)).all()
    # 8x8 sub 2 (two 4x8: mv_c then mv_d)
    assert (g1[8:16, 0:4] == shifted(0, 8, 4, 8, mv_c)).all()
    assert (g1[8:16, 4:8] == shifted(4, 8, 4, 8, mv_d)).all()
    # 8x8 sub 3 (four 4x4)
    for (sox, soy), mv in zip(((8, 8), (12, 8), (8, 12), (12, 12)),
                              (mv_a, mv_b, mv_c, mv_d)):
        assert (g1[soy:soy + 4, sox:sox + 4]
                == shifted(sox, soy, 4, 4, mv)).all(), (sox, soy)


def test_mv_pred_spec_cases_hand_derived():
    """_mv_pred is SHARED by encoder and decoder (mvds round-trip by
    construction), so its spec conformance needs direct cases derived by
    hand from 8.4.1.3 — a divergence would misdecode external streams
    while passing every round-trip."""
    fr = H._Frame({"width_mbs": 3, "height_mbs": 2})
    fr.blk_slice[:] = 0

    def setblk(bx, by, mv, ref):
        fr.blk_mv[by, bx] = mv
        fr.blk_ref[by, bx] = ref

    # target partition: MB (1,1) 16x16 -> block origin (4,4)
    # A = (3,4), B = (4,3), C = (8,3), D = (3,3)
    # case 1: three inter neighbors with distinct mvs -> componentwise median
    setblk(3, 4, (10, -2), 0)   # A
    setblk(4, 3, (4, 6), 0)     # B
    setblk(8, 3, (-8, 0), 0)    # C
    assert H._mv_pred(fr, 1, 1, 0, 0, 16, 16, 0) == (4, 0)

    # case 2: exactly one neighbor shares ref 0 (others intra) -> its mv
    setblk(4, 3, (0, 0), -1)    # B intra
    setblk(8, 3, (0, 0), -1)    # C intra
    assert H._mv_pred(fr, 1, 1, 0, 0, 16, 16, 0) == (10, -2)

    # case 3: C unavailable (undecoded) -> D substitutes
    setblk(4, 3, (4, 6), 0)     # B inter again
    fr.blk_ref[3, 8] = -2       # C undecoded
    setblk(3, 3, (2, 2), 0)     # D
    assert H._mv_pred(fr, 1, 1, 0, 0, 16, 16, 0) == (4, 2)  # med(10,4,2),(−2,6,2)

    # case 4: A available, B/C/D all unavailable -> mvA verbatim
    fr2 = H._Frame({"width_mbs": 3, "height_mbs": 2})
    fr2.blk_slice[:] = 0
    fr2.blk_mv[4, 3] = (7, 9)
    fr2.blk_ref[4, 3] = 0       # A of MB (1,1)... but B/C/D undecoded (-2)
    assert H._mv_pred(fr2, 1, 1, 0, 0, 16, 16, 0) == (7, 9)

    # case 5: 16x8 directional shortcuts — top takes mvB when refB
    # matches, bottom takes mvA
    setblk(4, 3, (4, 6), 0)
    fr.blk_ref[3, 8] = 0
    fr.blk_mv[3, 8] = (-8, 0)
    assert H._mv_pred(fr, 1, 1, 0, 0, 16, 8, 0, shortcut="B") == (4, 6)
    setblk(3, 6, (1, 1), 0)     # A of the bottom 16x8 partition (row 6)
    assert H._mv_pred(fr, 1, 1, 0, 8, 16, 8, 0, shortcut="A") == (1, 1)

    # skip-mv zero conditions (8.4.1.1): A has ref0 zero-mv -> (0,0)
    fr3 = H._Frame({"width_mbs": 3, "height_mbs": 2})
    fr3.blk_slice[:] = 0
    fr3.blk_ref[4, 3] = 0       # A of MB (1,1): ref0, mv (0,0)
    fr3.blk_ref[3, 4] = 0
    fr3.blk_mv[3, 4] = (5, 5)   # B nonzero
    assert H._skip_mv(fr3, 1, 1, 0) == (0, 0)
    # A nonzero, B nonzero, both available -> the 16x16 predictor
    fr3.blk_mv[4, 3] = (5, 5)
    fr3.blk_ref[3, 8] = 0
    fr3.blk_mv[3, 8] = (5, 5)   # C
    assert H._skip_mv(fr3, 1, 1, 0) == (5, 5)
    # B (above) unavailable -> (0,0) regardless of A
    assert H._skip_mv(fr3, 1, 0, 0) == (0, 0)


def test_cbp_inter_table_bijection_and_spec_pins():
    """Table 9-4's Inter column: a permutation of 0..47, with the
    low-codeNum rows pinned by hand from the published table (inter
    coding favors sparse patterns: cbp 0 gets the shortest code, then
    chroma-DC-only 16, then single luma quadrants) — a second
    transcription of the rows the encoder round-trip cannot falsify."""
    assert sorted(H._CBP_INTER) == list(range(48))
    pins = {0: 0, 1: 16, 2: 1, 3: 2, 4: 4, 5: 8, 6: 32, 7: 3,
            8: 5, 9: 10, 10: 12, 11: 15, 12: 47, 13: 7, 14: 11,
            15: 13, 16: 14, 17: 6, 18: 9, 46: 38, 47: 41}
    for code_num, cbp in pins.items():
        assert H._CBP_INTER[code_num] == cbp, (code_num, cbp)
    assert {v: i for i, v in enumerate(H._CBP_INTER)} == H._CBP_INTER_INV


def test_multi_reference_p_frames_pick_the_right_frame():
    """Multi-reference P: a frame whose MBs reference DIFFERENT entries
    of the default RefPicList0 must pull pixels from the right past
    frames — list order (most recent first) is proven by region values,
    and te(v) ref_idx coding round-trips through the fixture encoder."""
    wmb, hmb = 2, 1
    sps, pps = H.encode_sps_pps(wmb, hmb, qp=26)
    # frame 0 (IDR): value A everywhere; frame 1 (P, all-intra): value B
    dcA, dcB = 160, 480
    _, _, idr = H.encode_solid_gray_stream(wmb, hmb, dcA, 26)
    vA = H.i16dc_recon_value(dcA, 26)
    vB = H.i16dc_recon_value(dcB, 26)
    p1 = H.encode_p_frame(
        [("i16", 2, [dcB] + [0] * 15, None),
         ("i16", 2, [0] * 16, None)],
        wmb, hmb, frame_num=1,
    )
    # frame 2 (P, n_ref=2): MB0 references ref 1 (the IDR, value A),
    # MB1 references ref 0 (frame 1, value B)
    p2 = H.encode_p_frame(
        [("p16", (0, 0), None, None, 1),
         ("p16", (0, 0), None, None, 0)],
        wmb, hmb, frame_num=2, n_ref=2,
    )
    out = H.decode_gop([[sps, pps, idr], [p1], [p2]])
    assert all(o is not None for o in out)
    assert (out[0] == vA).all()
    assert (out[1] == vB).all()
    g2 = out[2][:, :, 1]
    assert (g2[:, 0:16] == vA).all()   # MB0 <- ref 1 (two frames back)
    assert (g2[:, 16:32] == vB).all()  # MB1 <- ref 0 (previous frame)

    # n_ref=3 exercises the ue() branch of te(v): frame 3 references the
    # IDR (now ref 2) from both MBs
    p3 = H.encode_p_frame(
        [("p16", (0, 0), None, None, 2)] * 2, wmb, hmb,
        frame_num=3, n_ref=3,
    )
    out2 = H.decode_gop([[sps, pps, idr], [p1], [p2], [p3]])
    assert out2[3] is not None
    g3 = out2[3][:, :, 1]
    assert (g3[:, 0:16] == vA).all() and (g3[:, 16:32] == vA).all()

    # per-8x8 refs in P_8x8: left 8x8s from ref 1 (A), right from ref 0
    p2b = H.encode_p_frame(
        [("p8x8", [(0, [(0, 0)], 1), (0, [(0, 0)], 0),
                   (0, [(0, 0)], 1), (0, [(0, 0)], 0)], None, None),
         ("skip",)],
        wmb, hmb, frame_num=2, n_ref=2,
    )
    out3 = H.decode_gop([[sps, pps, idr], [p1], [p2b]])
    g = out3[2][:, :, 1]
    assert (g[:, 0:8] == vA).all() and (g[:, 8:16] == vB).all()
    # deblock bS: the ref-mismatch edge between the 8x8s is bS 1 — but
    # deblock is off (idc 1 default); content equality above pins MC


def test_weighted_prediction_explicit_closed_form():
    """Explicit weighted P prediction (8.4.2.3.2): a weighted all-skip /
    zero-mv frame over flat content reproduces the closed-form
    ((x*w + 2^(d-1)) >> d) + o per component; absent per-ref flags
    default to the identity; weights are per-REFERENCE in a multi-ref
    slice."""
    wmb, hmb = 2, 1
    sps, pps = H.encode_sps_pps(wmb, hmb, qp=26, weighted_pred=True)
    dcA = 160
    _, _, idr0 = H.encode_solid_gray_stream(wmb, hmb, dcA, 26)
    # re-encode the IDR under the weighted PPS (same pps_id 0): just
    # reuse the IDR NAL — the IDR's I slices never read weights
    vA = H.i16dc_recon_value(dcA, 26)

    wts = {"logwd_l": 1, "logwd_c": 2,
           "luma": [(3, 10)], "chroma": [((2, -4), (8, 5))]}
    p = H.encode_p_frame([("p16", (0, 0), None, None)] * 2, wmb, hmb,
                         frame_num=1, weights=wts)
    out = H.decode_gop([[sps, pps, idr0], [p]])
    assert out[1] is not None
    exp_y = min(255, ((vA * 3 + 1) >> 1) + 10)
    exp_cb = ((128 * 2 + 2) >> 2) - 4       # 60
    exp_cr = ((128 * 8 + 2) >> 2) + 5       # 261 -> clip 255
    exp_cr = min(255, exp_cr)
    # RGB from (exp_y, exp_cb, exp_cr)
    r = np.clip(round(exp_y + 1.402 * (exp_cr - 128)), 0, 255)
    g = np.clip(round(exp_y - 0.344136 * (exp_cb - 128)
                      - 0.714136 * (exp_cr - 128)), 0, 255)
    b = np.clip(round(exp_y + 1.772 * (exp_cb - 128)), 0, 255)
    assert (out[1][:, :, 0] == r).all()
    assert (out[1][:, :, 1] == g).all()
    assert (out[1][:, :, 2] == b).all()

    # identity defaults (flag 0): bit-equal to the unweighted decode
    wts_id = {"logwd_l": 5, "logwd_c": 3, "luma": [None], "chroma": [None]}
    p_id = H.encode_p_frame([("skip",)] * 2, wmb, hmb, frame_num=1,
                            weights=wts_id)
    out_id = H.decode_gop([[sps, pps, idr0], [p_id]])
    assert (out_id[1] == vA).all()  # P_Skip under identity weights

    # per-reference weights in a 2-ref slice: MB0 (ref 1, weighted x2)
    # vs MB1 (ref 0, identity)
    # weighted_pred=1 makes pred_weight_table MANDATORY in every P slice
    # of this PPS — p1 carries identity weights
    p1 = H.encode_p_frame([("i16", 2, [480] + [0] * 15, None),
                           ("i16", 2, [0] * 16, None)],
                          wmb, hmb, frame_num=1, weights=wts_id)
    vB = H.i16dc_recon_value(480, 26)
    wts2 = {"logwd_l": 0, "logwd_c": 0,
            "luma": [None, (2, 0)], "chroma": [None, None]}
    p2 = H.encode_p_frame(
        [("p16", (0, 0), None, None, 1), ("p16", (0, 0), None, None, 0)],
        wmb, hmb, frame_num=2, n_ref=2, weights=wts2,
    )
    out2 = H.decode_gop([[sps, pps, idr0], [p1], [p2]])
    g2 = out2[2][:, :, 1]
    assert (g2[:, 0:16] == min(255, vA * 2)).all()  # ref1 weighted 2x
    assert (g2[:, 16:32] == vB).all()               # ref0 identity


def test_non_reference_pictures_never_enter_the_ref_list():
    """A disposable P (nal_ref_idc=0) decodes and is returned, but the
    NEXT P predicts from the last REFERENCE picture — an unconditional
    ref-list append would shift RefPicList0 and copy the disposable
    frame's pixels instead (ADVICE r11)."""
    wmb, hmb = 2, 1
    sps, pps, idr = H.encode_solid_gray_stream(wmb, hmb, 160, 26)
    vA = H.i16dc_recon_value(160, 26)
    # disposable P: intra DC bump on both MBs -> visibly different frame;
    # non-ref pictures share the upcoming frame_num (PrevRefFrameNum + 1)
    p_disp = H.encode_p_frame(
        [("i16", 2, [480] + [0] * 15, None)] * 2, wmb, hmb,
        frame_num=1, ref_idc=0,
    )
    # reference P: all-skip copy of ITS ref[0] — must be the IDR
    p_ref = H.encode_p_frame([("skip",)] * 2, wmb, hmb, frame_num=1)
    out = H.decode_gop([[sps, pps, idr], [p_disp], [p_ref]])
    assert all(o is not None for o in out)
    assert (out[1] != vA).any()           # disposable frame IS returned
    assert (out[2] == vA).all()           # skip copied the IDR, not p_disp


def test_frame_num_gap_degrades_to_null_not_wrong_pixels():
    """A frame_num discontinuity (7.4.3) poisons the chain to None rows
    until the next IDR instead of decoding off a misaligned list."""
    wmb, hmb = 2, 1
    sps, pps, idr = H.encode_solid_gray_stream(wmb, hmb, 160, 26)
    vA = H.i16dc_recon_value(160, 26)
    p1 = H.encode_p_frame([("skip",)] * 2, wmb, hmb, frame_num=1)
    p_gap = H.encode_p_frame([("skip",)] * 2, wmb, hmb, frame_num=3)
    p2 = H.encode_p_frame([("skip",)] * 2, wmb, hmb, frame_num=2)
    out = H.decode_gop(
        [[sps, pps, idr], [p1], [p_gap], [p2], [sps, pps, idr], [p1]]
    )
    assert out[0] is not None and out[1] is not None
    assert out[2] is None                 # the gapped unit
    assert out[3] is None                 # poisoned until the next IDR
    assert out[4] is not None and (out[5] == vA).all()  # IDR recovers


def test_non_ref_then_ref_same_frame_num_is_legal():
    """The in-order convention where consecutive non-reference pictures
    share (PrevRefFrameNum + 1): disposable fn=1 then reference fn=1
    both decode; the reference then bumps PrevRefFrameNum so fn=2 chains."""
    wmb, hmb = 2, 1
    sps, pps, idr = H.encode_solid_gray_stream(wmb, hmb, 160, 26)
    vA = H.i16dc_recon_value(160, 26)
    p_d = H.encode_p_frame([("skip",)] * 2, wmb, hmb, frame_num=1,
                           ref_idc=0)
    p_r = H.encode_p_frame([("skip",)] * 2, wmb, hmb, frame_num=1)
    p_2 = H.encode_p_frame([("skip",)] * 2, wmb, hmb, frame_num=2)
    out = H.decode_gop([[sps, pps, idr], [p_d], [p_r], [p_2]])
    assert all(o is not None for o in out)
    assert (out[3] == vA).all()


# ---------------------------------------------------------------------------
# CABAC (9.3) — engine invariants, raw-bin roundtrip, closed-form pixels,
# cross-entropy equality, refusals, mutation fuzz
# ---------------------------------------------------------------------------

def test_cabac_table_invariants():
    """Structural pins on the transcribed 9.3 tables: LPS range shrinks
    as the state's MPS probability grows (down each column), grows with
    the quantized range (across each row); the terminal state 63 row is
    (2,2,2,2); LPS transitions never increase the state by more than the
    spec's shape allows and end at the 63 absorber."""
    assert len(H._RANGE_LPS) == 64 and len(H._TRANS_LPS) == 64
    for s in range(63):  # 63 is the constant (2,2,2,2) absorber row
        row = H._RANGE_LPS[s]
        assert all(row[i] < row[i + 1] for i in range(3)), f"row {s}"
    for q in range(4):
        col = [H._RANGE_LPS[s][q] for s in range(63)]  # 63 excluded (=2)
        assert all(col[i] >= col[i + 1] for i in range(62)), f"col {q}"
    assert H._RANGE_LPS[63] == (2, 2, 2, 2)
    assert H._TRANS_LPS[63] == 63
    assert all(H._TRANS_LPS[s] <= s for s in range(63))  # LPS never climbs
    # context init: every (m, n) yields a legal state at every slice QP
    assert len(H._CTX_INIT_I) == 227
    for qp in (0, 10, 26, 40, 51):
        for idx, st in H._init_ctx_states(qp).items():
            assert 0 <= st[0] <= 63 and st[1] in (0, 1), (qp, idx)


def test_cabac_engine_raw_bin_roundtrip():
    """Encoder->decoder roundtrip of a random mixed sequence of context
    decisions, bypass bins, and non-final terminates — pins the
    arithmetic engines (renormalization, outstanding bits, flush)
    independently of any macroblock syntax."""
    import random

    rng = random.Random(42)
    ctxs = sorted(H._CTX_INIT_I)
    for trial in range(25):
        ops = []
        for _ in range(rng.randint(1, 400)):
            r = rng.random()
            if r < 0.6:
                ops.append(("d", rng.choice(ctxs), rng.randint(0, 1)))
            elif r < 0.9:
                ops.append(("b", None, rng.randint(0, 1)))
            else:
                ops.append(("t", None, 0))
        ops.append(("t", None, 1))
        qp = rng.randint(0, 51)
        w = H.BitWriter()
        enc = H.CabacEncoder(w, qp)
        for kind, ctx, bit in ops:
            if kind == "d":
                enc.decision(ctx, bit)
            elif kind == "b":
                enc.bypass(bit)
            else:
                enc.terminate(bit)
        data = w.tobytes()
        cd = H.CabacDecoder(H.BitReader(data), qp)
        for i, (kind, ctx, bit) in enumerate(ops):
            if kind == "d":
                got = cd.decision(ctx)
            elif kind == "b":
                got = cd.bypass()
            else:
                got = cd.decode_terminate()
            assert got == bit, f"trial {trial} op {i} ({kind}): {got} != {bit}"


def test_cabac_solid_gray_closed_form_and_deblock_noop():
    """CABAC I16 DC-propagation frame reproduces the closed-form pixel
    value; with the in-loop filter RUNNING (deblock_idc=0) the flat
    result must be untouched — same contract as the CAVLC twin."""
    wmb, hmb = 3, 2
    dc16 = [0] * 16
    dc16[0] = 160
    mbs = [("i16", 2, dc16, None)]
    mbs += [("i16", 2, [0] * 16, None)] * (wmb * hmb - 1)
    v = H.i16dc_recon_value(160, 26)
    for idc in (1, 0):
        sps, pps = H.encode_sps_pps(wmb, hmb, qp=26, cabac=True)
        idr = H.encode_i_frame_cabac(mbs, wmb, hmb, 26, deblock_idc=idc)
        out = H.decode_i_frame([sps, pps, idr])
        assert out.shape == (hmb * 16, wmb * 16, 3)
        assert (out[:, :, 1] == v).all(), f"deblock_idc={idc}"


def test_cabac_cross_entropy_pixel_equality():
    """Identical MB descriptors through the CAVLC and CABAC encoders must
    reconstruct IDENTICAL pixels (both feed the shared reconstruction) —
    randomized over i16/i4 mixes, chroma DC, multi-level residuals
    (incl. EG0-suffix magnitudes) and QPs, so the whole CABAC syntax
    layer (contexts, binarizations, significance maps) is pinned to the
    proven CAVLC layer."""
    import random

    rng = random.Random(7)
    wmb, hmb = 4, 3

    def pred_choices(m):
        x, y = m % wmb, m // wmb
        ch = [2]
        if y > 0:
            ch.append(0)
        if x > 0:
            ch.append(1)
        if x > 0 and y > 0:
            ch.append(3)
        return ch

    for trial in range(8):
        mbs = []
        for m in range(wmb * hmb):
            if rng.random() < 0.15:  # r13: I_PCM joins the parity mix
                mbs.append((
                    "pcm",
                    [[rng.randrange(256) for _ in range(16)]
                     for _ in range(16)],
                    [[rng.randrange(256) for _ in range(8)]
                     for _ in range(8)],
                    [[rng.randrange(256) for _ in range(8)]
                     for _ in range(8)],
                ))
            elif rng.random() < 0.4:
                dc = [0] * 16
                dc[0] = rng.randint(-300, 480)
                cdc = (
                    ([rng.randint(-40, 40) for _ in range(4)],
                     [rng.randint(-40, 40) for _ in range(4)])
                    if rng.random() < 0.5 else None
                )
                mbs.append(("i16", rng.choice(pred_choices(m)), dc, cdc))
            else:
                coeffs = []
                for _ in range(16):
                    if rng.random() < 0.5:
                        c = [0] * 16
                        for _ in range(rng.randint(1, 6)):
                            c[rng.randrange(16)] = rng.choice(
                                [1, -1, 2, -2, 3, 17, -40, 200, -512]
                            )
                        coeffs.append(c)
                    else:
                        coeffs.append(None)
                cdc = (
                    ([rng.randint(-30, 30) for _ in range(4)], [0] * 4)
                    if rng.random() < 0.4 else None
                )
                mbs.append(("i4", [2] * 16, coeffs, cdc))
        qp = rng.choice([20, 26, 28, 35, 44])
        sps_c, pps_c = H.encode_sps_pps(wmb, hmb, qp=qp, cabac=True)
        sps_v, pps_v = H.encode_sps_pps(wmb, hmb, qp=qp)
        out_c = H.decode_i_frame(
            [sps_c, pps_c, H.encode_i_frame_cabac(mbs, wmb, hmb, qp)]
        )
        out_v = H.decode_i_frame(
            [sps_v, pps_v, H.encode_i_frame(mbs, wmb, hmb, qp)]
        )
        assert (out_c == out_v).all(), f"trial {trial} diverged"


def test_cabac_refusal_p_slice():
    import pytest

    wmb, hmb = 2, 1
    # CABAC P slice: header parses, decode refuses (honest NULL upstream)
    sps, pps = H.encode_sps_pps(wmb, hmb, qp=26, cabac=True)
    idr_cavlc_p = H.encode_p_frame([("skip",)] * 2, wmb, hmb, frame_num=1)
    with pytest.raises(H.H264Error, match="CABAC inter slices"):
        H.decode_access_unit(
            [sps, pps, idr_cavlc_p], *H._seed_param_maps(None, None)[:2],
            [{"y": None, "cb": None, "cr": None}],
        )


def test_cabac_i_pcm_roundtrip_all_positions():
    """I_PCM inside CABAC slices (r13 — the former scope refusal): the
    terminate-bin signal, EncodeFlush, byte-aligned raw samples, and the
    mid-slice ENGINE re-initialization (contexts persisting, 9.3.1) must
    round-trip exact pixels with PCM first, mid, and last in the slice —
    and the MBs decoded AFTER a PCM block (by the re-initialized engine,
    with neighbor contexts that saw the PCM bookkeeping) must still be
    bit-exact."""
    import numpy as np

    rng = np.random.RandomState(31)
    wmb, hmb = 3, 1
    y = rng.randint(0, 256, (16, 16))
    cbp = rng.randint(0, 256, (8, 8))
    crp = rng.randint(0, 256, (8, 8))
    pcm = ("pcm", y, cbp, crp)
    dc = [0] * 16
    dc[0] = 240
    i16 = ("i16", 2, dc, None)
    i4 = ("i4", [2] * 16, [None] * 16, None)
    sps, pps = H.encode_sps_pps(wmb, hmb, qp=26, cabac=True)
    sps_v, pps_v = H.encode_sps_pps(wmb, hmb, qp=26)
    for mbs in ([pcm, i16, i4], [i16, pcm, i4], [i4, i16, pcm],
                [pcm, pcm, pcm]):
        out_c = H.decode_i_frame(
            [sps, pps, H.encode_i_frame_cabac(mbs, wmb, hmb, 26)]
        )
        # the PCM macroblock's pixels are EXACT
        for m, d in enumerate(mbs):
            if d[0] == "pcm":
                got_y = out_c[:16, m * 16 : m * 16 + 16]
                # RGB came from YCbCr of the exact samples; compare via
                # the CAVLC path instead (shared color conversion)
        # cross-entropy parity: CAVLC with the same descriptors is the
        # already-proven layer
        out_v = H.decode_i_frame(
            [sps_v, pps_v, H.encode_i_frame(mbs, wmb, hmb, 26)]
        )
        assert (out_c == out_v).all(), f"diverged for layout {mbs[0][0]}..."


def test_cabac_i_pcm_multi_slice_and_deblock():
    """PCM round-trips across slice boundaries and with deblocking ON
    (8.7: an I_PCM MB filters as QPy=0), still CAVLC-parity-exact."""
    import numpy as np

    rng = np.random.RandomState(32)
    wmb, hmb = 2, 2
    mk = lambda: ("pcm", rng.randint(0, 256, (16, 16)),
                  rng.randint(0, 256, (8, 8)), rng.randint(0, 256, (8, 8)))
    dc = [0] * 16
    dc[0] = 300
    mbs = [mk(), ("i16", 2, dc, None), mk(), ("i4", [2] * 16, [None] * 16, None)]
    for idc in (0, 1):
        sps, pps = H.encode_sps_pps(wmb, hmb, qp=26, cabac=True)
        sps_v, pps_v = H.encode_sps_pps(wmb, hmb, qp=26)
        out_c = H.decode_i_frame(
            [sps, pps] + H.encode_i_frame_cabac_slices(
                mbs, wmb, hmb, 26, slice_starts=(0, 2), deblock_idc=idc
            )
        )
        out_v = H.decode_i_frame(
            [sps_v, pps_v] + H.encode_i_frame_slices(
                mbs, wmb, hmb, 26, slice_starts=(0, 2), deblock_idc=idc
            )
        )
        assert (out_c == out_v).all(), f"deblock_idc {idc} diverged"


def test_cabac_mutation_fuzz_never_hangs_or_crashes():
    """Bit/byte mutations of a valid CABAC IDR stream must decode (the
    mutation landed somewhere harmless) or raise a DECODABLE error —
    never crash with an unexpected type and never loop (the engine's
    loops are all explicitly bounded)."""
    import random

    rng = random.Random(11)
    wmb, hmb = 3, 2
    coeffs = [[0] * 16 for _ in range(16)]
    coeffs[0][0] = 40
    coeffs[5][3] = -17
    mbs = [("i4", [2] * 16, coeffs, ([5, 0, 0, 0], [0] * 4))]
    mbs += [("i16", 2, [0] * 16, None)] * (wmb * hmb - 1)
    sps, pps = H.encode_sps_pps(wmb, hmb, qp=26, cabac=True)
    idr = H.encode_i_frame_cabac(mbs, wmb, hmb, 26)
    decoded = failed = 0
    for _ in range(300):
        mut = bytearray(idr)
        for _ in range(rng.randint(1, 3)):
            mut[rng.randrange(1, len(mut))] ^= 1 << rng.randrange(8)
        try:
            out = H.decode_i_frame([sps, pps, bytes(mut)])
            assert out.shape == (hmb * 16, wmb * 16, 3)
            decoded += 1
        except H.DECODABLE_ERRORS:
            failed += 1
    assert decoded + failed == 300
    # desync overwhelmingly surfaces as a raised syntax violation
    assert failed > 100


# ---------------------------------------------------------------------------
# r12 follow-up: the I16-AC (ctxBlockCat 1) and chroma-AC (cat 4) residual
# paths — previously decoder-only, now emitted by BOTH fixture encoders
# ---------------------------------------------------------------------------

def _independent_idct4x4(d):
    """Second transcription of the 8.5.12 inverse core transform, written
    from the butterfly equations (NOT from the module's idct4x4)."""
    import numpy as np

    d = np.asarray(d, np.int64)
    e = np.zeros((4, 4), np.int64)
    for i in range(4):  # rows
        a, b, c, f = d[i]
        e0, e1 = a + c, a - c
        e2, e3 = (b >> 1) - f, b + (f >> 1)
        e[i] = [e0 + e3, e1 + e2, e1 - e2, e0 - e3]
    out = np.zeros((4, 4), np.int64)
    for j in range(4):  # columns
        a, b, c, f = e[:, j]
        e0, e1 = a + c, a - c
        e2, e3 = (b >> 1) - f, b + (f >> 1)
        out[:, j] = [e0 + e3, e1 + e2, e1 - e2, e0 - e3]
    return out


def test_i16_ac_and_chroma_ac_match_independent_idct():
    """Single-MB I16 with ONE AC coefficient (luma) and one chroma-AC
    coefficient: decoder pixels must equal an independent dequant+IDCT
    computation, under BOTH entropy coders. Pins the cat-1/cat-4
    residual paths to ground truth, not just to each other."""
    import numpy as np

    qp = 26
    L = 9  # luma AC level at zigzag position 1 of block 0
    C = 7  # Cb AC level at zigzag position 1 of chroma block 0
    ac16 = [None] * 16
    ac16[0] = [L] + [0] * 14
    cac = [[[C] + [0] * 14, None, None, None], [None] * 4]
    mbs = [("i16", 2, [0] * 16, None, ac16, cac)]

    # independent expectation: zigzag pos 1 -> matrix (0,1), scale class
    # "other" (one odd index) -> V[26%6=2] value 16, shifted << 26//6=4
    # (the module keeps the full shift; the (x+32)>>6 rounding follows);
    # DC is zero here
    d = np.zeros((4, 4), np.int64)
    d[0, 1] = (L * 16) << 4
    res = (_independent_idct4x4(d) + 32) >> 6
    want_y = np.clip(128 + res, 0, 255)
    dch = np.zeros((4, 4), np.int64)
    dch[0, 1] = (C * 16) << 4  # chroma QP at qp_y 26, offset 0 -> 26
    cres = (_independent_idct4x4(dch) + 32) >> 6
    want_cb = np.clip(128 + cres, 0, 255)

    for cabac in (False, True):
        sps, pps = H.encode_sps_pps(1, 1, qp=qp, cabac=cabac)
        idr = (H.encode_i_frame_cabac(mbs, 1, 1, qp) if cabac
               else H.encode_i_frame(mbs, 1, 1, qp))
        fr = H.decode_access_unit([sps, pps, idr],
                                  *H._seed_param_maps(None, None), None)
        assert (fr.y[:4, :4] == want_y).all(), f"cabac={cabac} luma"
        assert (fr.y[4:, :] == 128).all() and (fr.y[:4, 4:] == 128).all()
        assert (fr.cb[:4, :4] == want_cb).all(), f"cabac={cabac} chroma"
        assert (fr.cr == 128).all()


def test_cross_entropy_equality_i16_ac_and_chroma_ac():
    """Randomized frames now including I16-with-AC and chroma-AC content
    (both fixture encoders emit them since r12): identical descriptors
    must reconstruct identical pixels under CAVLC and CABAC — covering
    ctxBlockCat 1 and 4 contexts, the i16 CAVLC nC bookkeeping, and the
    cbp_chroma=2 syntax on both entropy paths."""
    import random

    rng = random.Random(31)
    wmb, hmb = 4, 3

    def rand_cac():
        out = []
        for _comp in range(2):
            blks = []
            for _j in range(4):
                if rng.random() < 0.5:
                    c = [0] * 15
                    for _ in range(rng.randint(1, 4)):
                        c[rng.randrange(15)] = rng.choice([1, -1, 2, -5, 30])
                    blks.append(c)
                else:
                    blks.append(None)
            out.append(blks)
        return out

    for trial in range(6):
        mbs = []
        for m in range(wmb * hmb):
            x, y = m % wmb, m // wmb
            preds = ([2] + ([0] if y else []) + ([1] if x else [])
                     + ([3] if x and y else []))
            cdc = (
                ([rng.randint(-30, 30) for _ in range(4)],
                 [rng.randint(-30, 30) for _ in range(4)])
                if rng.random() < 0.6 else None
            )
            cac = rand_cac() if rng.random() < 0.5 else None
            if rng.random() < 0.5:
                dc = [rng.choice([0, 0, 0, 5, -9, 80]) for _ in range(16)]
                ac16 = None
                if rng.random() < 0.6:
                    ac16 = []
                    for _ in range(16):
                        if rng.random() < 0.5:
                            c = [0] * 15
                            for _ in range(rng.randint(1, 5)):
                                c[rng.randrange(15)] = rng.choice(
                                    [1, -1, 3, -20, 100])
                            ac16.append(c)
                        else:
                            ac16.append(None)
                mbs.append(("i16", rng.choice(preds), dc, cdc, ac16, cac))
            else:
                coeffs = []
                for _ in range(16):
                    if rng.random() < 0.5:
                        c = [0] * 16
                        for _ in range(rng.randint(1, 6)):
                            c[rng.randrange(16)] = rng.choice(
                                [1, -1, 2, -2, 17, -300])
                        coeffs.append(c)
                    else:
                        coeffs.append(None)
                mbs.append(("i4", [2] * 16, coeffs, cdc, cac))
        qp = rng.choice([20, 26, 30, 38])
        sps_c, pps_c = H.encode_sps_pps(wmb, hmb, qp=qp, cabac=True)
        sps_v, pps_v = H.encode_sps_pps(wmb, hmb, qp=qp)
        out_c = H.decode_i_frame(
            [sps_c, pps_c, H.encode_i_frame_cabac(mbs, wmb, hmb, qp)]
        )
        out_v = H.decode_i_frame(
            [sps_v, pps_v, H.encode_i_frame(mbs, wmb, hmb, qp)]
        )
        assert (out_c == out_v).all(), f"trial {trial} diverged"


def test_mb_qp_delta_nonzero_both_entropy_coders():
    """Per-MB qp_delta (previously decoder-only): a 3-MB frame at slice
    QP 26 with deltas [0, +4, -6] must dequantize MB k at its ACCUMULATED
    QP under both entropy coders — CAVLC se(v) and CABAC unary with the
    prev-delta-conditioned ctx 60/62/63 chain — and the values follow
    from the pinned closed form."""
    wmb, hmb = 3, 1
    qp = 26
    dc = [0] * 16
    dc[0] = 120
    # every MB carries its own DC residual so each has the qp_delta slot;
    # DC prediction chains left-to-right, so each value builds on the last
    mbs = [("i16", 2, list(dc), None),
           ("i16", 2, list(dc), None),
           ("i16", 2, list(dc), None)]
    deltas = [0, 4, -6]
    v0 = H.i16dc_recon_value(120, 26)
    v1 = min(255, v0 + (H.i16dc_recon_value(120, 30) - 128))
    v2 = min(255, v1 + (H.i16dc_recon_value(120, 24) - 128))
    for cabac in (False, True):
        sps, pps = H.encode_sps_pps(wmb, hmb, qp=qp, cabac=cabac)
        idr = (
            H.encode_i_frame_cabac(mbs, wmb, hmb, qp, qp_deltas=deltas)
            if cabac
            else H.encode_i_frame(mbs, wmb, hmb, qp, qp_deltas=deltas)
        )
        out = H.decode_i_frame([sps, pps, idr])
        g = out[:, :, 1]
        assert (g[:, 0:16] == v0).all(), f"cabac={cabac} mb0"
        assert (g[:, 16:32] == v1).all(), f"cabac={cabac} mb1"
        assert (g[:, 32:48] == v2).all(), f"cabac={cabac} mb2"


def test_mb_qp_delta_random_cross_entropy_and_prev_ctx():
    """Randomized qp_deltas (incl. an uncoded MB between two coded ones,
    which resets the CABAC prev-delta context to 0 exactly as the
    decoder infers delta=0): CAVLC and CABAC pixels stay identical."""
    import random

    rng = random.Random(5)
    wmb, hmb = 4, 2
    for trial in range(5):
        mbs, deltas = [], []
        for m in range(wmb * hmb):
            if rng.random() < 0.25:
                # uncoded I_4x4: no residual, no qp_delta slot
                mbs.append(("i4", [2] * 16, [None] * 16, None))
                deltas.append(0)
            else:
                dc = [0] * 16
                dc[0] = rng.randint(-200, 400)
                mbs.append(("i16", 2, dc, None))
                deltas.append(rng.randint(-5, 5))
        qp = rng.choice([22, 26, 32])
        sps_c, pps_c = H.encode_sps_pps(wmb, hmb, qp=qp, cabac=True)
        sps_v, pps_v = H.encode_sps_pps(wmb, hmb, qp=qp)
        out_c = H.decode_i_frame(
            [sps_c, pps_c,
             H.encode_i_frame_cabac(mbs, wmb, hmb, qp, qp_deltas=deltas)]
        )
        out_v = H.decode_i_frame(
            [sps_v, pps_v,
             H.encode_i_frame(mbs, wmb, hmb, qp, qp_deltas=deltas)]
        )
        assert (out_c == out_v).all(), f"trial {trial} diverged"


def test_cabac_multi_slice_matches_cavlc_at_same_slice_structure():
    """CABAC state (contexts + arithmetic engine) initializes fresh per
    slice and cross-slice neighbors are UNAVAILABLE for every context
    increment (same-slice rule). Slice boundaries legitimately CHANGE
    pixels (prediction availability resets), so the pinned property is
    cross-entropy: for every slice split, the CABAC decode must equal
    the CAVLC decode of the SAME split — and the splits must genuinely
    differ from the 1-slice result (the boundary reset is exercised,
    not vacuous)."""
    wmb, hmb = 2, 2
    dc = [0] * 16
    dc[0] = 200
    coeffs = [[0] * 16 for _ in range(16)]
    coeffs[3][2] = 25
    mbs = [("i16", 2, dc, None),
           ("i4", [2] * 16, coeffs, ([7, 0, 0, 0], [0] * 4)),
           ("i16", 2, [0] * 16, None),
           ("i4", [2] * 16, [None] * 16, None)]
    sps_c, pps_c = H.encode_sps_pps(wmb, hmb, qp=26, cabac=True)
    sps_v, pps_v = H.encode_sps_pps(wmb, hmb, qp=26)
    one = H.decode_i_frame(
        [sps_c, pps_c, H.encode_i_frame_cabac(mbs, wmb, hmb, 26)]
    )
    diverged_from_one = 0
    for starts in ((0, 2), (0, 1), (0, 3), (0, 1, 2, 3)):
        nals_c = H.encode_i_frame_cabac_slices(
            mbs, wmb, hmb, 26, slice_starts=starts
        )
        nals_v = H.encode_i_frame_slices(
            mbs, wmb, hmb, 26, slice_starts=starts
        )
        assert len(nals_c) == len(starts)
        out_c = H.decode_i_frame([sps_c, pps_c, *nals_c])
        out_v = H.decode_i_frame([sps_v, pps_v, *nals_v])
        assert (out_c == out_v).all(), f"slice split {starts} diverged"
        if (out_c != one).any():
            diverged_from_one += 1
    assert diverged_from_one >= 1  # boundary resets actually exercised


def test_decode_frames_cabac_i_pcm_mp4(spark):
    """An avc1 MP4 whose CABAC IDR frames mix I_PCM and coded macroblocks
    decodes through the full Spark decode_frames surface with EXACT
    pixel sums — the r13 I_PCM-in-CABAC capability exercised end-to-end,
    not just at the slice-codec level."""
    import numpy as np
    import pandas as pd

    from engine_spark.datapipe.multimodal import decode_frames, encode_mp4

    rng = np.random.RandomState(77)
    wmb, hmb = 2, 1
    sps, pps = H.encode_sps_pps(wmb, hmb, qp=26, cabac=True)
    avcc = H.build_avcc(sps, pps)
    ext = (len(avcc) + 8).to_bytes(4, "big") + b"avcC" + avcc

    samples, exp_sums = [], []
    for fi in range(3):
        y = rng.randint(0, 256, (16, 16))
        cbp = rng.randint(0, 256, (8, 8))
        crp = rng.randint(0, 256, (8, 8))
        dc = [0] * 16
        dc[0] = 120 + 60 * fi
        mbs = [("pcm", y, cbp, crp), ("i16", 2, dc, None)]
        if fi == 2:
            mbs = mbs[::-1]  # PCM last in one frame
        idr = H.encode_i_frame_cabac(mbs, wmb, hmb, 26)
        samples.append(len(idr).to_bytes(4, "big") + idr)
        # expected RGB sum from the (shared, proven) CAVLC decode of the
        # identical descriptors
        sps_v, pps_v = H.encode_sps_pps(wmb, hmb, qp=26)
        exp_sums.append(int(H.decode_i_frame(
            [sps_v, pps_v, H.encode_i_frame(mbs, wmb, hmb, 26)]
        ).sum(dtype="int64")))

    mp4 = encode_mp4(samples, codec=b"avc1", sample_entry_ext=ext,
                     width=wmb * 16, height=hmb * 16)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7], "payload": [mp4]})
    )
    rows = decode_frames(df, 1).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in rows] == [0, 1, 2]
    assert all(r["width"] == 32 and r["height"] == 16 for r in rows)
    assert [r["pix_sum"] for r in rows] == exp_sums


# ---------------------------------------------------------------------------
# B slices (CAVLC): one/two-list 16x16 prediction, POC-split default lists
# ---------------------------------------------------------------------------

def _b_gray_mbs(dc):
    dc16 = [0] * 16
    dc16[0] = dc
    return [("i16", 2, dc16, None)]


def _b_stream_parts(qp=26, dc_i=80, dc_p=160):
    """(sps, pps, idr@poc0, intra-P@poc4) — the B sandwich fixture: two
    flat reference pictures of different values."""
    from engine_spark.datapipe import h264 as H

    sps, pps = H.encode_sps_pps(1, 1, qp=qp, poc_type=0, max_refs=2,
                                profile_idc=77)
    idr = H.encode_i_frame(_b_gray_mbs(dc_i), 1, 1, qp, poc_lsb=0)
    pfr = H.encode_p_frame(_b_gray_mbs(dc_p), 1, 1, qp, frame_num=1,
                           poc_lsb=4)
    return sps, pps, idr, pfr


def test_b_slice_one_and_two_list_prediction():
    """B_L0 predicts the past (IDR), B_L1 the future (P), B_Bi their
    rounded average — the 8.2.4.2.3 POC-split default lists and the
    8.4.2.3.2 default bi-predictive combine, end to end."""
    from engine_spark.datapipe import h264 as H

    sps, pps, idr, pfr = _b_stream_parts()
    v_i, v_p = 132, 136  # i16dc_recon values for dc 80 / 160 at qp 26
    for desc, want in (
        (("bl0", (0, 0), None, None), v_i),
        (("bl1", (0, 0), None, None), v_p),
        (("bbi", (0, 0), (0, 0), None, None), (v_i + v_p + 1) >> 1),
    ):
        b = H.encode_b_frame([desc], 1, 1, 26, frame_num=2, poc_lsb=2)
        frames = H.decode_gop([[sps, pps, idr], [pfr], [b]])
        assert frames[2] is not None
        y = frames[2][..., 0]
        assert (y == want).all(), (desc[0], y[0, 0], want)


def test_b_slice_quarter_pel_and_intra_mb():
    """Fractional MVs on flat references are value-preserving through the
    6-tap chain in BOTH lists of a bi-predicted MB; an intra I_16x16 MB
    (mb_type offset 23) decodes inside the B slice."""
    from engine_spark.datapipe import h264 as H

    sps, pps, idr, pfr = _b_stream_parts()
    b = H.encode_b_frame(
        [("bbi", (5, 7), (-3, 2), None, None)], 1, 1, 26,
        frame_num=2, poc_lsb=2,
    )
    frames = H.decode_gop([[sps, pps, idr], [pfr], [b]])
    assert (frames[2][..., 0] == 134).all()  # flat refs: interp exact

    b_intra = H.encode_b_frame(_b_gray_mbs(40), 1, 1, 26,
                               frame_num=2, poc_lsb=2)
    frames = H.decode_gop([[sps, pps, idr], [pfr], [b_intra]])
    assert frames[2] is not None
    assert (frames[2][..., 0] == frames[2][0, 0, 0]).all()


def test_b_frame_is_disposable_and_does_not_enter_ref_lists():
    """A non-reference B (nal_ref_idc 0) must NOT shift RefPicList0: a
    following all-skip P copies the last REFERENCE picture (the intra-P),
    not the B."""
    from engine_spark.datapipe import h264 as H

    sps, pps, idr, pfr = _b_stream_parts()
    b = H.encode_b_frame([("bl0", (0, 0), None, None)], 1, 1, 26,
                         frame_num=2, poc_lsb=2)  # decodes to 132
    p2 = H.encode_p_frame([("skip",)], 1, 1, 26, frame_num=2, poc_lsb=8)
    frames = H.decode_gop([[sps, pps, idr], [pfr], [b], [p2]])
    assert (frames[3][..., 0] == 136).all()  # copies the P, not the B


def test_b_slice_refusals_degrade_to_none():
    """Out-of-scope B tools refuse loudly: B_Direct_16x16, B_Skip runs,
    deblocking-enabled B slices, weighted bi-prediction, and B without
    POC (poc_type 2 SPS)."""
    from engine_spark.datapipe import h264 as H

    sps, pps, idr, pfr = _b_stream_parts()

    def b_with(patch):
        w = H.BitWriter()
        w.ue(0); w.ue(6); w.ue(0)
        w.u(2, 4); w.u(2, 8)
        patch(w)
        w.rbsp_trailing()
        return H._nal(1, w.tobytes(), ref_idc=0)

    # B_Direct_16x16 (mb_type 0 after header)
    def direct(w):
        w.u(0, 1); w.u(0, 1); w.u(0, 1); w.u(0, 1)
        w.se(0); w.ue(1)
        w.ue(0)  # skip_run 0
        w.ue(0)  # mb_type 0 = B_Direct_16x16
    # B_Skip via a nonzero run
    def skiprun(w):
        w.u(0, 1); w.u(0, 1); w.u(0, 1); w.u(0, 1)
        w.se(0); w.ue(1)
        w.ue(1)  # skip_run 1 -> B_Skip
    # deblocking enabled in a B slice
    def deblock(w):
        w.u(0, 1); w.u(0, 1); w.u(0, 1); w.u(0, 1)
        w.se(0); w.ue(0); w.se(0); w.se(0)
        w.ue(0); w.ue(1)

    for patch in (direct, skiprun, deblock):
        frames = H.decode_gop([[sps, pps, idr], [pfr], [b_with(patch)]])
        assert frames[2] is None, patch.__name__

    # B under a poc_type-2 SPS refuses (no POC to split the lists on)
    sps2, pps2 = H.encode_sps_pps(1, 1, qp=26)
    idr2 = H.encode_i_frame(_b_gray_mbs(80), 1, 1, 26)
    p2 = H.encode_p_frame(_b_gray_mbs(160), 1, 1, 26, frame_num=1)
    b2 = H.encode_b_frame([("bl0", (0, 0), None, None)], 1, 1, 26,
                          frame_num=2, poc_lsb=2)
    frames = H.decode_gop([[sps2, pps2, idr2], [p2], [b2]])
    assert frames[2] is None


def test_b_slice_multi_mb_per_list_mv_prediction():
    """A 2x1 B frame whose second MB's per-list MV predictors come from
    the first B MB's motion (the list-separated 8.4.1.3 neighbor state):
    round-trips bit-exactly because encoder and decoder share _mv_pred."""
    from engine_spark.datapipe import h264 as H

    sps, pps, idr, pfr = _b_stream_parts_2x1()
    b = H.encode_b_frame(
        [("bbi", (4, 0), (-4, 4), None, None),
         ("bbi", (8, -4), (0, 8), None, None)],
        2, 1, 26, frame_num=2, poc_lsb=2,
    )
    frames = H.decode_gop([[sps, pps, idr], [pfr], [b]])
    assert frames[2] is not None
    assert (frames[2][..., 0] == 134).all()


def _b_stream_parts_2x1(qp=26):
    from engine_spark.datapipe import h264 as H

    sps, pps = H.encode_sps_pps(2, 1, qp=qp, poc_type=0, max_refs=2,
                                profile_idc=77)
    def mbs(dc):
        dc16 = [0] * 16
        dc16[0] = dc
        return [("i16", 2, dc16, None), ("i16", 2, [0] * 16, None)]
    idr = H.encode_i_frame(mbs(80), 2, 1, qp, poc_lsb=0)
    pfr = H.encode_p_frame(mbs(160), 2, 1, qp, frame_num=1, poc_lsb=4)
    return sps, pps, idr, pfr


def test_b_slice_two_past_refs_ref_idx_selection():
    """n_ref0=2: ref_idx_l0 te(v) picks between the two past reference
    pictures (L0 order: POC descending — idx 0 = the NEARER past)."""
    from engine_spark.datapipe import h264 as H

    sps, pps = H.encode_sps_pps(1, 1, qp=26, poc_type=0, max_refs=3,
                                profile_idc=77)
    idr = H.encode_i_frame(_b_gray_mbs(80), 1, 1, 26, poc_lsb=0)    # 132
    p1 = H.encode_p_frame(_b_gray_mbs(160), 1, 1, 26, frame_num=1,
                          poc_lsb=2)                                 # 136
    p2 = H.encode_p_frame(_b_gray_mbs(240), 1, 1, 26, frame_num=2,
                          poc_lsb=8)                                 # 141
    for ri, want in ((0, 136), (1, 132)):  # POC desc: p1 then idr
        b = H.encode_b_frame([("bl0", (0, 0), None, None, ri)], 1, 1, 26,
                             frame_num=3, poc_lsb=4, n_ref0=2)
        frames = H.decode_gop([[sps, pps, idr], [p1], [p2], [b]])
        assert frames[3] is not None
        assert (frames[3][..., 0] == want).all(), (ri, frames[3][0, 0, 0])


def test_decode_frames_b_chain_through_mp4(spark):
    """decode_frames over an avc1 MP4 whose GOP is IDR + intra-P + B:
    the sampled B frame chains through the unsampled P reference, builds
    POC-split lists from the multimodal chain state, and bi-predicts;
    a SECOND GOP after it re-anchors cleanly (the B never poisoned or
    entered the reference list)."""
    from engine_spark.datapipe.multimodal import decode_frames, encode_mp4

    sps, pps, idr, pfr = _b_stream_parts()          # 132 / 136 flat
    b = H.encode_b_frame([("bbi", (2, -2), (0, 3), None, None)],
                         1, 1, 26, frame_num=2, poc_lsb=2)
    avcc = H.build_avcc(sps, pps)
    ext = (len(avcc) + 8).to_bytes(4, "big") + b"avcC" + avcc

    def sample(nal):
        return len(nal).to_bytes(4, "big") + nal

    mp4 = encode_mp4(
        [sample(idr), sample(pfr), sample(b), sample(idr)],
        codec=b"avc1", sample_entry_ext=ext,
    )
    docs = spark.createDataFrame(
        [(1, bytearray(mp4))], "doc_id long, payload binary"
    )
    rows = {r["frame_idx"]: r for r in decode_frames(docs, 1).collect()}
    assert len(rows) == 4
    w = h = 16
    assert rows[0]["pix_sum"] == 3 * 132 * w * h
    assert rows[1]["pix_sum"] == 3 * 136 * w * h
    assert rows[2]["pix_sum"] == 3 * 134 * w * h   # (132+136+1)>>1
    assert rows[3]["pix_sum"] == 3 * 132 * w * h   # re-anchored IDR


def test_b_partitioned_mixed_mode_16x8_and_8x16():
    """16x8 / 8x16 B partitions with per-partition prediction modes
    (Table 7-14 rows 4-21): an L0-top/L1-bottom 16x8 MB shows the IDR
    value in its top half and the P value in the bottom; an
    Bi-left/L0-right 8x16 shows the average left and the IDR value
    right. Per-list directional mvp shortcuts round-trip."""
    import numpy as np

    from engine_spark.datapipe import h264 as H

    sps, pps, idr, pfr = _b_stream_parts()    # flat 132 / 136
    v_i, v_p, v_bi = 132, 136, 134

    b = H.encode_b_frame(
        [("b16x8", [("l0", (2, -1), None), ("l1", None, (-1, 3))],
          None, None)],
        1, 1, 26, frame_num=2, poc_lsb=2,
    )
    frames = H.decode_gop([[sps, pps, idr], [pfr], [b]])
    y = frames[2][..., 0]
    assert (y[:8, :] == v_i).all() and (y[8:, :] == v_p).all()

    b2 = H.encode_b_frame(
        [("b8x16", [("bi", (1, 1), (-2, 0)), ("l0", (4, -4), None)],
          None, None)],
        1, 1, 26, frame_num=2, poc_lsb=2,
    )
    frames = H.decode_gop([[sps, pps, idr], [pfr], [b2]])
    y = frames[2][..., 0]
    assert (y[:, :8] == v_bi).all() and (y[:, 8:] == v_i).all()

    # every two-partition type round-trips on the flat sandwich
    want = {"l0": v_i, "l1": v_p, "bi": v_bi}
    for btype, (shape, modes) in H._B_MB_TYPES.items():
        if shape == "16x16":
            continue
        kind = "b16x8" if shape == "16x8" else "b8x16"
        specs = [
            (m,
             (1, -1) if m in ("l0", "bi") else None,
             (-1, 2) if m in ("l1", "bi") else None)
            for m in modes
        ]
        b3 = H.encode_b_frame([(kind, specs, None, None)], 1, 1, 26,
                              frame_num=2, poc_lsb=2)
        frames = H.decode_gop([[sps, pps, idr], [pfr], [b3]])
        assert frames[2] is not None, btype
        y = frames[2][..., 0]
        if shape == "16x8":
            regions = [y[:8, :], y[8:, :]]
        else:
            regions = [y[:, :8], y[:, 8:]]
        for region, m in zip(regions, modes):
            assert (region == want[m]).all(), (btype, m)


# ---------------------------------------------------------------------------
# r13 optimization internals: window-scan exp-golomb and the deblock
# uniform-motion whole-frame skip (bit-exactness guards for the rewrites)
# ---------------------------------------------------------------------------


def _ue_per_bit_reference(r: "H.BitReader") -> int:
    """The original per-bit ue() loop, kept as the semantic reference for
    the windowed zeros_then_one scan (values AND error messages)."""
    zeros = 0
    while r.u(1) == 0:
        zeros += 1
        if zeros > 32:
            raise H.H264Error("bad exp-golomb code")
    return (1 << zeros) - 1 + (r.u(zeros) if zeros else 0)


def test_zeros_then_one_matches_per_bit_ue_reference():
    rng = random.Random(20261)
    for _ in range(1500):
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 11)))
        skew = rng.randrange(0, 8)
        ra, rb = H.BitReader(data), H.BitReader(data)
        if skew:
            ra.u(skew), rb.u(skew)
        va = vb = ea = eb = None
        try:
            va = _ue_per_bit_reference(ra)
        except H.H264Error as e:
            ea = str(e)
        try:
            vb = rb.ue()
        except H.H264Error as e:
            eb = str(e)
        assert va == vb and ea == eb, (data.hex(), skew, va, vb, ea, eb)
        if ea is None:
            assert ra.pos == rb.pos, (data.hex(), skew)


def test_zeros_then_one_error_order_on_zero_runs():
    # all-zero streams: the per-bit loop raises 'bad exp-golomb code' once
    # 33 zeros were READ, 'bitstream truncated' when the stream ends first
    for pad in range(1, 10):
        r = H.BitReader(bytes(pad))
        with pytest.raises(H.H264Error) as ei:
            r.ue()
        want = "bad exp-golomb code" if pad * 8 > 32 else "bitstream truncated"
        assert str(ei.value) == want, (pad, str(ei.value))
    # a 1-bit exactly at the cap boundary still decodes
    data = bytes([0, 0, 0, 0, 0x80, 0, 0, 0, 0x80])  # 32 zeros, 1, 32 value bits
    r = H.BitReader(data)
    assert r.ue() == (1 << 32) - 1 + 1
    # level_prefix cap (31) errors one bit earlier than ue's
    r31 = H.BitReader(bytes(5))  # 40 zero bits > 31
    with pytest.raises(H.H264Error, match="bad level_prefix"):
        r31.zeros_then_one(31, "bad level_prefix")


def _frame_bs_any(fr) -> bool:
    """Brute-force: does ANY 4-sample edge of the frame have bs > 0,
    per the public _edge_bs rules (the filter's ground truth)?"""
    hb, wb = fr.blk_ref.shape
    for by in range(hb):
        for bx in range(1, wb):
            if H._edge_bs(fr, bx - 1, by, bx, by, mb_edge=(bx % 4 == 0)):
                return True
    for by in range(1, hb):
        for bx in range(wb):
            if H._edge_bs(fr, bx, by - 1, bx, by, mb_edge=(by % 4 == 0)):
                return True
    return False


def test_deblock_skip_condition_matches_bruteforce_bs():
    # P frames: all-skip (uniform inherited mv, no residuals) must have
    # zero bs everywhere; a frame with differing mvs must not
    sps, pps, idr = H.encode_solid_gray_stream(2, 2, 370, 26)
    sd = H.parse_sps(H.rbsp_unescape(sps[1:]))
    pd = H.parse_pps(H.rbsp_unescape(pps[1:]))
    sps_map, pps_map = H._seed_param_maps(sd, pd)
    fr0 = H.decode_access_unit([idr], sps_map, pps_map, None)
    refs = [{"y": fr0.y, "cb": fr0.cb, "cr": fr0.cr, "poc": fr0.poc}]

    p_skip = H.encode_p_frame([("skip",)] * 4, 2, 2, frame_num=1)
    fr1 = H.decode_access_unit([p_skip], sps_map, pps_map, refs)
    assert not _frame_bs_any(fr1)  # the whole-frame skip fires legally

    p_mixed = H.encode_p_frame(
        [("p16", (8, 0), None, None), ("p16", (0, 0), None, None),
         ("skip",), ("skip",)], 2, 2, frame_num=1)
    fr2 = H.decode_access_unit([p_mixed], sps_map, pps_map, refs)
    assert _frame_bs_any(fr2)  # >= 1-pel mv difference => bs 1 edges exist

    # intra frames always carry bs >= 3 edges: skip must never fire
    assert _frame_bs_any(fr0)


# ---------------------------------------------------------------------------
# r13 optimization internals, session 4: allocation templates, fused CABAC
# state, encoder bit batching, parameter-set memos
# ---------------------------------------------------------------------------


def test_frame_template_isolation():
    """_Frame's template-copied arrays must be fresh per frame: mutating
    one frame can never leak into another frame or the cached template."""
    sps = {"width_mbs": 2, "height_mbs": 2}
    a, b = H._Frame(sps), H._Frame(sps)
    a.cb[:] = 7
    a.blk_slice[:] = 3
    a.blk_ref[:] = 5
    a.mb_deblock[:] = 0
    assert (b.cb == 128).all()
    assert (b.blk_slice == -1).all()
    assert (b.blk_ref == -2).all()
    assert (b.mb_deblock == 1).all()
    c = H._Frame(sps)  # template itself untouched
    assert (c.cb == 128).all() and (c.blk_ref == -2).all()


def test_write_level_matches_per_bit_reference():
    """The fused prefix+suffix writes of _write_level must emit the exact
    bit sequence of the original one-write-per-field form."""

    def reference_bits(level_code: int, suffix_len: int) -> list[int]:
        w = H.BitWriter()
        if suffix_len == 0:
            if level_code < 14:
                w.u(1, level_code + 1)
                return w.bits
            if level_code < 30:
                w.u(1, 15)
                w.u(level_code - 14, 4)
                return w.bits
            adjusted = level_code - 30
        else:
            prefix = level_code >> suffix_len
            if prefix < 15:
                w.u(1, prefix + 1)
                w.u(level_code & ((1 << suffix_len) - 1), suffix_len)
                return w.bits
            adjusted = level_code - (15 << suffix_len)
        for p in range(15, 32):
            size = p - 3
            base = ((1 << size) - 4096) if p >= 16 else 0
            if base <= adjusted < base + (1 << size):
                w.u(1, p + 1)
                w.u(adjusted - base, size)
                return w.bits
        raise AssertionError("unencodable")

    rng = random.Random(4417)
    cases = [(lc, sl) for sl in range(0, 7) for lc in range(0, 40)]
    cases += [(rng.randrange(0, 1 << 14), rng.randrange(0, 7))
              for _ in range(300)]
    for lc, sl in cases:
        w = H.BitWriter()
        try:
            H._write_level(w, lc, sl)
        except H.H264Error:
            continue
        assert w.bits == reference_bits(lc, sl), (lc, sl)


def test_cabac_encoder_bit_accumulator_golden_roundtrip():
    """The encoder's buffered bit output must round-trip through the
    decoder bin-for-bin, across decision/bypass contexts and multi-slice
    terminate flushes (exercises the >=64-bit accumulator flush)."""
    rng = random.Random(9217)
    for trial in range(25):
        bins = [(rng.choice(("d", "b")),
                 rng.randrange(60, 70),
                 rng.randrange(2))
                for _ in range(rng.randrange(50, 400))]
        w = H.BitWriter()
        enc = H.CabacEncoder(w, 26)
        for kind, ctx, bit in bins:
            if kind == "d":
                enc.decision(ctx, bit)
            else:
                enc.bypass(bit)
            enc.terminate(0)
        enc.terminate(1)
        data = w.tobytes()
        dec = H.CabacDecoder(H.BitReader(data), 26)
        for kind, ctx, bit in bins:
            got = dec.decision(ctx) if kind == "d" else dec.bypass()
            assert got == bit, trial
            assert dec.decode_terminate() == 0
        assert dec.decode_terminate() == 1


def test_fused_ctx_state_matches_init_tables():
    """The fused (pState<<1)|valMPS byte array must agree with the
    documented _init_ctx_states view for every context and QP."""
    for qp in (0, 10, 26, 40, 51):
        fused = H._ctx_state_fused(qp)
        for idx, (s, v) in H._init_ctx_states(qp).items():
            assert fused[idx] == (s << 1) | v, (qp, idx)


def test_parse_avcc_memo_returns_unaliased_maps():
    sps, pps = H.encode_sps_pps(2, 2, qp=26)
    avcc = H.build_avcc(sps, pps)
    a = H.parse_avcc(avcc)
    b = H.parse_avcc(avcc)
    assert a["sps_by_id"] == b["sps_by_id"]
    a["sps_by_id"][99] = {"bogus": True}  # in-band-update simulation
    c = H.parse_avcc(avcc)
    assert 99 not in c["sps_by_id"]
    assert c["nal_length_size"] == 4


def test_encode_sps_pps_memo_stable():
    a = H.encode_sps_pps(1, 3, crop_right=2, qp=26, cabac=True)
    b = H.encode_sps_pps(1, 3, crop_right=2, qp=26, cabac=True)
    assert a == b
    c = H.encode_sps_pps(1, 3, crop_right=2, qp=27, cabac=True)
    assert c != a
