"""Driver-side cProfile of the h264 gate kernels (synth + decode).

Replicates each gate's per-doc payload build and runs decode_frames'
pandas-level function directly (extracted via a stub DF), so the profile
sees the exact executor-side Python work with zero Spark overhead.

Usage: python tools/profile_h264.py [gate] [n_docs]
       gate in {base, gop, b, cabac, all}; default all, 300 docs.
"""

from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time

import numpy as np
import pandas as pd

from engine_spark.datapipe import h264 as H
from engine_spark.datapipe.multimodal import decode_frames, encode_mp4


class _StubDF:
    def mapInPandas(self, fn, schema):
        return fn


DECODE_RUN = decode_frames(_StubDF(), 2)


def synth_base(did: int):
    wmb, hmb = did % 2 + 1, did % 3 + 1
    crop_r = 2 if did % 5 == 0 else 0
    w, h = wmb * 16 - crop_r, hmb * 16
    n = did % 3 + 2
    sps, pps = H.encode_sps_pps(wmb, hmb, crop_right=crop_r, qp=26)
    samples = []
    for fi in range(n):
        mode = (did + fi) % 3
        if mode == 0:
            v = did % 236 + 10
            mbs = [("pcm", np.full((16, 16), v, np.int64),
                    np.full((8, 8), 128, np.int64),
                    np.full((8, 8), 128, np.int64))] * (wmb * hmb)
            idr = H.encode_i_frame(mbs, wmb, hmb, 26)
        elif mode == 1:
            dc_lvl = ((did * 7 + fi * 11) % 40) * 37
            _, _, idr = H.encode_solid_gray_stream(
                wmb, hmb, dc_lvl, 26, crop_right=crop_r,
                deblock_idc=0 if did % 2 == 0 else 1)
        else:
            base = did % 100 + 30
            grad = np.empty((hmb * 16, wmb * 16), np.int64)
            grad[:, :] = base + (np.arange(wmb * 16) % 8)
            mbs = []
            for my in range(hmb):
                for mx in range(wmb):
                    mbs.append(("pcm",
                                grad[my * 16: my * 16 + 16,
                                     mx * 16: mx * 16 + 16],
                                np.full((8, 8), 128, np.int64),
                                np.full((8, 8), 128, np.int64)))
            idr = H.encode_i_frame(mbs, wmb, hmb, 26)
        samples.append(len(idr).to_bytes(4, "big") + idr)
    avcc = H.build_avcc(sps, pps)
    ext = (len(avcc) + 8).to_bytes(4, "big") + b"avcC" + avcc
    return encode_mp4(samples, codec=b"avc1", sample_entry_ext=ext,
                      width=w, height=h)


def synth_gop(did: int):
    wmb = hmb = did % 2 + 1
    n_mb = wmb * hmb
    variant = did % 3
    deblock = 0 if variant < 2 else 1
    sps, pps, idr = H.encode_solid_gray_stream(
        wmb, hmb, (did % 40) * 37, 26, deblock_idc=deblock)
    p1 = H.encode_p_frame([("skip",)] * n_mb, wmb, hmb,
                          frame_num=1, deblock_idc=deblock)
    if variant == 0:
        descs = [("skip",)] * n_mb
    elif variant == 1:
        mv = ((did % 13) - 6, (did % 9) - 4)
        descs = [("p16", mv, None, None)] * n_mb
    else:
        descs = ([("i16", 2, [(did % 29) * 41] + [0] * 15, None)]
                 + [("skip",)] * (n_mb - 1))
    p2 = H.encode_p_frame(descs, wmb, hmb, frame_num=2, deblock_idc=deblock)
    avcc = H.build_avcc(sps, pps)
    ext = (len(avcc) + 8).to_bytes(4, "big") + b"avcC" + avcc
    samples = [len(nal).to_bytes(4, "big") + nal for nal in (idr, p1, p2)]
    return encode_mp4(samples, codec=b"avc1", sample_entry_ext=ext,
                      width=wmb * 16, height=hmb * 16)


def synth_b(did: int):
    wmb = hmb = did % 2 + 1
    n_mb = wmb * hmb
    variant = did % 3

    def gray(dc):
        first = [0] * 16
        first[0] = dc
        return ([("i16", 2, first, None)]
                + [("i16", 2, [0] * 16, None)] * (n_mb - 1))

    sps, pps = H.encode_sps_pps(wmb, hmb, qp=26, poc_type=0, max_refs=2,
                                profile_idc=77)
    idr = H.encode_i_frame(gray((did % 40) * 37), wmb, hmb, 26, poc_lsb=0)
    pfr = H.encode_p_frame(gray((did % 29) * 41), wmb, hmb, 26,
                           frame_num=1, poc_lsb=4)
    mv0 = ((did % 13) - 6, (did % 9) - 4)
    mv1 = ((did % 11) - 5, (did % 7) - 3)
    if variant == 0:
        descs = [("bbi", mv0, mv1, None, None)] * n_mb
    elif variant == 1:
        descs = [("bl0", mv0, None, None)] * n_mb
    else:
        dc3 = [0] * 16
        dc3[0] = (did % 23) * 43
        descs = ([("i16", 2, dc3, None)]
                 + [("bl1", (0, 0), None, None)] * (n_mb - 1))
    b = H.encode_b_frame(descs, wmb, hmb, 26, frame_num=2, poc_lsb=2)
    avcc = H.build_avcc(sps, pps)
    ext = (len(avcc) + 8).to_bytes(4, "big") + b"avcC" + avcc
    samples = [len(nal).to_bytes(4, "big") + nal for nal in (idr, pfr, b)]
    return encode_mp4(samples, codec=b"avc1", sample_entry_ext=ext,
                      width=wmb * 16, height=hmb * 16)


def synth_cabac(did: int):
    wmb, hmb = did % 2 + 1, did % 3 + 1
    crop_r = 2 if did % 5 == 0 else 0
    w, h = wmb * 16 - crop_r, hmb * 16
    n = did % 3 + 2
    sps, pps = H.encode_sps_pps(wmb, hmb, crop_right=crop_r, qp=26, cabac=True)
    samples = []
    for fi in range(n):
        mode = (did + fi) % 3
        deblock = 0 if (did + mode) % 2 == 0 else 1
        if mode == 1:
            mbs = [("i4", [2] * 16, [None] * 16, None)] * (wmb * hmb)
            idr = H.encode_i_frame_cabac(mbs, wmb, hmb, 26,
                                         deblock_idc=deblock)
        else:
            dc_lvl = (((did * 7 + fi * 11) % 40) * 37 if mode == 0
                      else ((did * 5 + fi * 3) % 40) * 29)
            dc16 = [0] * 16
            dc16[0] = dc_lvl
            mbs = [("i16", 2, dc16, None)]
            mbs += [("i16", 2, [0] * 16, None)] * (wmb * hmb - 1)
            idr = H.encode_i_frame_cabac(mbs, wmb, hmb, 26,
                                         deblock_idc=deblock)
        samples.append(len(idr).to_bytes(4, "big") + idr)
    avcc = H.build_avcc(sps, pps)
    ext = (len(avcc) + 8).to_bytes(4, "big") + b"avcC" + avcc
    return encode_mp4(samples, codec=b"avc1", sample_entry_ext=ext,
                      width=w, height=h)


SYNTHS = {"base": synth_base, "gop": synth_gop, "b": synth_b,
          "cabac": synth_cabac}


def run_gate(name: str, n_docs: int) -> tuple[float, float]:
    synth = SYNTHS[name]
    t0 = time.perf_counter()
    payloads = [(did, synth(did)) for did in range(n_docs)]
    t_synth = time.perf_counter() - t0
    pdf = pd.DataFrame(payloads, columns=["doc_id", "payload"])
    t0 = time.perf_counter()
    out = list(DECODE_RUN(iter([pdf])))
    t_dec = time.perf_counter() - t0
    n_rows = sum(len(o) for o in out)
    nulls = sum(int(o["pix_sum"].isna().sum()) for o in out)
    print(f"{name}: synth {t_synth:.3f}s decode {t_dec:.3f}s "
          f"rows {n_rows} null_pix {nulls}")
    return t_synth, t_dec


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--time":
        # plain min-of-3 wall timing per gate kernel (no cProfile):
        # the precise, Spark-noise-free basis for before/after claims
        n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 500
        for g in SYNTHS:
            run_gate(g, 50)  # warm-up
        for g in SYNTHS:
            best = (float("inf"), float("inf"))
            for _ in range(3):
                s, d = run_gate(g, n_docs)
                best = (min(best[0], s), min(best[1], d))
            print(f"BEST {g}: synth {best[0]:.3f}s decode {best[1]:.3f}s "
                  f"total {best[0] + best[1]:.3f}s")
        return
    gate = sys.argv[1] if len(sys.argv) > 1 else "all"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    gates = list(SYNTHS) if gate == "all" else [gate]
    for g in gates:
        run_gate(g, 50)  # warm-up / sanity
    pr = cProfile.Profile()
    pr.enable()
    for g in gates:
        run_gate(g, n_docs)
    pr.disable()
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(45)
    print(s.getvalue())
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("tottime")
    ps.print_stats(45)
    print(s.getvalue())


if __name__ == "__main__":
    main()
