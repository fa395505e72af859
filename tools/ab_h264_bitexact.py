"""Bit-exactness A/B harness for h264.py micro-optimizations.

Run this script TWICE — once with PYTHONPATH pointing at a snapshot of
the pre-change tree, once at the working tree — and diff the output:

    PYTHONPATH=/tmp/r13s4_ref/old_tree python tools/ab_h264_bitexact.py > /tmp/old.sum
    PYTHONPATH=/root/repo           python tools/ab_h264_bitexact.py > /tmp/new.sum
    diff /tmp/old.sum /tmp/new.sum     # empty = bit-exact

For every gate stream family (base / gop / b / cabac — the exact synth
the bench gates run, replicated by tools/profile_h264.py) plus a
randomized-residual I_4x4 family it prints:

  * a SHA-256 over every synthesized MP4 payload (encoder equivalence:
    identical hashes mean the new encoder emits byte-identical NALs), and
  * a SHA-256 over the full decode_frames output DataFrame — every
    column of every row, pixel stats included, in deterministic order
    (decoder equivalence over the same payload bytes).

Because each process both encodes and decodes with ITS OWN module tree,
matching payload hashes make the decode comparison transitive: both
trees decoded byte-identical inputs.
"""

from __future__ import annotations

import hashlib
import random
import sys


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 150

    import pandas as pd

    import tools.profile_h264 as prof
    from engine_spark.datapipe import h264 as H
    from engine_spark.datapipe.multimodal import encode_mp4

    def synth_random_i4(did: int) -> bytes:
        r = random.Random(did * 9176 + 7)
        wmb, hmb = r.randint(1, 2), r.randint(1, 2)
        mbs = []
        for _ in range(wmb * hmb):
            modes = [r.choice([0, 1, 2, 2, 2]) for _ in range(16)]
            coeffs = []
            for _ in range(16):
                if r.random() < 0.5:
                    coeffs.append(None)
                else:
                    blk = [0] * 16
                    for _ in range(r.randint(1, 5)):
                        blk[r.randint(0, 15)] = r.randint(-8, 8)
                    coeffs.append(blk if any(blk) else None)
            mbs.append(("i4", modes, coeffs, None))
        sps, pps = H.encode_sps_pps(wmb, hmb, qp=26)
        nal = H.encode_i_frame(mbs, wmb, hmb, 26)
        avcc = H.build_avcc(sps, pps)
        ext = (len(avcc) + 8).to_bytes(4, "big") + b"avcC" + avcc
        return encode_mp4(
            [len(nal).to_bytes(4, "big") + nal],
            codec=b"avc1",
            sample_entry_ext=ext,
            width=wmb * 16,
            height=hmb * 16,
        )

    fams: dict = dict(prof.SYNTHS)
    fams["rand_i4"] = synth_random_i4

    for fam, synth in fams.items():
        enc = hashlib.sha256()
        payloads = []
        for did in range(n_docs):
            p = synth(did)
            enc.update(len(p).to_bytes(8, "big"))
            enc.update(p)
            payloads.append((did, p))
        pdf = pd.DataFrame(payloads, columns=["doc_id", "payload"])
        out = pd.concat(list(prof.DECODE_RUN(iter([pdf]))), ignore_index=True)
        out = out.sort_values(list(out.columns)).reset_index(drop=True)
        dec = hashlib.sha256()
        dec.update(",".join(map(str, out.columns)).encode())
        for row in out.itertuples(index=False):
            dec.update(repr(tuple(row)).encode())
        print(f"{fam} encode {enc.hexdigest()} decode {dec.hexdigest()} "
              f"rows {len(out)}")


if __name__ == "__main__":
    main()
