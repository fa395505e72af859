"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas functions
over ``mapInPandas``.

PNG is decoded, resampled, and re-encoded FOR REAL — pure stdlib (zlib
inflate + per-row unfilter per the public PNG spec / RFC 2083, numpy
bilinear resample, zlib deflate + crc32 on the way out); header dimensions
for GIF/BMP/JPEG are parsed for real too (parse_image_header). Only the
non-PNG *pixel* codecs and the video demuxer remain gated: those genuinely
need imaging/av libraries absent in this container, so they use documented
deterministic stand-ins that keep the Arrow plumbing (schemas, batch
iteration, null-safety, partition-level parallelism) fully testable.

Scale notes: mapInPandas streams Arrow record batches — payload bytes never
materialize on the driver; batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Binary-heavy tables should
be read with large ``maxPartitionBytes`` and processed map-only (no shuffle
of payload columns; metadata-only columns flow onward).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False

import struct as _struct
import zlib as _zlib

#: Everything a malformed payload can raise out of the stdlib codecs:
#: corrupt IDAT → zlib.error, truncated chunk → struct.error, out-of-range
#: palette index → IndexError, plus our own ValueError for profile checks.
#: Decode call sites catch this tuple so one bad crawled file degrades to
#: the metadata-only row instead of failing the executor task (per-row
#: total-function contract).
DECODE_ERRORS = (ValueError, _zlib.error, _struct.error, IndexError)

DECODE_SCHEMA = (
    "doc_id long, width int, height int, n_frames int, checksum long"
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for a media decoder (documented; the oracle
    replicates these formulas in SQL)."""
    n = len(payload)
    width = n % 640
    height = (payload[0] * 7) % 480 if n else 0
    n_frames = n // 100 + 1
    checksum = sum(payload) % 65536
    return width, height, n_frames, checksum


def decode_meta(df: DataFrame) -> DataFrame:
    """(doc_id, payload binary) → decoded metadata via mapInPandas.

    With a real decoder installed this is where PIL/soundfile/pyav would
    parse the header; the Arrow plumbing is identical either way.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                meta, columns=["width", "height", "n_frames", "checksum"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.mapInPandas(run, schema=DECODE_SCHEMA)


def parse_image_header(b: bytes) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) from raw image bytes — pure stdlib, no
    imaging library. Parses the four public container formats whose
    dimensions live in fixed header fields or a marker walk:

    - PNG: 8-byte signature, IHDR width/height big-endian u32 at 16..24
      (PNG spec, RFC 2083 §11.2.2)
    - GIF: GIF87a/GIF89a, logical-screen width/height little-endian u16
      at 6..10 (GIF89a spec §18)
    - BMP: 'BM', BITMAPINFOHEADER signed LE i32 at 18..26 (height may be
      negative = top-down; magnitude is the pixel height)
    - JPEG: marker walk to the first SOFn (height, width big-endian u16
      at offset +5 in the frame header; ITU T.81 §B.2.2)

    Unknown/truncated payloads → (None, None, None); decode stays a
    per-row total function so mapInPandas batches never throw.
    """
    import struct

    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return "png", int(w), int(h)
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", int(w), int(h)
    if len(b) >= 26 and b[:2] == b"BM":
        w, h = struct.unpack("<ii", b[18:26])
        return "bmp", int(w), abs(int(h))
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker == 0xFF:
                i += 1  # fill byte before a marker (ITU T.81 B.1.1.2)
                continue
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                i += 2  # standalone markers carry no length
                continue
            (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return "jpeg", int(w), int(h)
            i += 2 + seglen
    return None, None, None


HEADER_SCHEMA = "doc_id long, format string, width int, height int"


def decode_image_headers(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL (non-gated) decode path: (doc_id, payload) → container format +
    pixel dimensions parsed from the actual bytes with the stdlib header
    parser — same Arrow-batched mapInPandas plumbing as decode_meta, no
    imaging library needed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads are normal in a real corpus: decode must stay a
            # per-row total function (bytes(None) would kill the whole task)
            meta = [
                (None, None, None) if p is None else parse_image_header(bytes(p))
                for p in pdf[payload_col]
            ]
            out = pd.DataFrame(meta, columns=["format", "width", "height"])
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.mapInPandas(run, schema=HEADER_SCHEMA)


# ---------------------------------------------------------------------------
# REAL stdlib PNG pixel codec (zlib inflate + per-row unfilter; PNG spec /
# RFC 2083 §6: filter types 0-4). No imaging library involved. 8-bit depth,
# color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
# non-interlaced — the overwhelmingly dominant PNG profile; 16-bit and
# Adam7 raise ValueError (caught by callers as "not decodable here").
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(b: bytes):
    """PNG bytes → HxWxC uint8 numpy array. Pure stdlib: chunk walk,
    concatenated-IDAT zlib inflate, per-row unfilter (all five filter
    types). Palette images are expanded through PLTE to RGB."""
    import struct
    import zlib

    import numpy as np

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, plte = 8, [], None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # length + type + data + crc32
    if w is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    if depth != 8:
        raise ValueError(f"bit depth {depth} not supported (8 only)")
    if interlace != 0:
        raise ValueError("Adam7 interlacing not supported")
    if ctype not in _PNG_CHANNELS:
        raise ValueError(f"unknown color type {ctype}")
    nch = _PNG_CHANNELS[ctype]
    stride = w * nch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) < h * (stride + 1):
        raise ValueError("IDAT shorter than image")
    # Unfilter with (w, nch) row layout so the x-sequential filters use
    # vectorized channel math. Real-world libpng output is mostly adaptive
    # Sub/Average/Paeth rows, so these paths — not just filter 0 — are the
    # 100 TB hot path.
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros((w, nch), np.int32)
    rpos = 0
    for y in range(h):
        f = raw[rpos]
        line = (
            np.frombuffer(raw[rpos + 1 : rpos + 1 + stride], np.uint8)
            .astype(np.int32)
            .reshape(w, nch)
        )
        rpos += 1 + stride
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up — vectorized (no left dependency)
            cur = (line + prev) & 0xFF
        elif f == 1:
            # Sub: cur[x] = sum(line[0..x]) mod 256 per channel lane — mod
            # distributes over +, so the whole row is one cumsum
            cur = (np.cumsum(line, axis=0, dtype=np.int64) & 0xFF).astype(
                np.int32
            )
        elif f in (3, 4):  # Average / Paeth: x-sequential recurrence. A
            # tight byte loop over plain Python ints with the predictor
            # inlined — numpy scalar indexing plus a per-byte function
            # call is ~8x slower, per-pixel small-array numpy ~12x
            # (PERF.md); no full vectorization exists (cur[i] depends on
            # cur[i-nch] through a nonlinear floor/branch).
            cur_l = list(raw[rpos - stride : rpos])
            prev_l = prev.ravel().tolist()
            if f == 3:
                for i in range(stride):
                    left = cur_l[i - nch] if i >= nch else 0
                    cur_l[i] = (cur_l[i] + ((left + prev_l[i]) >> 1)) & 0xFF
            else:
                for i in range(stride):
                    left = cur_l[i - nch] if i >= nch else 0
                    up = prev_l[i]
                    ul = prev_l[i - nch] if i >= nch else 0
                    p = left + up - ul
                    pa = p - left
                    pb = p - up
                    pc = p - ul
                    if pa < 0:
                        pa = -pa
                    if pb < 0:
                        pb = -pb
                    if pc < 0:
                        pc = -pc
                    if pa <= pb and pa <= pc:
                        pred = left
                    elif pb <= pc:
                        pred = up
                    else:
                        pred = ul
                    cur_l[i] = (cur_l[i] + pred) & 0xFF
            cur = np.array(cur_l, np.int32).reshape(w, nch)
        else:
            raise ValueError(f"bad filter type {f} at row {y}")
        out[y] = cur.astype(np.uint8).reshape(stride)
        prev = cur
    arr = out.reshape(h, w, nch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        arr = plte[arr[:, :, 0]]
    return arr


def encode_png(arr, filter_type: int = 0) -> bytes:
    """HxW or HxWxC uint8 numpy array → PNG bytes (stdlib zlib + crc32).

    ``filter_type`` selects the per-row filter (0-4); non-zero types exist
    so round-trip tests exercise every unfilter branch of decode_png — a
    production encoder would pick per-row, but filter 0 + zlib is correct
    and sufficient here."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(arr, np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nch = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    # Filtering (unlike UNfiltering) references the ORIGINAL neighbor
    # bytes, not the filtered ones — no recurrence, so every filter type
    # vectorizes whole-row: shift the scanline by one pixel for `left`,
    # use the prior scanline for `up`/`ul`.
    flat = a.reshape(h, w, nch).astype(np.int32)
    rows = []
    prev = np.zeros((w, nch), np.int32)

    def lshift(row: "np.ndarray") -> "np.ndarray":
        out = np.zeros_like(row)
        out[1:] = row[:-1]
        return out

    for y in range(h):
        line = flat[y]
        if filter_type == 0:
            filt = line
        elif filter_type == 1:
            filt = (line - lshift(line)) & 0xFF
        elif filter_type == 2:
            filt = (line - prev) & 0xFF
        elif filter_type == 3:
            filt = (line - ((lshift(line) + prev) >> 1)) & 0xFF
        elif filter_type == 4:
            left, up, ul = lshift(line), prev, lshift(prev)
            p = left + up - ul
            pa = np.abs(p - left)
            pb = np.abs(p - up)
            pc = np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
            )
            filt = (line - pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {filter_type}")
        rows.append(bytes([filter_type]) + filt.astype(np.uint8).tobytes())
        prev = line

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    idat = zlib.compress(b"".join(rows), 6)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def bilinear_resize(arr, out_w: int, out_h: int):
    """Vectorized numpy bilinear resample (half-pixel-center convention,
    the standard align_corners=False mapping). uint8 in → uint8 out."""
    import numpy as np

    a = np.asarray(arr, np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, _ = a.shape
    xs = np.clip((np.arange(out_w) + 0.5) * (w / out_w) - 0.5, 0, w - 1)
    ys = np.clip((np.arange(out_h) + 0.5) * (h / out_h) - 0.5, 0, h - 1)
    x0 = np.floor(xs).astype(int)
    y0 = np.floor(ys).astype(int)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = (xs - x0)[None, :, None]
    fy = (ys - y0)[:, None, None]
    top = a[y0][:, x0] * (1 - fx) + a[y0][:, x1] * fx
    bot = a[y1][:, x0] * (1 - fx) + a[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


DECODE_IMAGE_SCHEMA = (
    "doc_id long, format string, width int, height int, channels int, "
    "pix_sum long"
)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL full pixel decode for PNG payloads → (format, true pixel width/
    height, channel count, sum of all decoded pixel values) via Arrow-batched
    mapInPandas. PNG is decoded entirely stdlib-side (decode_png: zlib
    inflate + per-row unfilter); non-PNG containers (gif/bmp/jpeg — their
    pixel codecs genuinely need an imaging library absent here) report their
    header format with NULL pixel fields, keeping decode a per-row total
    function. With Pillow installed the per-row branch would hand non-PNG
    bytes to ``PIL.Image`` instead; everything else is identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf["doc_id"], pdf[payload_col]):
                b = b"" if p is None else bytes(p)
                fmt, _, _ = parse_image_header(b)
                if fmt == "png":
                    try:
                        arr = decode_png(b)
                        rows.append(
                            (
                                int(did),
                                "png",
                                arr.shape[1],
                                arr.shape[0],
                                arr.shape[2],
                                int(arr.sum(dtype="int64")),
                            )
                        )
                        continue
                    except DECODE_ERRORS:
                        pass  # exotic profile or corrupt payload
                rows.append((int(did), fmt, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "format", "width", "height", "channels",
                         "pix_sum"],
            )

    return df.mapInPandas(run, schema=DECODE_IMAGE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, width int, height int, scale_x double, scale_y double, "
    "payload binary"
)


def resize_image(
    df: DataFrame, width: int, height: int, payload_col: str = "payload"
) -> DataFrame:
    """Image resize: (doc_id, payload) → target dims + scale factors +
    resized payload, Arrow-batched mapInPandas (map-only; payload bytes
    never shuffle).

    PNG payloads take the REAL pixel path — stdlib decode (decode_png:
    zlib inflate + per-row unfilter), vectorized numpy bilinear resample,
    stdlib PNG re-encode — so the output payload is a genuine PNG whose
    header parses to (width, height) and whose pixels are the resampled
    source. Non-PNG containers (gif/bmp/jpeg: pixel codecs genuinely need
    an imaging library absent in this environment; with Pillow installed
    the same branch would call it) fall back to a DETERMINISTIC stand-in —
    source dims from the real header parser (else the fake-decode dims),
    exact scale factors, and a length-scaled byte slice as the payload —
    keeping the full pipeline runnable and testable end-to-end.
    """
    if width < 1 or height < 1:
        raise ValueError("resize target dimensions must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_rows = []
        for pdf in batches:
            for did, p in zip(pdf["doc_id"], pdf[payload_col]):
                b = b"" if p is None else bytes(p)
                fmt, sw, sh = parse_image_header(b)
                if fmt == "png":
                    try:
                        arr = decode_png(b)
                        out = encode_png(bilinear_resize(arr, width, height))
                        out_rows.append(
                            (int(did), width, height, width / arr.shape[1],
                             height / arr.shape[0], out)
                        )
                        continue
                    except DECODE_ERRORS:
                        pass  # exotic/corrupt payload → stand-in path below
                if sw is None or sh is None or not sw or not sh:
                    sw, sh, _, _ = _fake_decode(b)
                    sw, sh = max(sw, 1), max(sh, 1)
                scale_x = width / sw
                scale_y = height / sh
                # stand-in payload: deterministic length-scaled slice
                n_out = max(1, min(len(b), int(len(b) * scale_x * scale_y)))
                out_rows.append(
                    (int(did), width, height, scale_x, scale_y, b[:n_out])
                )
            if out_rows:
                yield pd.DataFrame(
                    out_rows,
                    columns=["doc_id", "width", "height", "scale_x",
                             "scale_y", "payload"],
                )
                out_rows = []

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SAMPLE_SCHEMA = (
    "doc_id long, frame_idx int, n_frames int, byte_start long, byte_end long"
)


def frame_sample(
    df: DataFrame, every_k: int, payload_col: str = "payload"
) -> DataFrame:
    """Frame sampling plumbing: (doc_id, payload) → one row per sampled
    frame index (every ``every_k``-th), with the byte range a container
    demuxer would hand the decoder. Without a media library the frame
    COUNT comes from the deterministic stand-in decoder and byte ranges
    are the uniform partition of the payload — the Spark shape (explode
    via mapInPandas, map-only, payload never shuffled) is the real one;
    a pyav-backed kernel would only change the two marked lines.
    """
    if every_k < 1:
        raise ValueError("every_k must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf["doc_id"], pdf[payload_col]):
                b = b"" if p is None else bytes(p)
                _, _, n_frames, _ = _fake_decode(b)  # ← real demuxer here
                per = max(1, len(b) // max(n_frames, 1))  # ← and here
                for fi in range(0, n_frames, every_k):
                    # the LAST frame absorbs the floor-division remainder so
                    # the frame ranges partition the whole payload (no
                    # unreachable tail bytes)
                    end = len(b) if fi == n_frames - 1 else min(
                        (fi + 1) * per, len(b)
                    )
                    rows.append((int(did), fi, n_frames, fi * per, end))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["doc_id", "frame_idx", "n_frames",
                             "byte_start", "byte_end"],
                )

    return df.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling. Requires an av library."""
    raise NotImplementedError(
        "frame sampling requires pyav, which is not installed in this "
        "environment; the mapInPandas plumbing mirrors decode_meta()"
    )


# ---------------------------------------------------------------------------
# REAL stdlib WAV/RIFF PCM audio codec (public RIFF/WAVE spec: 'RIFF' size
# 'WAVE' + 'fmt ' chunk with LE fields + 'data' chunk of raw samples).
# PCM16 decodes to real samples; other encodings report header metadata
# with NULL sample features (their codecs genuinely need an audio library).
# ---------------------------------------------------------------------------


def parse_wav_header(b: bytes) -> dict | None:
    """RIFF/WAVE 'fmt ' + 'data' chunk walk → dict(audio_format, channels,
    sample_rate, bits, data_off, data_len) or None if not a WAV."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (clen,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + clen]
        if cid == b"fmt " and clen >= 16:
            af, nch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            fmt = {"audio_format": af, "channels": nch, "sample_rate": rate,
                   "bits": bits}
        elif cid == b"data":
            data = (pos + 8, clen)
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    fmt["data_off"], fmt["data_len"] = data
    return fmt


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """Mono PCM16 int16 numpy array → WAV bytes (stdlib struct only)."""
    import struct

    import numpy as np

    a = np.asarray(samples, np.int16)
    data = a.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    out = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(out)) + out


AUDIO_SCHEMA = (
    "doc_id long, format string, channels int, sample_rate int, "
    "n_samples long, duration_s double, rms double, zero_crossings long, "
    "peak int"
)


def decode_audio(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL audio decode for WAV/PCM16 payloads → header metadata + sample
    features (RMS energy, zero-crossing count, peak amplitude) computed
    from the ACTUAL samples, vectorized numpy inside Arrow-batched
    mapInPandas. Non-PCM16 WAVs report header fields with NULL features;
    non-WAV payloads are all-NULL rows (per-row total function). Map-only:
    payload bytes never shuffle."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf["doc_id"], pdf[payload_col]):
                b = b"" if p is None else bytes(p)
                h = parse_wav_header(b)
                if h is None:
                    rows.append((int(did), None, None, None, None, None,
                                 None, None, None))
                    continue
                base = (int(did), "wav", h["channels"], h["sample_rate"])
                if h["audio_format"] != 1 or h["bits"] != 16:
                    rows.append(base + (None, None, None, None, None))
                    continue
                raw = b[h["data_off"] : h["data_off"] + h["data_len"]]
                a = np.frombuffer(
                    raw[: len(raw) // 2 * 2], "<i2"
                ).astype(np.int64)
                n = len(a) // h["channels"] if h["channels"] else 0
                if len(a) == 0:
                    rows.append(base + (0, 0.0, None, None, None))
                    continue
                dur = n / h["sample_rate"]
                rms = float(np.sqrt((a * a).mean()))
                zc = int(np.count_nonzero(np.signbit(a[:-1]) != np.signbit(a[1:])))
                rows.append(base + (n, dur, rms, zc, int(np.abs(a).max())))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "format", "channels", "sample_rate",
                         "n_samples", "duration_s", "rms", "zero_crossings",
                         "peak"],
            )

    return df.mapInPandas(run, schema=AUDIO_SCHEMA)
