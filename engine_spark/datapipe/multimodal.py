"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas functions
over ``mapInPandas``.

The decode/resize/frame-sample kernels are the real Spark plumbing
(schemas, batch iteration, partition-level parallelism); the pixel/sample
decoders themselves are gated behind import-tries because the image/audio
libraries are not in this container. ``decode_meta`` uses a deterministic
stand-in so the full pipeline is testable and oracle-checkable.

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


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Full pixel decode → (width, height, mode). Requires PIL; for
    header-level dimensions use decode_image_headers (stdlib, no gate)."""
    if not HAS_PIL:  # pragma: no cover
        raise NotImplementedError(
            "pixel decoding requires Pillow, which is not installed in this "
            "environment; decode_image_headers() parses real PNG/GIF/BMP/"
            "JPEG headers without it, decode_meta() is the deterministic "
            "stand-in for full decode"
        )
    raise NotImplementedError("PIL present but decoder not wired yet")


RESIZE_SCHEMA = (
    "doc_id long, width int, height int, scale_x double, scale_y double, "
    "payload binary"
)


def resize_image(
    df: DataFrame, width: int, height: int, payload_col: str = "payload"
) -> DataFrame:
    """Resize plumbing: (doc_id, payload) → target dims + scale factors +
    resized payload, via the same Arrow-batched mapInPandas shape a real
    resampler uses. The pixel kernel is gated: with Pillow installed the
    payload would decode → resample → re-encode inside the loop; without
    it a DETERMINISTIC stand-in keeps the full pipeline runnable and
    testable — source dims come from the real stdlib header parser when
    the payload is a known container (else the fake-decode dims), scale
    factors are exact doubles, and the stand-in 'resized' payload is a
    length-scaled deterministic byte slice (bounded, content-derived).
    """
    if width < 1 or height < 1:
        raise ValueError("resize target dimensions must be >= 1")
    if HAS_PIL:  # pragma: no cover - library absent here
        # fail fast on the DRIVER (like decode_image), not per task
        raise NotImplementedError(
            "PIL present but the pixel resampler is not wired; decode "
            "payload -> Image.resize((width, height)) -> bytes in run()"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_rows = []
        for pdf in batches:
            for did, p in zip(pdf["doc_id"], pdf[payload_col]):
                b = b"" if p is None else bytes(p)
                fmt, sw, sh = parse_image_header(b)
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
