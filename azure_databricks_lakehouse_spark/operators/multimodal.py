"""Multimodal column plumbing: opaque binary payloads + Pandas-UDF decode.

A training-data pipeline at 100 TB carries images/audio/video as opaque
``binary`` columns with typed metadata, decoding only inside Arrow-batched
Python (``mapInPandas``) — the one place the engine's no-UDF rule
(SURVEY.md §2.10) is deliberately relaxed, because media codecs are not
Catalyst expressions.  The Spark-side contract — schema, batch shape,
partitioning — is what matters and is fully real + tested here; the
actual image/audio libraries are not in this container, so:

- :func:`decode_fake_images` decodes a deterministic in-repo test codec
  (``FAKEIMG`` header + raw grayscale bytes) — exercising the exact
  mapInPandas/Arrow path a real decoder uses.
- :func:`byte_histogram` computes normalized byte histograms — a real,
  library-free binary fingerprint (useful for corrupt-file triage and
  near-dup candidate filtering on any payload).
- :func:`decode_images` is the production entry point: it dispatches to
  Pillow when importable and raises ``NotImplementedError`` otherwise
  (clearly-marked stub per the build contract).

Scale notes: mapInPandas streams Arrow record batches — peak memory is
the batch, not the partition; keep payload columns pruned to (id, bytes)
before decode and re-join features by id afterwards so the wide media
bytes never ride through later shuffles.  Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

_MAGIC = b"FAKEIMG"
_HEADER_FMT = ">7sII"  # magic, width, height
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)

FAKE_DECODE_SCHEMA = (
    "id long, width int, height int, n_pixels int, mean_pixel double, decode_ok boolean"
)
HISTOGRAM_SCHEMA = "id long, n_bytes int, histogram array<double>"


def encode_fake_image(img_id: int, width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic test payload: header + width*height grayscale bytes."""
    body = bytes((seed + i) % 256 for i in range(width * height))
    return struct.pack(_HEADER_FMT, _MAGIC, width, height) + body


def decode_fake_images(
    df: DataFrame, id_col: str = "id", bin_col: str = "payload"
) -> DataFrame:
    """Arrow-batched decode of the FAKEIMG codec via ``mapInPandas``.

    Input is pruned to (id, payload) before the Python boundary — never
    ship columns into Arrow that the decoder doesn't read.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for img_id, payload in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(payload) if payload is not None else b""
                if len(raw) < _HEADER_SIZE or not raw.startswith(_MAGIC):
                    rows.append((img_id, None, None, None, None, False))
                    continue
                _m, w, h = struct.unpack_from(_HEADER_FMT, raw)
                body = np.frombuffer(raw, dtype=np.uint8, offset=_HEADER_SIZE)
                if body.size != w * h:
                    rows.append((img_id, None, None, None, None, False))
                    continue
                rows.append(
                    (img_id, w, h, int(body.size), float(body.mean()), True)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "width", "height", "n_pixels", "mean_pixel", "decode_ok",
                ],
            )

    return df.select(id_col, bin_col).mapInPandas(_decode, FAKE_DECODE_SCHEMA)


def byte_histogram(
    df: DataFrame, id_col: str = "id", bin_col: str = "payload", bins: int = 16
) -> DataFrame:
    """Normalized byte-value histogram per payload (library-free binary
    fingerprint; vectorized numpy over Arrow batches)."""

    def _hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for row_id, payload in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(payload) if payload is not None else b""
                if not raw:
                    out.append((row_id, 0, [0.0] * bins))
                    continue
                arr = np.frombuffer(raw, dtype=np.uint8)
                counts, _ = np.histogram(arr, bins=bins, range=(0, 256))
                out.append((row_id, len(raw), (counts / len(raw)).tolist()))
            yield pd.DataFrame(out, columns=["id", "n_bytes", "histogram"])

    return df.select(id_col, bin_col).mapInPandas(_hist, HISTOGRAM_SCHEMA)


def pillow_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def decode_images(df: DataFrame, id_col: str = "id", bin_col: str = "payload"):
    """Production decode path (JPEG/PNG via Pillow).

    STUB in this container: Pillow is not installed, so this raises
    ``NotImplementedError``.  When Pillow is importable the same
    mapInPandas contract as :func:`decode_fake_images` applies — swap the
    header parse for ``PIL.Image.open(io.BytesIO(raw))``.
    """
    if not pillow_available():
        raise NotImplementedError(
            "image decoding requires Pillow, which is not installed; "
            "use decode_fake_images for the plumbing-only path"
        )
    raise NotImplementedError("real decoder wiring lands with the media libs")
