"""Multimodal columns: images/audio/video as opaque ``binary`` columns
with typed metadata extracted Spark-side.

A training-data pipeline treats media as bytes + metadata; the Spark
plumbing that matters at 100 TB is (a) schema — ``binary`` payload next
to typed metadata columns, (b) Arrow-batched extraction (one Python
call per batch, never per row), (c) partition-friendly operators that
never collect payloads to the driver. This module provides:

- :func:`sniff_media_udf` — REAL header parsing (magic bytes → format,
  dimensions from PNG IHDR / GIF logical screen / JPEG SOF0 / BMP
  header, sample rate from a WAV fmt chunk) as a pandas UDF. No
  external image libs needed: these are fixed-offset header reads.
- :func:`decode_image_batches` — the ``mapInPandas`` decode/resize
  pipeline shape (schema, batching, partition behavior) with the pixel
  decode STUBBED: the sandbox has no image codecs, so the stub returns
  a deterministic checksum-based fake feature vector and raises
  ``NotImplementedError`` if a real decode is demanded. The Spark-side
  contract (batch shapes, output schema) is real and tested.

The synthetic media table (:func:`synth_media_rows`) generates genuine
minimal headers so the sniffer parses real bytes, and its metadata is
parametric so a DuckDB oracle can verify the parse
(``analytics.media_metadata``).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("format", StringType()),       # png|gif|jpeg|bmp|wav|unknown
        StructField("width", IntegerType()),        # images only
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),  # wav only
        StructField("byte_len", IntegerType()),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_media_py(blob) -> dict:
    """Parse one media blob's header. Pure fixed-offset byte reads —
    the real thing, not a stub."""
    out = {
        "format": "unknown", "width": None, "height": None,
        "sample_rate": None, "byte_len": 0,
    }
    if blob is None:
        return out
    b = bytes(blob)
    out["byte_len"] = len(b)
    if b.startswith(_PNG_SIG) and len(b) >= 24:
        # IHDR: length(4) type(4) width(4) height(4), big-endian
        out["format"] = "png"
        out["width"], out["height"] = struct.unpack(">II", b[16:24])
    elif b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        out["format"] = "gif"
        out["width"], out["height"] = struct.unpack("<HH", b[6:10])
    elif b.startswith(b"\xff\xd8\xff"):
        out["format"] = "jpeg"
        # walk segments to SOF0/SOF2 (dimensions live there)
        i = 2
        while i + 9 < len(b) and b[i] == 0xFF:
            marker, seglen = b[i + 1], struct.unpack(">H", b[i + 2 : i + 4])[0]
            if marker in (0xC0, 0xC2):
                out["height"], out["width"] = struct.unpack(
                    ">HH", b[i + 5 : i + 9]
                )
                break
            i += 2 + seglen
    elif b.startswith(b"BM") and len(b) >= 26:
        out["format"] = "bmp"
        w, h = struct.unpack("<ii", b[18:26])
        out["width"], out["height"] = w, abs(h)
    elif b[:4] == b"RIFF" and b[8:12] == b"WAVE" and len(b) >= 28:
        out["format"] = "wav"
        out["sample_rate"] = struct.unpack("<I", b[24:28])[0]
    return out


@F.pandas_udf(MEDIA_META)
def sniff_media_udf(blob: pd.Series) -> pd.DataFrame:
    """Arrow-batched header sniff: one Python call per batch."""
    return pd.DataFrame([sniff_media_py(x) for x in blob])


# ------------------------------------------------------ decode pipeline --

DECODE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("format", StringType()),
        StructField("feat_dim", IntegerType()),
        StructField("feat_norm", DoubleType()),
    ]
)


def _fake_feature(blob: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in for a pixel decode: a rolling checksum
    over the payload folded into ``dim`` floats. Stable across runs, so
    downstream tests can pin values."""
    acc = [0] * dim
    for i, byte in enumerate(blob):
        acc[i % dim] = (acc[i % dim] * 31 + byte) % 1_000_003
    return [a / 1_000_003 for a in acc]


def decode_image_batches(
    it: Iterator[pd.DataFrame], *, real_decode: bool = False, dim: int = 16
) -> Iterator[pd.DataFrame]:
    """``mapInPandas`` body: blobs → feature rows. The pixel decode is
    STUBBED (no codecs in this environment); the batching, schema, and
    per-partition behavior are the real pipeline. Input batches need
    (media_id, blob) columns."""
    if real_decode:
        raise NotImplementedError(
            "pixel decode requires an image codec (PIL/opencv) — not "
            "available in this environment; the deterministic checksum "
            "feature stands in for it"
        )
    for pdf in it:
        rows = []
        for media_id, blob in zip(pdf["media_id"], pdf["blob"]):
            b = bytes(blob) if blob is not None else b""
            feat = _fake_feature(b, dim)
            norm = sum(x * x for x in feat) ** 0.5
            rows.append(
                {
                    "media_id": media_id,
                    "format": sniff_media_py(b)["format"],
                    "feat_dim": dim,
                    "feat_norm": norm,
                }
            )
        yield pd.DataFrame(rows, columns=[f.name for f in DECODE_SCHEMA.fields])


def decode_media(df, *, dim: int = 16):
    """The decode pipeline as a DataFrame op: ``mapInPandas`` so blobs
    stream through Arrow batches partition-locally (no shuffle, no
    driver collect)."""
    return df.select("media_id", "blob").mapInPandas(
        lambda it: decode_image_batches(it, dim=dim), schema=DECODE_SCHEMA
    )


# ----------------------------------------------------- synthetic media --


def png_bytes(width: int, height: int) -> bytes:
    """A minimal (signature + IHDR) PNG header — genuinely parseable."""
    ihdr = struct.pack(">II", width, height) + b"\x08\x02\x00\x00\x00"
    return _PNG_SIG + struct.pack(">I", 13) + b"IHDR" + ihdr


def gif_bytes(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00"


def wav_bytes(sample_rate: int) -> bytes:
    return (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt " +
        struct.pack("<IHHI", 16, 1, 1, sample_rate)
    )


def synth_media_rows(n: int) -> list[dict]:
    """Deterministic media table: id → format/dimensions are pure
    functions of the index (so an oracle can verify the parse)."""
    rows = []
    for i in range(n):
        kind = i % 3
        if kind == 0:
            blob = png_bytes(16 + i % 64, 9 + i % 32)
        elif kind == 1:
            blob = gif_bytes(32 + i % 16, 24 + i % 8)
        else:
            blob = wav_bytes(8000 + 100 * (i % 5))
        rows.append({"media_id": f"m{i:05d}", "blob": blob})
    return rows
