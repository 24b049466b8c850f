"""Multimodal column operators: images/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing — schemas, Arrow-batched UDF signatures, partition
behavior — is real and tested. Header-level metadata extraction (PNG/JPEG
dimensions, WAV sample rate, magic-based MIME sniffing) is implemented in
pure Python from the public container specs. Full pixel/sample DECODE needs
codec libraries this container doesn't ship, so ``decode_image`` raises
NotImplementedError (clearly marked), and ``image_features`` offers a
deterministic md5-based FAKE embedding so downstream similarity plumbing is
exercisable end-to-end.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "sniff_mime",
    "image_dimensions",
    "wav_sample_rate",
    "attach_media_metadata",
    "decode_image",
    "image_features",
    "MEDIA_META_SCHEMA",
]

MEDIA_META_SCHEMA = (
    "mime string, size_bytes long, width int, height int, sample_rate int"
)


def _sniff(b: bytes | None) -> str | None:
    if not b:
        return None
    if b.startswith(b"\x89PNG\r\n\x1a\n"):
        return "image/png"
    if b.startswith(b"\xff\xd8\xff"):
        return "image/jpeg"
    if b.startswith(b"GIF8"):
        return "image/gif"
    if b.startswith(b"RIFF") and b[8:12] == b"WAVE":
        return "audio/wav"
    if b[4:8] == b"ftyp":
        return "video/mp4"
    return "application/octet-stream"


def _png_dims(b: bytes) -> tuple[int, int] | None:
    if len(b) >= 24 and b.startswith(b"\x89PNG"):
        w, h = struct.unpack(">II", b[16:24])
        return w, h
    return None


def _jpeg_dims(b: bytes) -> tuple[int, int] | None:
    # walk JPEG segments to the first SOF marker (public JFIF layout)
    i = 2
    while i + 9 < len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", b[i + 5 : i + 9])
            return w, h
        seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
        i += 2 + seg_len
    return None


def _wav_rate(b: bytes) -> int | None:
    if len(b) >= 28 and b.startswith(b"RIFF") and b[8:12] == b"WAVE":
        return struct.unpack("<I", b[24:28])[0]
    return None


def sniff_mime(b: bytes | None) -> str | None:
    return _sniff(b)


def image_dimensions(b: bytes) -> tuple[int, int] | None:
    return _png_dims(b) or _jpeg_dims(b)


def wav_sample_rate(b: bytes) -> int | None:
    return _wav_rate(b)


def attach_media_metadata(
    df: DataFrame, bytes_col: str = "content", keep_cols: list[str] | None = None
) -> DataFrame:
    """Add a typed metadata struct per media blob via ``mapInPandas``
    (Arrow-batched; binary never leaves the executor)."""
    keep = keep_cols if keep_cols is not None else [c for c in df.columns]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in keep
    )
    out_schema += (
        ", meta struct<mime:string, size_bytes:bigint, width:int, "
        "height:int, sample_rate:int>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for b in pdf[bytes_col]:
                b = bytes(b) if b is not None else None
                dims = image_dimensions(b) if b else None
                metas.append(
                    {
                        "mime": _sniff(b),
                        "size_bytes": len(b) if b is not None else None,
                        "width": dims[0] if dims else None,
                        "height": dims[1] if dims else None,
                        "sample_rate": _wav_rate(b) if b else None,
                    }
                )
            out = pdf[[c for c in pdf.columns if c in keep]].copy()
            out["meta"] = metas
            yield out

    return df.mapInPandas(run, out_schema)


def decode_image(df: DataFrame, bytes_col: str = "content") -> DataFrame:
    """Full pixel decode — NOT IMPLEMENTED in this container (no PIL/cv2).

    The call signature and output schema are the contract a codec-equipped
    deployment fills in: mapInPandas over (id, content) → (id, width,
    height, channels, pixels array<float>).
    """
    raise NotImplementedError(
        "decode_image requires an image codec library (PIL/opencv); "
        "this environment ships none. Use attach_media_metadata for "
        "header-level fields or image_features for the deterministic "
        "fake embedding."
    )


def image_features(
    df: DataFrame, bytes_col: str = "content", id_col: str = "id", dims: int = 16
) -> DataFrame:
    """DETERMINISTIC FAKE feature vector (md5-chain of the bytes) standing in
    for a real encoder; exercises the array<float> similarity plumbing
    end-to-end with stable values."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[bytes_col]:
                if b is None:
                    feats.append(None)
                    continue
                h = hashlib.md5(bytes(b)).digest()
                vals = []
                while len(vals) < dims:
                    h = hashlib.md5(h).digest()
                    vals.extend((x - 128) / 128.0 for x in h)
                feats.append(vals[:dims])
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.mapInPandas(run, f"{id_col} long, features array<float>")
