"""File-split planning for record-oriented readers.

The reference streams one Arrow batch pipeline per file
(rust/src/arrow_reader.rs:39-166 — single stream, consumer-side parallelism
only). Spark's unit of parallelism is the file split: the driver plans
(path, start, length) ranges, executors parse their range only — so a
100 TB directory fans out across the cluster with no driver data path.

Record-boundary rule: a split parses records that *begin* at-or-after its
start offset and continues past its end until the record closes (the
standard Hadoop input-split convention). Compressed files (gzip/zstd) are
unsplittable → one split per file, same as the reference's per-file stream.
"""

from __future__ import annotations

import glob as _glob
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SPLIT_BYTES = 128 * 1024 * 1024

COMPRESSION_EXTS = {".gz": "gzip", ".gzip": "gzip", ".zst": "zstd", ".zstd": "zstd"}


@dataclass(frozen=True)
class FileSplit:
    path: str
    start: int
    length: int
    compression: str | None  # None = plain


def detect_compression(path: str, compression: str | None = "auto_detect") -> str | None:
    """Mirror the reference's extension sniffing
    (rust/src/arrow_reader.rs:60-91): auto_detect → by extension, or an
    explicit 'gzip'/'zstd'/'none'."""
    if compression in (None, "none", ""):
        return None
    if compression != "auto_detect":
        if compression not in ("gzip", "zstd"):
            raise ValueError(f"unsupported compression: {compression!r}")
        return compression
    ext = os.path.splitext(path)[1].lower()
    return COMPRESSION_EXTS.get(ext)


def expand_paths(path: str | list[str]) -> list[str]:
    """Path(s) → file list. A directory scans every file in it (reference:
    directory scans in test_fasta_scan.test:55-59); globs are expanded.

    Local filesystem implementation; on a cluster deployment swap this for
    the Hadoop FileSystem listing — the split planning below is unchanged.
    """
    paths = [path] if isinstance(path, str) else list(path)
    out: list[str] = []
    for p in paths:
        p = p.removeprefix("file://")
        if os.path.isdir(p):
            # Hadoop hidden-file convention: _SUCCESS markers and .crc
            # checksums are not data.
            out.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p))
                if os.path.isfile(os.path.join(p, f)) and not f.startswith((".", "_"))
            )
        elif any(c in p for c in "*?["):
            hits = sorted(_glob.glob(p))
            if not hits:
                raise FileNotFoundError(f"no files match {p!r}")
            out.extend(hits)
        else:
            if not os.path.isfile(p):
                raise FileNotFoundError(f"no such file: {p!r}")
            out.append(p)
    if not out:
        raise FileNotFoundError(f"no input files under {path!r}")
    return out


def plan_splits(
    path: str | list[str],
    compression: str | None = "auto_detect",
    split_bytes: int = DEFAULT_SPLIT_BYTES,
    splittable: bool = True,
) -> list[FileSplit]:
    splits: list[FileSplit] = []
    for f in expand_paths(path):
        comp = detect_compression(f, compression)
        size = os.path.getsize(f)
        if comp is not None or not splittable or size <= split_bytes:
            splits.append(FileSplit(f, 0, size, comp))
        else:
            off = 0
            while off < size:
                splits.append(FileSplit(f, off, min(split_bytes, size - off), comp))
                off += split_bytes
    return splits


def splits_df(spark: SparkSession, splits: list[FileSplit]) -> DataFrame:
    """One row per split, repartitioned so each split is its own task."""
    df = spark.createDataFrame(
        [(s.path, s.start, s.length, s.compression) for s in splits],
        "path string, start long, length long, compression string",
    )
    return df.repartition(max(len(splits), 1))


def open_maybe_compressed(path: str, compression: str | None):
    """Binary file object for a (possibly compressed) file."""
    if compression == "gzip":
        import gzip

        return gzip.open(path, "rb")
    if compression == "zstd":
        try:
            import zstandard
        except ImportError as e:  # container has no zstd bindings
            raise NotImplementedError(
                "zstd compression requires the 'zstandard' package"
            ) from e
        return zstandard.ZstdDecompressor().stream_reader(open(path, "rb"))
    return open(path, "rb")
