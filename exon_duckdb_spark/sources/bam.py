"""BAM source — pure-Python parser over the public BAM/BGZF spec
(samtools hts-specs), producing the reference's 10 SAM columns.

Parity: reference ``read_bam_file_records`` / ``bam_query`` (exon crate via
noodles; same 10 columns as SAM per test_bam_record_scan.test:6-16).

BGZF is a series of gzip members — stdlib gzip decodes the concatenation
transparently, so no external bio libraries are needed. BAM files are one
split each (random access needs the BGZF block index; with a .bai the
planned upgrade is chunk-level splits). ``bam_query`` applies the region
overlap predicate after the scan — identical semantics to the reference's
index-backed query (the index only prunes I/O).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from exon_duckdb_spark.sources.reader_core import make_reader
from exon_duckdb_spark.sources.schemas import SAM_SCHEMA
from exon_duckdb_spark.sources.splits import FileSplit, open_maybe_compressed
from exon_duckdb_spark.sources.vcf import parse_region

__all__ = ["read_bam", "bam_query"]

_CIGAR_OPS = "MIDNSHP=X"
_SEQ_CODES = "=ACMGRSVTWYHKDBN"
_REF_CONSUMING = {0, 2, 3, 7, 8}  # M, D, N, =, X


def _parse_bam_split(split: FileSplit) -> Iterator[dict]:
    comp = split.compression or "gzip"  # .bam is BGZF regardless of extension
    with open_maybe_compressed(split.path, comp) as f:
        magic = f.read(4)
        if magic != b"BAM\x01":
            raise ValueError(f"{split.path}: not a BAM file (bad magic {magic!r})")
        (l_text,) = struct.unpack("<i", f.read(4))
        f.read(l_text)  # header text (SAM header)
        (n_ref,) = struct.unpack("<i", f.read(4))
        refs: list[str] = []
        for _ in range(n_ref):
            (l_name,) = struct.unpack("<i", f.read(4))
            name = f.read(l_name)[:-1].decode()
            f.read(4)  # l_ref
            refs.append(name)

        while True:
            head = f.read(4)
            if len(head) < 4:
                return
            (block_size,) = struct.unpack("<i", head)
            rec = f.read(block_size)
            if len(rec) < block_size:
                return
            yield _decode_record(rec, refs)


def _decode_record(rec: bytes, refs: list[str]) -> dict:
    (
        ref_id,
        pos,
        l_read_name,
        mapq,
        _bin,
        n_cigar,
        flag,
        l_seq,
        next_ref_id,
        next_pos,
        _tlen,
    ) = struct.unpack_from("<iiBBHHHiiii", rec, 0)
    off = 32
    name = rec[off : off + l_read_name - 1].decode()
    off += l_read_name

    cigar_ops = struct.unpack_from(f"<{n_cigar}I", rec, off)
    off += 4 * n_cigar
    cigar = "".join(f"{c >> 4}{_CIGAR_OPS[c & 0xF]}" for c in cigar_ops) or None
    ref_len = sum(c >> 4 for c in cigar_ops if (c & 0xF) in _REF_CONSUMING)

    n_seq_bytes = (l_seq + 1) // 2
    seq_packed = rec[off : off + n_seq_bytes]
    off += n_seq_bytes
    seq_chars = []
    for i in range(l_seq):
        b = seq_packed[i // 2]
        code = (b >> 4) if i % 2 == 0 else (b & 0xF)
        seq_chars.append(_SEQ_CODES[code])
    sequence = "".join(seq_chars) or None

    qual = rec[off : off + l_seq]
    quality = (
        None
        if not l_seq or (qual and qual[0] == 0xFF)
        else "".join(chr(q + 33) for q in qual)
    )

    reference = refs[ref_id] if 0 <= ref_id < len(refs) else None
    mate_reference = refs[next_ref_id] if 0 <= next_ref_id < len(refs) else None
    start = pos + 1 if pos >= 0 else None
    end = start + ref_len - 1 if (start is not None and ref_len > 0) else None
    return {
        "name": name,
        "flag": flag,
        "reference": reference,
        "start": start,
        "end": end,
        "mapping_quality": str(mapq),
        "cigar": cigar,
        "mate_reference": mate_reference,
        "sequence": sequence,
        "quality_score": quality,
    }


def read_bam(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """BAM alignments as the 10-column SAM DataFrame."""
    return make_reader(
        spark, path, SAM_SCHEMA, _parse_bam_split, compression="none", splittable=False
    )


def bam_query(spark: SparkSession, path: str, region: str) -> DataFrame:
    """Region query over BAM — reference ``bam_query(path, region)``
    (rust/src/bam_query_reader.rs:63): alignments overlapping the 1-based
    inclusive region."""
    from pyspark.sql import functions as F

    df = read_bam(spark, path)
    chrom, r_start, r_end = parse_region(region)
    cond = df.reference == chrom
    if r_start is not None:
        cond = cond & (df.end >= r_start)
    if r_end is not None:
        cond = cond & (df.start <= r_end)
    return df.where(cond)
