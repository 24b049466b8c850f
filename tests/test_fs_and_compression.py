"""Compression matrix (.gz/.zst via pyarrow's codec) + filesystem-URI path
(pyarrow.fs) — reference: compression sniffing rust/src/arrow_reader.rs:60-91,
.gz/.zst scan variants test_fasta_scan.test:10-47; object stores registered
per-URI arrow_reader.rs:108. file:// routes through the same
FileSystem.from_uri seam as s3://gs://, so a green file:// run proves the
remote path is config-only.
"""

from __future__ import annotations

import gzip

import pyarrow as pa
import pytest

from exon_duckdb_spark.sources.bam import read_bam
from exon_duckdb_spark.sources.fasta import read_fasta
from exon_duckdb_spark.sources.fastq import read_fastq
from exon_duckdb_spark.sources.splits import (
    expand_paths,
    file_size,
    open_binary,
    path_exists,
)

FASTA = ">a desc1\nACGT\n>b\nGGCCAA\n>c x\nTTTT\n"
FASTQ = "@r1 d\nACGT\n+\nIIII\n@r2\nGGCC\n+\nJJJJ\n"


def _golden_fasta(spark, path):
    rows = sorted(map(tuple, read_fasta(spark, path).collect()))
    assert rows == [("a", "desc1", "ACGT"), ("b", None, "GGCCAA"), ("c", "x", "TTTT")]


def test_fasta_gzip(spark, tmp_path):
    p = tmp_path / "x.fasta.gz"
    p.write_bytes(gzip.compress(FASTA.encode()))
    _golden_fasta(spark, str(p))


def test_fasta_zstd(spark, tmp_path):
    p = tmp_path / "x.fasta.zst"
    p.write_bytes(pa.Codec("zstd").compress(FASTA.encode(), asbytes=True))
    _golden_fasta(spark, str(p))


def test_fastq_zstd(spark, tmp_path):
    p = tmp_path / "x.fastq.zstd"
    p.write_bytes(pa.Codec("zstd").compress(FASTQ.encode(), asbytes=True))
    rows = sorted(map(tuple, read_fastq(spark, str(p)).collect()))
    assert rows == [("r1", "d", "ACGT", "IIII"), ("r2", None, "GGCC", "JJJJ")]


def test_mixed_compression_dir(spark, tmp_path):
    """One directory holding plain + .gz + .zst files of the same format."""
    (tmp_path / "a.fasta").write_text(FASTA)
    (tmp_path / "b.fasta.gz").write_bytes(gzip.compress(FASTA.encode()))
    (tmp_path / "c.fasta.zst").write_bytes(
        pa.Codec("zstd").compress(FASTA.encode(), asbytes=True)
    )
    assert read_fasta(spark, str(tmp_path)).count() == 9


class TestFileUri:
    """file:// exercises the pyarrow.fs code path end-to-end."""

    def test_helpers(self, tmp_path):
        p = tmp_path / "f.bin"
        p.write_bytes(b"hello world")
        uri = f"file://{p}"
        assert path_exists(uri) and not path_exists(uri + ".nope")
        assert file_size(uri) == 11
        with open_binary(uri) as f:
            f.seek(6)
            assert f.read(5) == b"world"

    def test_expand_dir_uri(self, tmp_path):
        (tmp_path / "a.fasta").write_text(FASTA)
        (tmp_path / "b.fasta").write_text(FASTA)
        (tmp_path / "_SUCCESS").write_text("")
        got = expand_paths(f"file://{tmp_path}")
        assert [g.rsplit("/", 1)[1] for g in got] == ["a.fasta", "b.fasta"]
        assert all(g.startswith("file:///") for g in got)

    def test_fasta_over_uri(self, spark, tmp_path):
        p = tmp_path / "x.fasta"
        p.write_text(FASTA)
        _golden_fasta(spark, f"file://{p}")

    def test_fasta_zstd_over_uri(self, spark, tmp_path):
        p = tmp_path / "x.fasta.zst"
        p.write_bytes(pa.Codec("zstd").compress(FASTA.encode(), asbytes=True))
        _golden_fasta(spark, f"file://{p}")

    def test_bam_split_reader_over_uri(self, spark, tmp_path):
        """Byte-range BGZF reader (seek + read) through the FS seam."""
        from pyspark.sql import functions as F

        from exon_duckdb_spark.sources.writers import to_bam

        d = spark.range(60).select(
            F.col("id").cast("string").alias("name"),
            F.lit(0).cast("int").alias("flag"),
            F.lit("chrA").alias("reference"),
            (F.col("id") + 1).alias("start"),
            F.lit("60").alias("mapping_quality"),
            F.lit("4M").alias("cigar"),
            F.lit(None).cast("string").alias("mate_reference"),
            F.lit("ACGT").alias("sequence"),
            F.lit("IIII").alias("quality_score"),
        )
        out = str(tmp_path / "bams")
        to_bam(d, out, [("chrA", 10_000)])
        plain = sorted(r["name"] for r in read_bam(spark, out).collect())
        via_uri = sorted(
            r["name"] for r in read_bam(spark, f"file://{out}", split_bytes=300).collect()
        )
        assert via_uri == plain and len(plain) == 60


@pytest.mark.parametrize("ext,codec", [("gz", "gzip"), ("zst", "zstd")])
def test_detect_compression(ext, codec):
    from exon_duckdb_spark.sources.splits import detect_compression

    assert detect_compression(f"a.fasta.{ext}") == codec
    assert detect_compression("a.fasta") is None
