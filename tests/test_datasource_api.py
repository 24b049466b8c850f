"""Python DataSource API registration: spark.read.format("fasta") etc."""

from __future__ import annotations

import gzip

import pytest

from exon_duckdb_spark.sources.datasource import register_bio_sources

FASTA = ">a description\nATCG\n>b\nATCG\n"
FASTQ = (
    "@SEQ_ID This is a description\nGATTTGGGGT\n+\n!''*((((**\n"
    "@SEQ_ID2\nGATTTGGGGT\n+\n!''*((((**\n"
)


@pytest.fixture(scope="module")
def registered(spark):
    register_bio_sources(spark)
    return spark


def test_fasta_format(registered, tmp_path):
    p = tmp_path / "t.fasta"
    p.write_text(FASTA)
    df = registered.read.format("fasta").load(str(p))
    assert df.columns == ["id", "description", "sequence"]
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [("a", "description", "ATCG"), ("b", None, "ATCG")]


def test_fasta_format_gzip(registered, tmp_path):
    p = tmp_path / "t.fasta.gz"
    with gzip.open(p, "wt") as f:
        f.write(FASTA)
    assert registered.read.format("fasta").load(str(p)).count() == 2


def test_fastq_format_projection(registered, tmp_path):
    p = tmp_path / "t.fastq"
    p.write_text(FASTQ)
    df = registered.read.format("fastq").load(str(p)).select("name", "sequence")
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [("SEQ_ID", "GATTTGGGGT"), ("SEQ_ID2", "GATTTGGGGT")]


def test_directory_load(registered, tmp_path):
    d = tmp_path / "dir"
    d.mkdir()
    (d / "a.fasta").write_text(FASTA)
    (d / "b.fasta").write_text(FASTA)
    assert registered.read.format("fasta").load(str(d)).count() == 4
