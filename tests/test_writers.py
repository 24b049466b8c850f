"""Writer round-trip tests: df → format text → reader → identical records."""

from __future__ import annotations

from exon_duckdb_spark.sources.fasta import read_fasta
from exon_duckdb_spark.sources.fastq import read_fastq
from exon_duckdb_spark.sources.tsv import read_gff
from exon_duckdb_spark.sources.writers import to_fasta, to_fastq, to_gff


def test_fasta_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "description", "ATCG"), ("b", None, "GGCC")],
        "id string, description string, sequence string",
    )
    out = str(tmp_path / "out_fasta")
    to_fasta(df, out)
    back = read_fasta(spark, out)
    assert sorted(tuple(r) for r in back.collect()) == [
        ("a", "description", "ATCG"),
        ("b", None, "GGCC"),
    ]


def test_fastq_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("r1", "desc", "ACGT", "!!!!"), ("r2", None, "GGTT", "IIII")],
        "name string, description string, sequence string, quality_scores string",
    )
    out = str(tmp_path / "out_fastq")
    to_fastq(df, out)
    back = read_fastq(spark, out)
    assert sorted(tuple(r) for r in back.collect()) == [
        ("r1", "desc", "ACGT", "!!!!"),
        ("r2", None, "GGTT", "IIII"),
    ]


def test_gff_roundtrip(spark, tmp_path):
    from exon_duckdb_spark.sources.tsv import read_gff as _rg

    src = (
        "sq0\tcaat\tgene\t8\t13\t.\t+\t.\tgene_id=caat1;gene_name=gene0\n"
        "sq1\tcaat\tgene\t8\t14\t0.1\t+\t0\tgene_id=caat2\n"
    )
    p = tmp_path / "in.gff"
    p.write_text(src)
    df = _rg(spark, str(p))
    out = str(tmp_path / "out_gff")
    to_gff(df, out)
    back = read_gff(spark, out)
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b
