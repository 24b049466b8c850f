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


def test_bam_writer_roundtrip_split_invariant(spark, tmp_path):
    """to_bam → read_bam round trip, identical across split sizes."""
    from pyspark.sql import functions as F

    from exon_duckdb_spark.sources.bam import read_bam
    from exon_duckdb_spark.sources.writers import to_bam

    d = spark.range(40).select(
        F.col("id").cast("string").alias("name"),
        (F.col("id") % 4096).cast("int").alias("flag"),
        F.when(F.col("id") % 5 != 0, F.lit("chrA")).alias("reference"),
        F.when(F.col("id") % 5 != 0, F.col("id") + 1).alias("start"),
        F.lit("37").alias("mapping_quality"),
        F.when(F.col("id") % 5 != 0, F.lit("4M2I3D1S")).alias("cigar"),
        F.lit(None).cast("string").alias("mate_reference"),
        F.lit("ACGTACGTAC").alias("sequence"),
        F.lit("IIIIIIIIII").alias("quality_score"),
    )
    out = str(tmp_path / "bam_out")
    assert to_bam(d, out, [("chrA", 1000), ("chrB", 500)]) == 40
    base = sorted(map(tuple, read_bam(spark, out).collect()))
    assert len(base) == 40
    # 4M2I3D1S consumes 4+3 reference bases
    mapped = [dict(zip(read_bam(spark, out).columns, t)) for t in base]
    m = [x for x in mapped if x["reference"] == "chrA"][0]
    assert m["end"] == m["start"] + 7 - 1
    for sb in (200, 1 << 20):
        got = sorted(map(tuple, read_bam(spark, out, split_bytes=sb).collect()))
        assert got == base


def test_bcf_writer_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from exon_duckdb_spark.sources.bcf import read_bcf
    from exon_duckdb_spark.sources.writers import to_bcf

    d = spark.range(30).select(
        F.lit("ctg1").alias("chrom"),
        (F.col("id") * 100 + 1).alias("pos"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("id"),
        F.lit("ACGT").alias("ref"),  # >1 char: rlen = 4
        F.array(F.lit("A")).alias("alt"),
        F.when(F.col("id") % 2 == 0, F.col("id") * 1.0 + 0.5).alias("qual"),
        (F.col("id") % 42).cast("int").alias("DP"),
    )
    header = (
        "##fileformat=VCFv4.2\n"
        '##FILTER=<ID=PASS,Description="ok",IDX=0>\n'
        '##INFO=<ID=DP,Number=1,Type=Integer,Description="d",IDX=1>\n'
        "##contig=<ID=ctg1,length=100000,IDX=0>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
    )
    out = str(tmp_path / "bcf_out")
    assert to_bcf(d, out, header, ["ctg1"], {"DP": 1}) == 30
    rows = sorted(read_bcf(spark, out).collect(), key=lambda r: r["pos"])
    assert len(rows) == 30
    assert rows[3]["pos"] == 301 and rows[3]["ref"] == "ACGT"
    assert rows[3]["alt"] == ["A"] and rows[3]["info"]["DP"] == 3
    assert rows[3]["qual"] is None and rows[4]["qual"] == 4.5
