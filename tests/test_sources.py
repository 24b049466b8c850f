"""Reader golden tests. Fixture files are synthesized from the golden rows
documented in FIXTURES.md / SURVEY §1.3 (same values the reference's
sqllogictests assert), not copied from the reference repo."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from exon_duckdb_spark.sources.fasta import read_fasta
from exon_duckdb_spark.sources.fastq import read_fastq
from exon_duckdb_spark.sources.tsv import (
    read_bed,
    read_gff,
    read_gtf,
    read_hmm_dom_tbl,
    read_sam,
)
from exon_duckdb_spark.sources.vcf import read_vcf, vcf_query

FASTA = ">a description\nATCG\n>b\nATCG\n"
FASTQ = (
    "@SEQ_ID This is a description\nGATTTGGGGT\n+\n!''*((((**\n"
    "@SEQ_ID2\nGATTTGGGGT\n+\n!''*((((**\n"
)
GFF = (
    "#comment line\n"
    "sq0\tcaat\tgene\t8\t13\t.\t+\t.\tgene_id=caat1;gene_name=gene0\n"
    "sq1\tcaat\tgene\t8\t14\t0.1\t+\t0\tgene_id=caat2;gene_name=gene0\n"
)
GTF = (
    'chr1\tprocessed_transcript\texon\t11869\t12227\t.\t+\t.\t'
    'gene_id "ENSG00000223972"; transcript_id "ENST00000456328";\n'
)
BED = "sq0\t7\t13\t.\t0\t.\t7\t13\t0\t2\t2,1\t0,3\n"
SAM = (
    "@HD\tVN:1.6\n"
    "@SQ\tSN:ref1\tLN:1000\n"
    "ref1_grp1_p001\t99\tref1\t1\t0\t10M\t=\t41\t50\tCGAGCTCGGT\t!!!!!!!!!!\n"
)
VCF = (
    "##fileformat=VCFv4.2\n"
    '##INFO=<ID=INDEL,Number=0,Type=Flag,Description="Is indel">\n'
    '##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">\n'
    '##INFO=<ID=DP4,Number=4,Type=Integer,Description="Depths">\n'
    '##INFO=<ID=AC,Number=A,Type=Integer,Description="Allele counts">\n'
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
    "1\t9999919\t.\tG\t<*>\t0\t.\tDP=1;DP4=0,1,0,0\tPL:DP\t0,3,23:1\n"
    "1\t10000000\trs1\tAT\tA,ATT\t12.5\tPASS\tINDEL;DP=8;AC=3,5\tPL:DP\t0,3,23:8\n"
)
HMM = (
    "#                                          --- full sequence --- \n"
    "KanNP_1 -  40 BPD_transp_2 PF02653.11 267 1.1e-09 33.7 0.0 1 1 "
    "2.2e-13 1.4e-09 33.4 0.0 175 220 2 39 1 40 0.87 hypothetical protein\n"
)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bio")
    (d / "test.fasta").write_text(FASTA)
    with gzip.open(d / "test.fasta.gz", "wt") as f:
        f.write(FASTA)
    (d / "test.fastq").write_text(FASTQ)
    (d / "test.gff").write_text(GFF)
    (d / "test.gtf").write_text(GTF)
    (d / "test.bed").write_text(BED)
    (d / "test.sam").write_text(SAM)
    (d / "test.vcf").write_text(VCF)
    (d / "test.hmmout").write_text(HMM)
    return d


class TestFasta:
    def test_golden(self, spark, data_dir):
        rows = read_fasta(spark, str(data_dir / "test.fasta")).orderBy("id").collect()
        assert [tuple(r) for r in rows] == [
            ("a", "description", "ATCG"),
            ("b", None, "ATCG"),
        ]

    def test_gzip_auto(self, spark, data_dir):
        df = read_fasta(spark, str(data_dir / "test.fasta.gz"))
        assert df.count() == 2

    def test_gzip_explicit(self, spark, data_dir):
        df = read_fasta(spark, str(data_dir / "test.fasta.gz"), compression="gzip")
        assert df.count() == 2

    def test_directory_scan(self, spark, data_dir):
        # directory scan counts all fasta files (4 records over 2 files)
        d = data_dir / "fasta_dir"
        d.mkdir(exist_ok=True)
        (d / "one.fasta").write_text(FASTA)
        (d / "two.fasta").write_text(FASTA)
        assert read_fasta(spark, str(d)).count() == 4

    def test_filter_pushes_to_source(self, spark, data_dir):
        df = read_fasta(spark, str(data_dir / "test.fasta")).filter(F.col("id") == "a")
        assert df.count() == 1

    def test_missing_file(self, spark, data_dir):
        with pytest.raises(FileNotFoundError):
            read_fasta(spark, str(data_dir / "nope.fasta"))

    def test_split_boundaries(self, spark, data_dir):
        # many records, tiny split size → every record exactly once
        many = "".join(f">r{i} d{i}\n" + "ACGT" * 8 + "\n" for i in range(200))
        p = data_dir / "many.fasta"
        p.write_text(many)
        df = read_fasta(spark, str(p), split_bytes=256)
        assert df.count() == 200
        assert df.select("id").distinct().count() == 200


class TestFastq:
    def test_golden(self, spark, data_dir):
        rows = read_fastq(spark, str(data_dir / "test.fastq")).orderBy("name").collect()
        assert [tuple(r) for r in rows] == [
            ("SEQ_ID", "This is a description", "GATTTGGGGT", "!''*((((**"),
            ("SEQ_ID2", None, "GATTTGGGGT", "!''*((((**"),
        ]


class TestGff:
    def test_golden(self, spark, data_dir):
        rows = read_gff(spark, str(data_dir / "test.gff")).orderBy("seqname").collect()
        r0, r1 = rows
        assert (r0["seqname"], r0["start"], r0["end"], r0["score"], r0["phase"]) == (
            "sq0", 8, 13, None, None,
        )
        assert r0["attributes"] == {"gene_id": ["caat1"], "gene_name": ["gene0"]}
        assert r1["score"] == pytest.approx(0.1)
        assert r1["phase"] == "0"

    def test_gtf(self, spark, data_dir):
        r = read_gtf(spark, str(data_dir / "test.gtf")).collect()[0]
        assert r["start"] == 11869 and r["end"] == 12227
        assert r["frame"] is None
        assert r["attributes"]["gene_id"] == ["ENSG00000223972"]
        assert r["attributes"]["transcript_id"] == ["ENST00000456328"]


class TestBed:
    def test_golden_conversions(self, spark, data_dir):
        r = read_bed(spark, str(data_dir / "test.bed")).collect()[0]
        # 0-based 7 → 1-based 8; '.'/0-score/0-color → NULL
        assert tuple(r) == ("sq0", 8, 13, None, None, None, 8, 13, None, 2, "2,1", "0,3")


class TestSam:
    def test_golden(self, spark, data_dir):
        r = read_sam(spark, str(data_dir / "test.sam")).collect()[0]
        assert tuple(r) == (
            "ref1_grp1_p001", 99, "ref1", 1, 10, "0", "10M", "ref1",
            "CGAGCTCGGT", "!!!!!!!!!!",
        )


class TestVcf:
    def test_header_driven_info(self, spark, data_dir):
        df = read_vcf(spark, str(data_dir / "test.vcf"))
        assert [f.name for f in df.schema["info"].dataType.fields] == [
            "INDEL", "DP", "DP4", "AC",
        ]
        rows = df.orderBy("pos").collect()
        r0, r1 = rows
        assert (r0["chrom"], r0["pos"], r0["ref"], r0["alt"], r0["qual"]) == (
            "1", 9999919, "G", ["<*>"], 0.0,
        )
        assert r0["info"]["INDEL"] is False and r0["info"]["DP"] == 1
        assert r0["info"]["DP4"] == [0, 1, 0, 0]
        assert r1["info"]["INDEL"] is True
        assert r1["info"]["AC"] == [3, 5]
        assert r1["id"] == "rs1" and r1["filter"] == "PASS"
        assert r1["genotypes"] == ["0,3,23:8"]

    def test_vcf_query_region(self, spark, data_dir):
        p = str(data_dir / "test.vcf")
        assert vcf_query(spark, p, "1").count() == 2
        assert vcf_query(spark, p, "1:9999919-9999919").count() == 1
        assert vcf_query(spark, p, "2").count() == 0
        # record 2 spans 10000000-10000001 (ref 'AT')
        assert vcf_query(spark, p, "1:10000001-10000005").count() == 1


class TestHmm:
    def test_golden(self, spark, data_dir):
        r = read_hmm_dom_tbl(spark, str(data_dir / "test.hmmout")).collect()[0]
        assert r["target_name"] == "KanNP_1"
        assert r["tlen"] == 40
        assert r["query_accession"] == "PF02653.11"
        assert r["evalue"] == pytest.approx(1.1e-09)
        assert r["acc"] == pytest.approx(0.87)
        assert r["description"] == "hypothetical protein"


class TestRound5SourceHardening:
    def test_sam_quote_character_preserved(self, spark, tmp_path):
        """Round-5 review: Spark CSV's default quote char silently
        stripped '\"' from fields — a quality string like '\"II\"'
        (legal Phred+33) lost two characters with no error."""
        from exon_duckdb_spark.sources.tsv import read_sam

        p = tmp_path / "q.sam"
        p.write_text('@HD\tVN:1.6\nr1\t0\tchr1\t10\t60\t4M\t*\t0\t0\tACGT\t"II"\n')
        row = read_sam(spark, str(p)).collect()[0]
        assert row["quality_score"] == '"II"'

    def test_gff_fasta_trailer_dropped(self, spark, tmp_path):
        """A spec-conformant GFF3 '##FASTA' trailer must not produce junk
        feature rows (sequence lines parse as 1-field rows)."""
        from exon_duckdb_spark.sources.tsv import read_gff, read_gff_raw

        p = tmp_path / "x.gff"
        p.write_text(
            "chr1\tsrc\tgene\t1\t10\t.\t+\t.\tID=a\n"
            "##FASTA\n>chr1\nACGTACGTACGT\nACGT\n"
        )
        assert read_gff(spark, str(p)).count() == 1
        assert read_gff_raw(spark, str(p)).count() == 1

    def test_genbank_titles_and_truncated_record(self, spark, tmp_path):
        """REFERENCE/TITLE blocks populate the titles column (was always
        NULL) and a final record missing its '//' terminator still
        yields."""
        from exon_duckdb_spark.sources.genbank import read_genbank

        p = tmp_path / "x.gb"
        p.write_text(
            "LOCUS       AB1 20 bp DNA linear VRT 01-AUG-2013\n"
            "REFERENCE   1  (bases 1 to 20)\n"
            "  TITLE     Genome of the\n"
            "            example organism\n"
            "  JOURNAL   Nature 1 (2013)\n"
            "ORIGIN\n        1 gttaatgtag\n//\n"
            "LOCUS       TRUNC 10 bp DNA linear VRT 01-AUG-2013\n"
            "ORIGIN\n        1 acgt\n"
        )
        rows = {r["name"]: r for r in read_genbank(spark, str(p)).collect()}
        assert rows["AB1"]["titles"] == "Genome of the example organism"
        assert rows["TRUNC"]["sequence"] == "acgt"
