"""Index builders (.bai/.tbi/.csi): pruning fires and never changes results."""

from __future__ import annotations

import shutil

from exon_duckdb_spark.sources.bam import bam_query, plan_bam_query_splits
from exon_duckdb_spark.sources.bcf import bcf_query, plan_bcf_query_splits
from exon_duckdb_spark.sources.bgzf import bgzf_compress
from exon_duckdb_spark.sources.indexes import index_bam, index_bcf, index_vcf
from exon_duckdb_spark.sources.splits import plan_splits
from exon_duckdb_spark.sources.vcf import plan_vcf_query_splits, vcf_query
from exon_duckdb_spark.sources.writers import _render_bam, _render_bcf

N = 300
REGION = "chr2:30000-60000"


def _bam_fixture(tmp_path):
    p = str(tmp_path / "x.bam")
    refs = [("chr1", 1_000_000), ("chr2", 1_000_000)]
    rows = [
        {
            "name": f"r{i}", "flag": 0, "reference": f"chr{i % 2 + 1}",
            "start": i * 500 + 1, "mapping_quality": "60", "cigar": "10M",
            "mate_reference": None, "sequence": "ACGTACGTAC",
            "quality_score": "IIIIIIIIII",
        }
        for i in range(N)
    ]
    rows.sort(key=lambda r: (r["reference"], r["start"]))  # coordinate-sorted
    with open(p, "wb") as f:
        f.write(_render_bam(rows, refs, block_bytes=256))
    return p


def test_index_bam_prunes_and_matches(spark, tmp_path):
    p = _bam_fixture(tmp_path)
    noidx = str(tmp_path / "noidx.bam")
    shutil.copy(p, noidx)
    index_bam(p)
    total = plan_splits(p, "none", splittable=True, split_bytes=400)
    pruned = plan_bam_query_splits(p, REGION, split_bytes=400)
    assert len(total) > 6
    assert 0 < len(pruned) < len(total) / 2
    a = sorted(r["name"] for r in bam_query(spark, p, REGION).collect())
    b = sorted(r["name"] for r in bam_query(spark, noidx, REGION).collect())
    assert a == b and len(a) >= 10


def test_index_vcf_prunes_and_matches(spark, tmp_path):
    p = str(tmp_path / "x.vcf.gz")
    header = (
        "##fileformat=VCFv4.2\n"
        '##INFO=<ID=DP,Number=1,Type=Integer,Description="d">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
    )
    recs = sorted((f"chr{i % 2 + 1}", i * 500 + 1, i) for i in range(N))
    body = "".join(
        f"{c}\t{pos}\trs{i}\tA\tT\t.\t.\tDP={i}\n" for c, pos, i in recs
    )
    with open(p, "wb") as f:
        f.write(bgzf_compress((header + body).encode(), block_bytes=256))
    noidx = str(tmp_path / "noidx.vcf.gz")
    shutil.copy(p, noidx)
    index_vcf(p)
    total = plan_splits(p, "none", splittable=True, split_bytes=400)
    pruned = plan_vcf_query_splits(p, REGION, split_bytes=400)
    assert len(total) > 6
    assert pruned is not None and 0 < len(pruned) < len(total) / 2
    a = sorted(r["pos"] for r in vcf_query(spark, p, REGION).collect())
    b = sorted(r["pos"] for r in vcf_query(spark, noidx, REGION).collect())
    assert a == b and len(a) >= 10


def test_index_bcf_prunes_and_matches(spark, tmp_path):
    p = str(tmp_path / "x.bcf")
    contigs = ["chr1", "chr2"]
    header = (
        "##fileformat=VCFv4.2\n"
        '##FILTER=<ID=PASS,Description="ok",IDX=0>\n'
        '##INFO=<ID=DP,Number=1,Type=Integer,Description="d",IDX=1>\n'
        "##contig=<ID=chr1,length=1000000,IDX=0>\n"
        "##contig=<ID=chr2,length=1000000,IDX=1>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
    )
    rows = [
        {
            "chrom": f"chr{i % 2 + 1}", "pos": i * 500 + 1, "id": f"rs{i}",
            "ref": "A", "alt": ["T"], "qual": 1.0, "DP": i,
        }
        for i in range(N)
    ]
    rows.sort(key=lambda r: (r["chrom"], r["pos"]))  # coordinate-sorted
    with open(p, "wb") as f:
        f.write(_render_bcf(rows, header, {"chr1": 0, "chr2": 1}, {"DP": 1},
                            block_bytes=256))
    noidx = str(tmp_path / "noidx.bcf")
    shutil.copy(p, noidx)
    index_bcf(p)
    total = plan_splits(p, "none", splittable=True, split_bytes=400)
    pruned = plan_bcf_query_splits(p, REGION, split_bytes=400)
    assert len(total) > 6
    assert 0 < len(pruned) < len(total) / 2
    a = sorted(r["pos"] for r in bcf_query(spark, p, REGION).collect())
    b = sorted(r["pos"] for r in bcf_query(spark, noidx, REGION).collect())
    assert a == b and len(a) >= 10
