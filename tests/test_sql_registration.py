"""SQL-surface registration tests: every SQL UDF must agree with its Column
twin, and the reference's SQL statements must run verbatim."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import exon_duckdb_spark.functions as fx
from exon_duckdb_spark.functions.register import register_all

SEQS = ["ATCG", "GGGG", "", "ATG", "ATGTAA", None, "ACGTACGTA"]


@pytest.fixture(scope="module")
def sql_spark(spark):
    register_all(spark)
    return spark


def _pairs(sql_spark, inputs, sql_expr, col):
    df = sql_spark.createDataFrame([(x,) for x in inputs], "s string")
    got_sql = [r[0] for r in df.selectExpr(sql_expr).collect()]
    got_col = [r[0] for r in df.select(col).collect()]
    return got_sql, got_col


@pytest.mark.parametrize(
    "sql_expr,col_fn",
    [
        ("gc_content(s)", lambda: fx.gc_content("s")),
        ("complement(s)", lambda: fx.complement("s")),
        ("reverse_complement(s)", lambda: fx.reverse_complement("s")),
        ("reverse_complement_strict(s)", lambda: fx.reverse_complement_strict("s")),
        ("transcribe(s)", lambda: fx.transcribe("s")),
    ],
)
def test_sequence_sql_matches_column(sql_spark, sql_expr, col_fn):
    got_sql, got_col = _pairs(sql_spark, SEQS, sql_expr, col_fn())
    assert got_sql == got_col


def test_translate_dna_to_aa_sql(sql_spark):
    inputs = ["ATGTAA", "", "AAATTTCCCGGG", None]
    got_sql, got_col = _pairs(
        sql_spark, inputs, "translate_dna_to_aa(s)", fx.translate_dna_to_aa("s")
    )
    assert got_sql == got_col == ["M*", "", "KFPG", None]


def test_quality_and_cigar_sql(sql_spark):
    row = sql_spark.sql(
        "SELECT quality_score_string_to_list('!#') AS q,"
        "       parse_cigar('1M2D3S') AS c,"
        "       cigar_reference_length('10M5I3D') AS rl,"
        "       extract_from_cigar('AACCAA', '2I2M2I') AS e,"
        "       gff_parse_attributes('ID=x;locus_tag=y;') AS g,"
        "       exondb_version() AS v"
    ).first()
    assert row["q"] == [0, 2]
    assert [(x["op"], x["len"]) for x in row["c"]] == [("M", 1), ("D", 2), ("S", 3)]
    assert row["rl"] == 13
    assert (row["e"]["sequence_start"], row["e"]["sequence_end"], row["e"]["sequence"]) == (2, 4, "CC")
    assert row["g"] == {"ID": "x", "locus_tag": "y"}
    assert row["v"] == "0.3.9"


def test_flag_predicates_sql(sql_spark):
    row = sql_spark.sql(
        "SELECT is_segmented(1) a, is_unmapped(4) b, is_supplementary(2048) c,"
        "       is_duplicate(1) d"
    ).first()
    assert (row["a"], row["b"], row["c"], row["d"]) == (True, True, True, False)


def test_sql_error_contracts(sql_spark):
    with pytest.raises(Exception, match="invalid character"):
        sql_spark.sql("SELECT complement('ABC')").collect()
    with pytest.raises(Exception, match="invalid CIGAR"):
        sql_spark.sql("SELECT parse_cigar('MMM')").collect()
    with pytest.raises(Exception, match="divisible by 3"):
        sql_spark.sql("SELECT translate_dna_to_aa('AT')").collect()


def test_alignment_sql(sql_spark):
    row = sql_spark.sql(
        "SELECT alignment_string('AACC', 'AAACC') AS s, alignment_score('AACC', 'AACC') AS c"
    ).first()
    assert row["s"] == "2M1D2M"
    assert row["c"] == 0.0


def test_read_fasta_tvf(sql_spark, tmp_path):
    p = tmp_path / "t.fasta"
    p.write_text(">a description\nATCG\n>b\nGGCC\n")
    rows = sql_spark.sql(
        f"SELECT id, gc_content(sequence) AS gc FROM read_fasta('{p}') ORDER BY id"
    ).collect()
    assert [(r["id"], r["gc"]) for r in rows] == [("a", 0.5), ("b", 1.0)]


def test_read_fastq_tvf(sql_spark, tmp_path):
    p = tmp_path / "t.fastq"
    p.write_text("@r1 d\nACGT\n+\n!!!!\n")
    rows = sql_spark.sql(
        f"SELECT name, quality_score_string_to_list(quality_scores) AS q FROM read_fastq('{p}')"
    ).collect()
    assert [(r["name"], r["q"]) for r in rows] == [("r1", [0, 0, 0, 0])]
