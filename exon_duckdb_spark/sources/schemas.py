"""Per-format record schemas — the contract every reader must produce.

Transcribed from the reference's golden test outputs (SURVEY.md §1.3,
FIXTURES.md). Column ORDER matters: ``SELECT *`` parity with the reference.
Coordinates are 1-based inclusive everywhere (BED is converted on read).
"""

from __future__ import annotations

from pyspark.sql import types as T

FASTA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("description", T.StringType(), True),
        T.StructField("sequence", T.StringType(), False),
    ]
)

FASTQ_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("description", T.StringType(), True),
        T.StructField("sequence", T.StringType(), False),
        T.StructField("quality_scores", T.StringType(), False),
    ]
)

# GFF/GTF scan schema (test_gff_scan.test:6-24): attributes is
# MAP<STRING, ARRAY<STRING>>; '.' placeholders → NULL.
_GFF_COMMON = [
    T.StructField("seqname", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("type", T.StringType(), True),
    T.StructField("start", T.LongType(), True),
    T.StructField("end", T.LongType(), True),
    T.StructField("score", T.FloatType(), True),
    T.StructField("strand", T.StringType(), True),
]
GFF_SCHEMA = T.StructType(
    _GFF_COMMON
    + [
        T.StructField("phase", T.StringType(), True),
        T.StructField(
            "attributes", T.MapType(T.StringType(), T.ArrayType(T.StringType())), True
        ),
    ]
)
# read_gff_raw (test_gff_scan.test:100-113, disabled there): reference
# column head is 'seqid'; score/strand/phase/attributes stay raw strings.
GFF_RAW_SCHEMA = T.StructType(
    [
        T.StructField("seqid", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("start", T.LongType(), True),
        T.StructField("end", T.LongType(), True),
        T.StructField("score", T.StringType(), True),
        T.StructField("strand", T.StringType(), True),
        T.StructField("phase", T.StringType(), True),
        T.StructField("attributes", T.StringType(), True),
    ]
)
GTF_SCHEMA = T.StructType(
    _GFF_COMMON
    + [
        T.StructField("frame", T.StringType(), True),
        T.StructField(
            "attributes", T.MapType(T.StringType(), T.ArrayType(T.StringType())), True
        ),
    ]
)

# SAM/BAM 10-column schema (test_sam_record_scan.test:6-16).
SAM_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), True),
        T.StructField("flag", T.IntegerType(), True),
        T.StructField("reference", T.StringType(), True),
        T.StructField("start", T.LongType(), True),
        T.StructField("end", T.LongType(), True),
        T.StructField("mapping_quality", T.StringType(), True),
        T.StructField("cigar", T.StringType(), True),
        T.StructField("mate_reference", T.StringType(), True),
        T.StructField("sequence", T.StringType(), True),
        T.StructField("quality_score", T.StringType(), True),
    ]
)

# BED 12-column schema (test_bed_io.test:5-17); start/thick_start are
# converted 0-based → 1-based on read; '.' and 0-score/0-color → NULL.
BED_SCHEMA = T.StructType(
    [
        T.StructField("reference_sequence_name", T.StringType(), True),
        T.StructField("start", T.LongType(), True),
        T.StructField("end", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.StringType(), True),
        T.StructField("strand", T.StringType(), True),
        T.StructField("thick_start", T.LongType(), True),
        T.StructField("thick_end", T.LongType(), True),
        T.StructField("color", T.StringType(), True),
        T.StructField("block_count", T.IntegerType(), True),
        T.StructField("block_sizes", T.StringType(), True),
        T.StructField("block_starts", T.StringType(), True),
    ]
)

# HMMER3 --domtblout, 23 whitespace-delimited columns
# (test.pfam.hmmout; FIXTURES.md).
HMM_DOMTAB_SCHEMA = T.StructType(
    [
        T.StructField("target_name", T.StringType(), True),
        T.StructField("target_accession", T.StringType(), True),
        T.StructField("tlen", T.IntegerType(), True),
        T.StructField("query_name", T.StringType(), True),
        T.StructField("query_accession", T.StringType(), True),
        T.StructField("qlen", T.IntegerType(), True),
        T.StructField("evalue", T.DoubleType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("bias", T.DoubleType(), True),
        T.StructField("domain_number", T.IntegerType(), True),
        T.StructField("ndom", T.IntegerType(), True),
        T.StructField("c_evalue", T.DoubleType(), True),
        T.StructField("i_evalue", T.DoubleType(), True),
        T.StructField("domain_score", T.DoubleType(), True),
        T.StructField("domain_bias", T.DoubleType(), True),
        T.StructField("hmm_from", T.IntegerType(), True),
        T.StructField("hmm_to", T.IntegerType(), True),
        T.StructField("ali_from", T.IntegerType(), True),
        T.StructField("ali_to", T.IntegerType(), True),
        T.StructField("env_from", T.IntegerType(), True),
        T.StructField("env_to", T.IntegerType(), True),
        T.StructField("acc", T.DoubleType(), True),
        T.StructField("description", T.StringType(), True),
    ]
)

# VCF fixed columns (test_vcf_record_scan.test:11-19); the ``info`` struct is
# header-driven and appended at read time by the VCF reader.
VCF_FIXED_FIELDS = [
    T.StructField("chrom", T.StringType(), True),
    T.StructField("pos", T.LongType(), True),
    T.StructField("id", T.StringType(), True),
    T.StructField("ref", T.StringType(), True),
    T.StructField("alt", T.ArrayType(T.StringType()), True),
    T.StructField("qual", T.FloatType(), True),
    T.StructField("filter", T.StringType(), True),
]

# GenBank flat-file records (test_genbank_scan.test:5-10).
GENBANK_SCHEMA = T.StructType(
    [
        T.StructField("sequence", T.StringType(), True),
        T.StructField("accession", T.StringType(), True),
        T.StructField("comments", T.StringType(), True),
        T.StructField("contig", T.StringType(), True),
        T.StructField("date", T.StringType(), True),
        T.StructField("dblink", T.StringType(), True),
        T.StructField("definition", T.StringType(), True),
        T.StructField("division", T.StringType(), True),
        T.StructField("keywords", T.StringType(), True),
        T.StructField("molecule_type", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("titles", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("version", T.StringType(), True),
        T.StructField("topology", T.StringType(), True),
        T.StructField(
            "features",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType(), True),
                        T.StructField("location", T.StringType(), True),
                        T.StructField(
                            "qualifiers",
                            T.MapType(T.StringType(), T.StringType()),
                            True,
                        ),
                    ]
                )
            ),
            True,
        ),
    ]
)

# mzML spectra (test_mzml_scan.test:6-10); cv_params carries the
# spectrum-level cvParam triples (SURVEY §1.3 "+mz/cv_params from format").
MZML_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField(
            "cv_params",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("accession", T.StringType(), True),
                        T.StructField("name", T.StringType(), True),
                        T.StructField("value", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField(
            "mz",
            T.StructType([T.StructField("mz", T.ArrayType(T.DoubleType()), True)]),
            True,
        ),
        T.StructField(
            "intensity",
            T.StructType(
                [T.StructField("intensity", T.ArrayType(T.FloatType()), True)]
            ),
            True,
        ),
        T.StructField(
            "wavelength",
            T.StructType(
                [T.StructField("wavelength", T.ArrayType(T.FloatType()), True)]
            ),
            True,
        ),
    ]
)
