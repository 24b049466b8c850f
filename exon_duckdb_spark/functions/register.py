"""SQL-surface registration: the reference's UX is SQL-first (DuckDB
functions + table functions); this module makes the same statements run on a
SparkSession.

- Scalar functions become **SQL UDFs** (``CREATE TEMPORARY FUNCTION ...
  RETURN <expr>``) whose bodies are the same native expressions as the
  Column API in this package — they stay JVM-side, inside codegen, zero
  Python. ``tests/test_sql_registration.py`` cross-checks every SQL function
  against its Column twin.
- ``alignment_string`` / ``alignment_score`` register as Arrow-batched
  Python UDFs (dynamic programming is not SQL-expressible).
- Split-parser table functions become **Python UDTFs**, so the reference's
  ``SELECT * FROM read_fasta('path')`` runs verbatim
  (exon/src/exon_extension.cpp:47-58). A UDTF invocation parses on a single
  task — the convenience path for ad-hoc SQL; large scans should use
  ``spark.read.format("fasta")`` / ``read_fasta()`` which fan out one task
  per file split.

Usage::

    from exon_duckdb_spark.functions.register import register_all
    register_all(spark)
    spark.sql("SELECT gc_content(sequence) FROM read_fasta('/data/x.fasta')")
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from exon_duckdb_spark.functions.sam import SAM_FLAGS
from exon_duckdb_spark.functions.sequence import CODON_TABLE

__all__ = ["register_all", "register_sql_functions", "register_table_functions"]

_VALID_CIGAR = "^([0-9]+[MIDNSHP=X])+$"
_CIGAR_OP = "([0-9]+)([MIDNSHP=X])"


def _validated(arg: str, allowed_re: str, fname: str, result: str) -> str:
    return f"""CASE WHEN {arg} IS NULL THEN CAST(NULL AS STRING)
        WHEN {arg} RLIKE '{allowed_re}' THEN {result}
        ELSE raise_error(concat('{fname}: invalid character in sequence: ', {arg})) END"""


def _codon_map_sql() -> str:
    pairs = ", ".join(f"'{c}', '{a}'" for c, a in CODON_TABLE.items())
    return f"map({pairs})"


def _scalar_defs() -> dict[str, tuple[str, str, str]]:
    """name → (args DDL, return DDL, body SQL)."""
    aa_lookup = f"transform(regexp_extract_all(s, '(...)', 1), c -> element_at({_codon_map_sql()}, c))"
    ec_start = (
        f"CASE WHEN regexp_extract(cigar, '^{_CIGAR_OP}', 2) = 'I' "
        f"THEN CAST(regexp_extract(cigar, '^{_CIGAR_OP}', 1) AS INT) ELSE 0 END"
    )
    ec_end = (
        f"CASE WHEN regexp_extract(cigar, '{_CIGAR_OP}$', 2) = 'I' "
        f"THEN length(seq) - CAST(regexp_extract(cigar, '{_CIGAR_OP}$', 1) AS INT) "
        f"ELSE length(seq) END"
    )
    defs: dict[str, tuple[str, str, str]] = {
        "exondb_version": ("", "STRING", "'0.3.9'"),
        "gc_content": (
            "s STRING",
            "FLOAT",
            """CAST(CASE WHEN s IS NULL THEN NULL
                    WHEN length(s) = 0 THEN 0.0
                    ELSE (length(s) - length(translate(s, 'GC', ''))) / length(s)
               END AS FLOAT)""",
        ),
        "complement": (
            "s STRING", "STRING",
            _validated("s", "^[ATCG]*$", "complement", "translate(s, 'ATCG', 'TAGC')"),
        ),
        # reference quirk: maps without reversing (SURVEY §2.3)
        "reverse_complement": (
            "s STRING", "STRING",
            _validated("s", "^[ATCG]*$", "reverse_complement", "translate(s, 'ATCG', 'CGAT')"),
        ),
        "reverse_complement_strict": (
            "s STRING", "STRING",
            _validated(
                "s", "^[ATCG]*$", "reverse_complement_strict",
                "reverse(translate(s, 'ATCG', 'TAGC'))",
            ),
        ),
        "transcribe": (
            "s STRING", "STRING",
            _validated("s", "^[ATCG]*$", "transcribe", "translate(s, 'T', 'U')"),
        ),
        "reverse_transcribe": (
            "s STRING", "STRING",
            _validated("s", "^[AUCG]*$", "reverse_transcribe", "translate(s, 'U', 'T')"),
        ),
        "translate_dna_to_aa": (
            "s STRING",
            "STRING",
            f"""CASE WHEN s IS NULL THEN CAST(NULL AS STRING)
                WHEN length(s) % 3 != 0 THEN
                  raise_error(concat('translate_dna_to_aa: length not divisible by 3: ', s))
                WHEN exists({aa_lookup}, a -> a IS NULL) THEN
                  raise_error(concat('translate_dna_to_aa: unknown codon in: ', s))
                ELSE array_join({aa_lookup}, '') END""",
        ),
        "quality_score_string_to_list": (
            "q STRING",
            "ARRAY<INT>",
            """CASE WHEN q IS NULL THEN NULL
               WHEN length(q) = 0 THEN CAST(array() AS ARRAY<INT>)
               ELSE transform(sequence(1, length(q)), i -> ascii(substring(q, i, 1)) - 33)
               END""",
        ),
        "gff_parse_attributes": (
            "a STRING",
            "MAP<STRING, STRING>",
            """CASE WHEN a IS NULL THEN NULL
               WHEN forall(transform(split(regexp_replace(trim(a), ';$', ''), ';'), p -> trim(p)),
                           p -> p RLIKE '^[^=]+=[^=]*$')
               THEN map_from_entries(
                      transform(transform(split(regexp_replace(trim(a), ';$', ''), ';'),
                                          p -> trim(p)),
                                p -> named_struct('key', regexp_extract(p, '^([^=]+)=', 1),
                                                  'value', regexp_extract(p, '^[^=]+=(.*)$', 1))))
               ELSE raise_error(concat('gff_parse_attributes: invalid attribute string: ', a))
               END""",
        ),
        "parse_cigar": (
            "c STRING",
            "ARRAY<STRUCT<op: STRING, len: INT>>",
            f"""CASE WHEN c IS NULL THEN NULL
                WHEN c RLIKE '{_VALID_CIGAR}' THEN
                  transform(regexp_extract_all(c, '{_CIGAR_OP}', 0),
                            x -> named_struct('op', regexp_extract(x, '([MIDNSHP=X])', 1),
                                              'len', CAST(regexp_extract(x, '([0-9]+)', 1) AS INT)))
                ELSE raise_error(concat('parse_cigar: invalid CIGAR string: ', c)) END""",
        ),
        "extract_from_cigar": (
            "seq STRING, cigar STRING",
            "STRUCT<sequence_start: INT, sequence_end: INT, sequence: STRING>",
            f"""CASE WHEN seq IS NULL OR cigar IS NULL THEN NULL
                WHEN cigar RLIKE '{_VALID_CIGAR}' THEN named_struct(
                    'sequence_start', {ec_start},
                    'sequence_end', {ec_end},
                    'sequence', substring(seq, ({ec_start}) + 1, ({ec_end}) - ({ec_start})))
                ELSE raise_error(concat('extract_from_cigar: invalid CIGAR string: ', cigar))
                END""",
        ),
        "cigar_reference_length": (
            "c STRING",
            "BIGINT",
            f"""aggregate(
                  filter(regexp_extract_all(c, '{_CIGAR_OP}', 0),
                         x -> regexp_extract(x, '([MIDNSHP=X])', 1) IN ('M', 'D', 'N', '=', 'X')),
                  CAST(0 AS BIGINT),
                  (acc, x) -> acc + CAST(regexp_extract(x, '([0-9]+)', 1) AS BIGINT))""",
        ),
    }
    for name, mask in SAM_FLAGS.items():
        defs[name] = ("flag INT", "BOOLEAN", f"(flag & {mask}) != 0")
    return defs


def register_sql_functions(spark: SparkSession) -> None:
    """Create the scalar surface as temporary SQL UDFs + the alignment
    Python UDFs on this session."""
    for name, (args, ret, body) in _scalar_defs().items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({args}) RETURNS {ret} RETURN {body}")

    from exon_duckdb_spark.functions import alignment as _al

    # Variadic row-form dispatchers: one SQL name covers the reference's
    # 2/6/7-arg bind-time arities (module.cpp:53-133) incl. the memory-model
    # argument and its 'Invalid memory model' / 'Match score must be
    # negative or zero.' error contracts. SQL-surface parity only — the
    # DataFrame API stays the Arrow-batched hot path.
    spark.udf.register("alignment_string_wfa_gap_affine", _al.sql_alignment_string, "string")
    spark.udf.register("alignment_score_wfa_gap_affine", _al.sql_alignment_score, "float")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION alignment_string(a STRING, b STRING) "
        "RETURNS STRING RETURN alignment_string_wfa_gap_affine(a, b)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION alignment_score(a STRING, b STRING) "
        "RETURNS FLOAT RETURN alignment_score_wfa_gap_affine(a, b)"
    )


def _make_read_udtf(parse_import: str, schema_import: str, splittable: bool):
    """UDTF class reading every record of path (single-task convenience).

    ``splittable`` must be True ONLY for parsers that honor the FileSplit
    byte range (fasta/fastq/bam scan-ahead from split.start). Whole-file
    parsers (the pyparse line parsers, genbank, mzml) ignore the range, so
    planning them splittable would emit every record once per 128MB split
    on large files — they get one whole-file split instead.
    """
    import importlib

    from pyspark.sql.functions import udtf

    smod, sname = schema_import.split(":")
    schema = getattr(importlib.import_module(smod), sname)
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    names = [f.name for f in schema.fields]

    class _ReadUDTF:
        def eval(self, path: str, compression: str = "auto_detect"):
            mod, fn = parse_import.split(":")
            parse = getattr(importlib.import_module(mod), fn)
            from exon_duckdb_spark.sources.splits import plan_splits

            for split in plan_splits(path, compression, splittable=splittable):
                for rec in parse(split):
                    yield tuple(rec.get(n) for n in names)

    return udtf(_ReadUDTF, returnType=ddl)


# name → (parser, schema, splittable). splittable only where the parser
# honors FileSplit byte ranges (see _make_read_udtf).
_TABLE_FUNCS = {
    "read_fasta": (
        "exon_duckdb_spark.sources.fasta:_parse_fasta_split",
        "exon_duckdb_spark.sources.schemas:FASTA_SCHEMA",
        True,
    ),
    "read_fastq": (
        "exon_duckdb_spark.sources.fastq:_parse_fastq_split",
        "exon_duckdb_spark.sources.schemas:FASTQ_SCHEMA",
        True,
    ),
    "read_genbank": (
        "exon_duckdb_spark.sources.genbank:_parse_genbank_split",
        "exon_duckdb_spark.sources.schemas:GENBANK_SCHEMA",
        False,
    ),
    "read_mzml": (
        "exon_duckdb_spark.sources.mzml:_parse_mzml_split",
        "exon_duckdb_spark.sources.schemas:MZML_SCHEMA",
        False,
    ),
    "read_bam_file_records": (
        "exon_duckdb_spark.sources.bam:_parse_bam_split",
        "exon_duckdb_spark.sources.schemas:SAM_SCHEMA",
        True,
    ),
    # python mirrors of the native-csv scans (tsv.py) so every reference
    # SQL name runs verbatim; the line parsers read whole files
    "read_gff": (
        "exon_duckdb_spark.sources.pyparse:parse_gff_split",
        "exon_duckdb_spark.sources.schemas:GFF_SCHEMA",
        False,
    ),
    "read_gff_raw": (
        "exon_duckdb_spark.sources.pyparse:parse_gff_raw_split",
        "exon_duckdb_spark.sources.schemas:GFF_RAW_SCHEMA",
        False,
    ),
    "read_gtf": (
        "exon_duckdb_spark.sources.pyparse:parse_gtf_split",
        "exon_duckdb_spark.sources.schemas:GTF_SCHEMA",
        False,
    ),
    "read_bed_file": (
        "exon_duckdb_spark.sources.pyparse:parse_bed_split",
        "exon_duckdb_spark.sources.schemas:BED_SCHEMA",
        False,
    ),
    "read_sam_file_records": (
        "exon_duckdb_spark.sources.pyparse:parse_sam_split",
        "exon_duckdb_spark.sources.schemas:SAM_SCHEMA",
        False,
    ),
    "read_hmm_dom_tbl_out": (
        "exon_duckdb_spark.sources.pyparse:parse_hmm_split",
        "exon_duckdb_spark.sources.schemas:HMM_DOMTAB_SCHEMA",
        False,
    ),
}


def _row_of(rec: dict, names: list[str]) -> tuple:
    return tuple(rec.get(n) for n in names)


def _make_vcf_udtf():
    """``read_vcf_file_records(path)``: header-driven schema via the UDTF
    analyze() phase — the SQL mirror of read_vcf's bind-time INFO peek
    (the reference's one file-dependent schema, SURVEY §1.1)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.udtf import AnalyzeResult

    class _ReadVcf:
        @staticmethod
        def analyze(path) -> AnalyzeResult:
            from exon_duckdb_spark.sources.vcf import _peek_info_fields, vcf_schema

            return AnalyzeResult(schema=vcf_schema(_peek_info_fields(path.value)))

        def eval(self, path: str):
            from exon_duckdb_spark.sources.pyparse import parse_vcf_record_fields
            from exon_duckdb_spark.sources.splits import plan_splits
            from exon_duckdb_spark.sources.reader_core import read_split_lines
            from exon_duckdb_spark.sources.vcf import _peek_info_fields, vcf_schema

            info_fields = _peek_info_fields(path)
            names = [f.name for f in vcf_schema(info_fields).fields]
            for split in plan_splits(path, "auto_detect", splittable=False):
                for line in read_split_lines(split):
                    line = line.rstrip(b"\r\n")
                    if not line or line.startswith(b"#"):
                        continue
                    rec = parse_vcf_record_fields(
                        line.decode("utf-8", "replace").split("\t"), info_fields
                    )
                    rec["info"] = tuple(
                        rec["info"].get(f.id) for f in info_fields
                    )
                    yield _row_of(rec, names)

    return udtf(_ReadVcf)


def _make_bcf_udtf():
    """``read_bcf_file_records(path)``: header-driven schema via analyze()."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.udtf import AnalyzeResult

    class _ReadBcf:
        @staticmethod
        def analyze(path) -> AnalyzeResult:
            from exon_duckdb_spark.sources.bcf import bcf_bind

            return AnalyzeResult(schema=bcf_bind(path.value)[3])

        def eval(self, path: str):
            from exon_duckdb_spark.sources.bcf import bcf_bind, parse_bcf_records
            from exon_duckdb_spark.sources.splits import plan_splits

            contigs, info_meta, info_fields, schema = bcf_bind(path)
            names = [f.name for f in schema.fields]
            for split in plan_splits(path, "none", splittable=False):
                for rec in parse_bcf_records(split, info_meta, contigs, info_fields):
                    rec["info"] = tuple(
                        rec["info"].get(f.name) for f in info_fields
                    )
                    yield _row_of(rec, names)

    return udtf(_ReadBcf)


def _make_region_udtf(kind: str):
    """``{vcf,bcf,bam}_query(path, region)`` — index-pruned region scans as
    SQL table functions (single-task convenience; the DataFrame API is the
    scale path)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.udtf import AnalyzeResult

    class _Query:
        @staticmethod
        def analyze(path, region) -> AnalyzeResult:
            if kind == "bam":
                from exon_duckdb_spark.sources.schemas import SAM_SCHEMA

                return AnalyzeResult(schema=SAM_SCHEMA)
            if kind == "vcf":
                from exon_duckdb_spark.sources.vcf import _peek_info_fields, vcf_schema

                return AnalyzeResult(schema=vcf_schema(_peek_info_fields(path.value)))
            from exon_duckdb_spark.sources.bcf import bcf_bind

            return AnalyzeResult(schema=bcf_bind(path.value)[3])

        def eval(self, path: str, region: str):
            from exon_duckdb_spark.sources.vcf import parse_region

            chrom, r_start, r_end = parse_region(region)

            def overlaps(c, s, e) -> bool:
                if c != chrom or s is None:
                    return False
                if r_start is not None and (e if e is not None else s) < r_start:
                    return False
                return not (r_end is not None and s > r_end)

            if kind == "bam":
                from exon_duckdb_spark.sources.bam import (
                    _parse_bam_split,
                    plan_bam_query_splits,
                )
                from exon_duckdb_spark.sources.schemas import SAM_SCHEMA

                names = [f.name for f in SAM_SCHEMA.fields]
                for split in plan_bam_query_splits(path, region):
                    for rec in _parse_bam_split(split):
                        if overlaps(rec["reference"], rec["start"], rec["end"]):
                            yield _row_of(rec, names)
            elif kind == "vcf":
                from exon_duckdb_spark.sources.pyparse import parse_vcf_record_fields
                from exon_duckdb_spark.sources.reader_core import read_split_lines
                from exon_duckdb_spark.sources.splits import plan_splits
                from exon_duckdb_spark.sources.vcf import (
                    _peek_info_fields,
                    plan_vcf_query_splits,
                    vcf_schema,
                )

                info_fields = _peek_info_fields(path)
                names = [f.name for f in vcf_schema(info_fields).fields]
                splits = plan_vcf_query_splits(path, region)
                if splits is None:
                    splits = plan_splits(path, "auto_detect", splittable=False)
                from exon_duckdb_spark.sources.bgzf import (
                    is_bgzf,
                    parse_bgzf_lines_split,
                )

                for split in splits:
                    # parse_bgzf_lines_split already yields newline-stripped
                    # str values — consume them directly (no bytes round-trip)
                    lines = (
                        (r["value"] for r in parse_bgzf_lines_split(split))
                        if is_bgzf(split.path)
                        else (
                            ln.rstrip(b"\r\n").decode("utf-8", "replace")
                            for ln in read_split_lines(split)
                        )
                    )
                    for line in lines:
                        if not line or line.startswith("#"):
                            continue
                        rec = parse_vcf_record_fields(line.split("\t"), info_fields)
                        if rec["pos"] is None:
                            continue
                        end = rec["pos"] + len(rec["ref"] or "x") - 1
                        if overlaps(rec["chrom"], rec["pos"], end):
                            rec["info"] = tuple(
                                rec["info"].get(f.id) for f in info_fields
                            )
                            yield _row_of(rec, names)
            else:
                from exon_duckdb_spark.sources.bcf import (
                    bcf_bind,
                    parse_bcf_records,
                    plan_bcf_query_splits,
                )

                contigs, info_meta, info_fields, schema = bcf_bind(path)
                names = [f.name for f in schema.fields]
                for split in plan_bcf_query_splits(path, region):
                    for rec in parse_bcf_records(split, info_meta, contigs, info_fields):
                        end = rec["pos"] + len(rec["ref"] or "x") - 1
                        if overlaps(rec["chrom"], rec["pos"], end):
                            rec["info"] = tuple(
                                rec["info"].get(f.name) for f in info_fields
                            )
                            yield _row_of(rec, names)

    return udtf(_Query)


def _make_acknowledgements_udtf():
    """``exondb_third_party_acknowledgements()`` — constant TVF naming this
    engine's third-party stack (reference surface:
    test_acknowledgements_function.test:3-14, disabled there)."""
    from pyspark.sql.functions import udtf

    class _Acks:
        def eval(self):
            from exon_duckdb_spark.functions.core import THIRD_PARTY_ACKNOWLEDGEMENTS

            yield from THIRD_PARTY_ACKNOWLEDGEMENTS

    return udtf(_Acks, returnType="name string, license string, url string")


def register_table_functions(spark: SparkSession) -> None:
    for name, (parse_import, schema_import, splittable) in _TABLE_FUNCS.items():
        spark.udtf.register(name, _make_read_udtf(parse_import, schema_import, splittable))
    spark.udtf.register(
        "exondb_third_party_acknowledgements", _make_acknowledgements_udtf()
    )
    spark.udtf.register("read_vcf_file_records", _make_vcf_udtf())
    spark.udtf.register("read_bcf_file_records", _make_bcf_udtf())
    spark.udtf.register("vcf_query", _make_region_udtf("vcf"))
    spark.udtf.register("bcf_query", _make_region_udtf("bcf"))
    spark.udtf.register("bam_query", _make_region_udtf("bam"))


def register_all(spark: SparkSession) -> None:
    register_sql_functions(spark)
    register_table_functions(spark)
