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

    spark.udf.register(
        "alignment_string_wfa_gap_affine",
        _al._make_string_udf(0, _al.DEFAULT_MISMATCH, _al.DEFAULT_GAP_OPEN, _al.DEFAULT_GAP_EXT),
    )
    spark.udf.register(
        "alignment_score_wfa_gap_affine",
        _al._make_score_udf(0, _al.DEFAULT_MISMATCH, _al.DEFAULT_GAP_OPEN, _al.DEFAULT_GAP_EXT),
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION alignment_string(a STRING, b STRING) "
        "RETURNS STRING RETURN alignment_string_wfa_gap_affine(a, b)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION alignment_score(a STRING, b STRING) "
        "RETURNS FLOAT RETURN alignment_score_wfa_gap_affine(a, b)"
    )


def _make_read_udtf(parse_import: str, schema_import: str):
    """UDTF class reading every record of path (single-task convenience)."""
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

            for split in plan_splits(path, compression):
                for rec in parse(split):
                    yield tuple(rec.get(n) for n in names)

    return udtf(_ReadUDTF, returnType=ddl)


_TABLE_FUNCS = {
    "read_fasta": (
        "exon_duckdb_spark.sources.fasta:_parse_fasta_split",
        "exon_duckdb_spark.sources.schemas:FASTA_SCHEMA",
    ),
    "read_fastq": (
        "exon_duckdb_spark.sources.fastq:_parse_fastq_split",
        "exon_duckdb_spark.sources.schemas:FASTQ_SCHEMA",
    ),
    "read_genbank": (
        "exon_duckdb_spark.sources.genbank:_parse_genbank_split",
        "exon_duckdb_spark.sources.schemas:GENBANK_SCHEMA",
    ),
    "read_mzml": (
        "exon_duckdb_spark.sources.mzml:_parse_mzml_split",
        "exon_duckdb_spark.sources.schemas:MZML_SCHEMA",
    ),
    "read_bam_file_records": (
        "exon_duckdb_spark.sources.bam:_parse_bam_split",
        "exon_duckdb_spark.sources.schemas:SAM_SCHEMA",
    ),
}


def register_table_functions(spark: SparkSession) -> None:
    for name, (parse_import, schema_import) in _TABLE_FUNCS.items():
        spark.udtf.register(name, _make_read_udtf(parse_import, schema_import))


def register_all(spark: SparkSession) -> None:
    register_sql_functions(spark)
    register_table_functions(spark)
