"""FASTQ scalar functions.

Parity surface of the reference's fastq_functions
(exon/src/exon/fastq_functions/module.cpp).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["quality_score_string_to_list"]


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def quality_score_string_to_list(quality: Column | str) -> Column:
    """Phred+33 decode: each char c → ord(c) - 33, as ARRAY<INT>.

    Reference: fastq_functions/module.cpp:28-54 ('!#' → [0, 2]).
    Native: iterate positions with sequence() + ascii(substring()) — stays in
    codegen, no UDF.
    """
    q = _as_col(quality)
    # Guard the empty string: sequence(1, 0) is DESCENDING [1, 0] in Spark,
    # which would decode '' as [-33, -33].
    decoded = F.transform(
        F.sequence(F.lit(1), F.length(q)),
        lambda i: F.ascii(F.substring(q, i, 1)) - 33,
    )
    return F.when(q.isNull(), F.lit(None)).otherwise(
        F.when(F.length(q) == 0, F.array().cast("array<int>")).otherwise(decoded)
    )
