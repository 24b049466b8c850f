"""Core/identity functions (reference: exon/src/exon/core/module.cpp)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["exondb_version"]


def exondb_version() -> Column:
    """Constant version string — reference returns '0.3.9'
    (core/module.cpp:25-39)."""
    return F.lit("0.3.9")
