"""Composition invariants for examples/genomics_pipeline.py — the
reference-user workflow (FASTA+GFF write → read → range join → scalar
surface). The underlying operators are driver-oracle-verified (q30, q43,
q35, q12); this pins that the composed pipeline preserves their
contracts end to end."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
)

from pyspark.sql import functions as F

from genomics_pipeline import run_genomics

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    scratch = str(tmp_path_factory.mktemp("genomics"))
    summary, stats = run_genomics(spark, SF_DIR, scratch=scratch)
    return summary.persist(), stats


def test_annotation_roundtrip_counts(built):
    summary, stats = built
    # one gene + one exon written per sequence, all back through read_gff
    assert stats["features"] == 2 * stats["sequences"]
    # every exon starts inside its own gene's interval by construction —
    # the range join must recover exactly one hit per sequence
    assert stats["gene_exon_overlaps"] == stats["sequences"]


def test_summary_is_complete_and_sane(built):
    summary, stats = built
    rows = summary.collect()
    assert {(r["type"]) for r in rows} == {"gene", "exon"}
    assert sum(r["n"] for r in rows) == stats["features"]
    for r in rows:
        assert r["avg_gc"] is None or 0.0 <= r["avg_gc"] <= 1.0
        assert r["total_bases"] > 0
