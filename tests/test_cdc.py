"""Content-defined chunking (operators/text.py::cdc_chunks, round 10).

Covers the operator contract beyond the oracle compare (which pins
Spark ≡ DuckDB on the corpus): coverage/reassembly invariants, the
max-size cap, boundary determinism, the edge shapes (empty doc, doc
shorter than the window, exactly-window doc), and the property CDC
exists for — boundary re-alignment after an insertion, which fixed-window
chunking cannot provide.
"""

from __future__ import annotations

import pytest

from exon_duckdb_spark.operators.text import cdc_chunks


def _chunks(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = cdc_chunks(df, **kw).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r["chunk_id"])
    return by_doc


def test_cover_reassemble_and_cap(spark):
    texts = {
        1: "The quick brown fox jumps over the lazy dog. " * 12,
        2: "ab" * 300,          # periodic content: max-split path
        3: "unique words " * 40,
    }
    by_doc = _chunks(spark, list(texts.items()))
    for did, text in texts.items():
        chunks = by_doc[did]
        # chunk_ids dense from 0, offsets contiguous, exact reassembly
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        pos = 0
        for c in chunks:
            assert c["start"] == pos
            assert c["n_chars"] == len(c["chunk_text"])
            assert c["n_chars"] <= 128
            pos += c["n_chars"]
        assert "".join(c["chunk_text"] for c in chunks) == text
    # the periodic doc has no content boundaries -> pure max_size splits
    assert [c["n_chars"] for c in by_doc[2]] == [128, 128, 128, 128, 88]


def test_edges(spark):
    by_doc = _chunks(
        spark, [(1, ""), (2, "short"), (3, "x" * 8), (4, "y" * 7)]
    )
    # one chunk each; shorter-than-window docs can't carry a boundary
    for did in (2, 3, 4):
        assert len(by_doc[did]) == 1
        assert by_doc[did][0]["chunk_text"] == {2: "short", 3: "x" * 8,
                                                4: "y" * 7}[did]
    # the empty doc: split('') -> [''] gives one empty chunk (documented
    # cross-engine artifact; DuckDB agrees byte-for-byte)
    assert len(by_doc[1]) == 1
    assert by_doc[1][0]["chunk_text"] == ""


def test_determinism_and_param_validation(spark):
    rows = [(1, "some repeated content here. " * 20)]
    a = _chunks(spark, rows)[1]
    b = _chunks(spark, rows)[1]
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError):
        cdc_chunks(df, avg_size=1)


def test_insertion_realigns_boundaries(spark):
    """THE content-defined property: after an early insertion, chunk
    boundaries re-align on the unchanged suffix, so chunk hashes are
    shared; fixed-offset chunking at the same sizes shifts every
    downstream chunk. Compare against that baseline explicitly."""
    # varied (non-periodic) content: a periodic string can miss the
    # 1/avg_size hash condition on ALL of its few distinct windows and
    # degrade to pure max-splits, which are offset-relative and do NOT
    # re-align — that is expected CDC behavior, not a bug, but it is the
    # wrong fixture for this property
    base = " ".join(f"token{i:03d}" for i in range(160))
    ins = base[:40] + "[INSERTED SPAN] " + base[40:]
    by_doc = _chunks(spark, [(1, base), (2, ins)])
    c1 = [c["chunk_text"] for c in by_doc[1]]
    c2 = [c["chunk_text"] for c in by_doc[2]]
    shared = set(c1) & set(c2)
    assert shared, "no chunk survived the insertion"
    # the unchanged SUFFIX re-aligns: the last chunks are identical
    assert c1[-1] == c2[-1]
    # fixed-window baseline at the same size shares nothing after the
    # insertion point (every boundary shifts by the insertion length)
    fixed1 = {base[i:i + 64] for i in range(0, len(base), 64)}
    fixed2 = {ins[i:i + 64] for i in range(0, len(ins), 64)}
    prefix_only = {c for c in (fixed1 & fixed2) if c in base[:40]}
    # ADVICE r10: the single intended check — every shared fixed-window
    # chunk predates the insertion point (the old two-clause form was
    # redundant: its first clause implied the second)
    assert (fixed1 & fixed2) <= prefix_only
