"""Distributed BPE tokenizer training (bpe_train / bpe_apply).

The reference below is an independent scalar transcription of the training
contract — word-type counts, (max weighted count, lexicographically
smallest) pair selection, single-pass leftmost-non-overlapping merge
application — NOT a call into the operator's own expressions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from exon_duckdb_spark import operators as ops

MARK = "</w>"


def _ref_train(texts: list[str], k: int) -> tuple[list[tuple[str, str, int]], dict]:
    wc: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    sym = {w: " " + " ".join(list(w)) + " " + MARK + " " for w in wc}
    merges = []
    for _ in range(k):
        pc: dict[str, int] = {}
        for w, s in sym.items():
            parts = s.split(" ")  # ['', a, b, ..., mark, '']
            for i in range(1, len(parts) - 2):
                p = parts[i] + " " + parts[i + 1]
                pc[p] = pc.get(p, 0) + wc[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        l, r = best[0].split(" ")
        merges.append((l, r, best[1]))
        sym = {
            w: s.replace(f" {l} {r} ", f" {l}{r} ") for w, s in sym.items()
        }
    return merges, {w: s.strip() for w, s in sym.items()}


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "new new newer",
]


class TestBpeTrain:
    def test_matches_scalar_reference(self, spark):
        df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
        merges, vocab = ops.bpe_train(df, num_merges=10)
        ref_merges, ref_vocab = _ref_train(CORPUS, 10)
        assert merges == ref_merges
        got = {r["word"]: (r["cnt"], r["sym"]) for r in vocab.collect()}
        for w, s in ref_vocab.items():
            assert got[w][1] == s, w
        spark.catalog.clearCache()

    def test_classic_sennrich_shape(self, spark):
        # the canonical low/lower/newest/widest corpus: 'es' then 'est'
        # emerge early (newest+widest dominate), and 'low' fuses
        df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
        merges, vocab = ops.bpe_train(df, num_merges=10)
        pairs = [(l, r) for l, r, _ in merges]
        assert ("e", "s") in pairs and ("es", "t") in pairs
        segs = {r["word"]: r["sym"] for r in vocab.collect()}
        assert "est" in segs["newest"].split(" ") or "est</w>" in segs["newest"]
        spark.catalog.clearCache()

    def test_single_pass_replace_semantics(self, spark):
        # 'x y x y': one literal replace merges only the FIRST occurrence
        # (the boundary space is consumed) — the documented variant
        df = spark.createDataFrame([("abab",), ("abab",)], "text string")
        merges, vocab = ops.bpe_train(df, num_merges=1)
        assert merges[0][:2] == ("a", "b")
        seg = vocab.where(F.col("word") == "abab").collect()[0]["sym"]
        assert seg == "ab a b " + MARK
        spark.catalog.clearCache()

    def test_arg_guards(self, spark):
        df = spark.createDataFrame([("a",)], "text string")
        with pytest.raises(ValueError, match="num_merges"):
            ops.bpe_train(df, num_merges=0)
        with pytest.raises(ValueError, match="marker"):
            ops.bpe_train(df, marker="a b")


class TestBpeApply:
    def test_tokens_match_vocab_segmentation(self, spark):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
        )
        merges, vocab = ops.bpe_train(df, num_merges=6)
        _, ref_vocab = _ref_train(CORPUS, 6)
        out = ops.bpe_apply(df, vocab, merges).collect()
        by_doc: dict[tuple, list] = {}
        for r in out:
            by_doc.setdefault((r["doc_id"], r["wpos"]), []).append(
                (r["tpos"], r["token"])
            )
        for (did, wpos), toks in by_doc.items():
            word = CORPUS[did].split(" ")[wpos]
            want = ref_vocab[word].split(" ")
            assert [t for _, t in sorted(toks)] == want, (did, wpos)
        spark.catalog.clearCache()

    def test_oov_falls_back_to_merge_chain(self, spark):
        train = spark.createDataFrame([(t,) for t in CORPUS], "text string")
        merges, vocab = ops.bpe_train(train, num_merges=6)
        _, _ = _ref_train(CORPUS, 6)
        # 'lowest' never appears in training; the merge chain still
        # applies ('lo'+'w', 'es'+'t' style fusions carry over)
        test = spark.createDataFrame([(0, "lowest")], "doc_id long, text string")
        toks = [
            r["token"]
            for r in ops.bpe_apply(test, vocab, merges).orderBy("tpos").collect()
        ]
        # independent replay of the chain on the OOV word
        s = " " + " ".join(list("lowest")) + " " + MARK + " "
        for l, r, _ in merges:
            s = s.replace(f" {l} {r} ", f" {l}{r} ")
        assert toks == s.split()
        spark.catalog.clearCache()
