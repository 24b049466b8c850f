"""Pins the runtime-compiled C alignment kernel (functions/_align_native)
bit-identical — scores AND CIGARs — to the scalar oracle `_affine_align`
and to the numpy engine it accelerates, across penalty regimes (including
the pathological gap_open < 0 / gap_ext <= 0 corners that route through
run_full), mutation rates, length skews, and empty/unicode edges. Also
pins that the routed public surface returns the same answers with the
kernel force-disabled, so a container without gcc degrades silently to
the numpy engine with identical results.

Reference parity target: exon/src/exon/alignment_functions/module.cpp
(WFA2-lib backed) — the goldens live in test_scalar_functions.py; this
file is about engine-vs-engine identity.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from exon_duckdb_spark.functions import _align_native as nat
from exon_duckdb_spark.functions import alignment as al_mod
from exon_duckdb_spark.functions.alignment import (
    _affine_align,
    _encode,
    _route_cigars,
    _route_scores,
)

ALPHA = "ACGT"
PENS = [
    (0, 4, 6, 2),    # reference defaults
    (0, 1, 1, 1),
    (-2, 3, 5, 1),   # match bonus
    (0, 4, -1, 2),   # pathological open — full-DP-only path
    (0, 2, 0, 3),
    (0, 4, 6, 0),    # pathological ext — full-DP-only path
]


def _mutate(rng: random.Random, s: str, rate: float) -> str:
    out = []
    for c in s:
        r = rng.random()
        if r < rate / 3:
            continue
        if r < 2 * rate / 3:
            out.append(rng.choice(ALPHA))
        elif r < rate:
            out.extend([c, rng.choice(ALPHA)])
        else:
            out.append(c)
    return "".join(out)


def _cases() -> list[tuple[str, str]]:
    rng = random.Random(7)
    cases = []
    for L in (0, 1, 3, 10, 50, 150):
        for rate in (0.0, 0.02, 0.1, 0.5):
            a = "".join(rng.choice(ALPHA) for _ in range(L))
            b = _mutate(rng, a, rate)
            cases.append((a, b))
            cases.append((b, a))
    cases += [
        ("", ""), ("A", ""), ("", "A"),
        ("AACC", "AAACC"),   # the reference golden '2M1D2M'
        ("AACC", "AACC"),
        ("ABCDE", "VWXYZ"),
        ("héllo", "hèllo"),  # non-ASCII codes survive the int32 encode
    ]
    return cases


needs_native = pytest.mark.skipif(
    not nat.available(), reason="no C toolchain in this environment"
)


@needs_native
def test_native_bit_identical_to_scalar_oracle():
    cases = _cases()
    al = [a for a, _ in cases]
    bl = [b for _, b in cases]
    ac, bc = _encode(al, -1), _encode(bl, -2)
    ln = np.fromiter(map(len, al), np.int64, count=len(al))
    lm = np.fromiter(map(len, bl), np.int64, count=len(bl))
    for match, mm, go, ge in PENS:
        sc = nat.scores(ac, bc, ln, lm, match, mm, go, ge)
        cg = nat.cigars(ac, bc, ln, lm, match, mm, go, ge)
        for k, (a, b) in enumerate(cases):
            ps, pc = _affine_align(a, b, match, mm, go, ge)
            assert int(sc[k]) == ps, (a, b, (match, mm, go, ge))
            assert cg[k] == pc, (a, b, (match, mm, go, ge))


@needs_native
def test_routed_surface_identical_with_and_without_native(monkeypatch):
    """The public routing must return the same scores/CIGARs whether the
    C kernel loaded or the container has no compiler — the kernel is an
    engine swap, never a semantics change."""
    cases = _cases()
    al = [a for a, _ in cases]
    bl = [b for _, b in cases]
    for match, mm, go, ge in [(0, 4, 6, 2), (0, 4, -1, 2)]:
        with_native_s = list(_route_scores(al, bl, match, mm, go, ge))
        with_native_c = _route_cigars(al, bl, match, mm, go, ge)
        monkeypatch.setattr(nat, "_lib", None)
        monkeypatch.setattr(nat, "_tried", True)
        assert not nat.available()
        numpy_s = list(_route_scores(al, bl, match, mm, go, ge))
        numpy_c = _route_cigars(al, bl, match, mm, go, ge)
        monkeypatch.undo()
        assert with_native_s == numpy_s
        assert with_native_c == numpy_c
        for k, (a, b) in enumerate(cases):
            ps, pc = _affine_align(a, b, match, mm, go, ge)
            assert with_native_s[k] == ps
            assert with_native_c[k] == pc


@needs_native
def test_native_gate_respects_slab_size(monkeypatch):
    """Pairs above the shortcut gates must keep the certificate routing
    (C scratch stays bounded); shrinking the gates to 0 must still return
    exact results through the banded/numpy paths (with native full-DP
    legs for scores)."""
    rng = random.Random(11)
    a = "".join(rng.choice(ALPHA) for _ in range(300))
    b = _mutate(rng, a, 0.02)
    monkeypatch.setattr(al_mod, "_NATIVE_SHORTCUT_CELLS_SCORES", 0)
    monkeypatch.setattr(al_mod, "_NATIVE_SHORTCUT_CELLS_CIGARS", 0)
    s = list(_route_scores([a, b], [b, a], 0, 4, 6, 2))
    c = _route_cigars([a, b], [b, a], 0, 4, 6, 2)
    for k, (x, y) in enumerate([(a, b), (b, a)]):
        ps, pc = _affine_align(x, y, 0, 4, 6, 2)
        assert s[k] == ps and c[k] == pc


def test_disable_env_forces_numpy(monkeypatch):
    """SPARK_GRAFT_NO_NATIVE short-circuits the build probe entirely."""
    monkeypatch.setenv("SPARK_GRAFT_NO_NATIVE", "1")
    monkeypatch.setattr(nat, "_lib", None)
    monkeypatch.setattr(nat, "_tried", False)
    assert not nat.available()
    monkeypatch.undo()
