"""Order-independent numeric aggregation helpers.

Float SUM/AVG accumulate in partition/arrival order, so two runs (or two
engines) can differ at ~1 ULP; a downstream ``round(x, 6)`` then flips by
1e-6 whenever the true value straddles a rounding boundary. That exact
failure appeared once per ~3k rows at sf0.1 on q29's bitext branch
(margin 1.010356 vs 1.010358 — a 1e-6 flip in a 4-value neighborhood
average, amplified ×2 by the margin division) and is the bug class a
100 TB run hits constantly: more rows → more boundary values → more
flips.

The fix: quantize each addend to 10^-digits units, SUM AS INTEGERS
(exact and commutative — any order, any partitioning, any engine), and
divide once at the end. The quantization shifts each addend by ≤ 5e-7·
|x|... absolute 5·10^-(digits+1), below the 10^-digits precision every
caller already rounds to, and in exchange the result is a pure function
of the multiset of inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_avg(col: Column, digits: int = 6) -> Column:
    """AVG(col) as an exact integer-space mean: bit-identical across
    partitionings, run orders, and engines (SQL twin:
    :func:`stable_avg_sql`). NULLs are skipped like AVG's. The addend
    quantization uses the same explicit ``floor(x·s + 0.5)`` as
    :func:`stable_round` (engine ``round()`` is itself tie-divergent
    cross-engine); on exact ties it rounds toward +∞ — a fixed,
    engine-independent convention, which is the property that matters."""
    s = float(10**digits)
    # Two-tier accumulation (round-7 made this DECIMAL(38,0) per row to
    # close the silent BIGINT-wrap seam at 100 TB group sums — correct
    # but ~1.5× slower on the aggregation-heavy queries, since every row
    # paid a decimal add). Same exactness, long-speed rows: split the
    # quantized addend q into q = hi·2^16 + lo (both exact — q < 2^53 so
    # the double arithmetic is integer-exact, and the split is a power-
    # of-two exponent shift), SUM hi and lo as LONGS inside codegen, and
    # recombine in DECIMAL once per group. Measured on a 50M-row
    # 7-group aggregate (local[32], min-of-3): decimal-per-row 0.94 s,
    # this form 0.32 s. Overflow bounds per group:
    # sum(lo) < n·2^16 needs n < 2^47 rows (~1.4e14); sum(hi) <
    # n·|x|·10^digits/2^16 needs n·|x| < 6e17 at 6 digits — both orders
    # above any 100 TB group, and the old per-row decimal form's seam
    # (wrap at n·|x| ~ 9e12) is what this replaces. The recombined total
    # is the IDENTICAL exact integer the decimal form produced, so the
    # SQL twin (stable_avg_sql: exact HUGEINT sum) is unchanged.
    q = F.floor(col * s + F.lit(0.5))
    hi = F.floor(q / F.lit(65536.0))
    lo = (q - hi * F.lit(65536.0)).cast("long")
    total = F.sum(hi.cast("long")).cast("decimal(38,0)") * F.lit(65536) + F.sum(
        lo
    ).cast("decimal(38,0)")
    return (total / (F.count(col) * s)).cast("double")


def stable_round(col: Column, digits: int = 6) -> Column:
    """Cross-engine-identical 6-dp rounding: ``floor(x·10^d + 0.5)/10^d``.

    Engine ``round()`` implementations disagree on tie-adjacent doubles:
    Spark rounds via the double's exact decimal expansion (BigDecimal
    HALF_UP), DuckDB via an FP multiply whose 1-ULP error can land the
    other side of ``…5`` — measured on q29's bitext branch at sf0.1,
    where the stable_avg 0.2538195 rounded to 0.253820 in Spark and
    0.253819 in DuckDB. This explicit form runs the SAME IEEE ops in both
    engines on the same input double, so the result is bit-identical by
    construction. On exact ties it rounds toward +∞ (so −0.2538195 →
    −0.253819) — a fixed convention both engines share, which is what
    determinism needs; half-AWAY-from-zero symmetry is not. SQL twin:
    :func:`stable_round_sql`."""
    s = F.lit(float(10**digits))
    return F.floor(col * s + F.lit(0.5)) / s


def stable_round_sql(expr: str, digits: int = 6) -> str:
    """DuckDB twin of :func:`stable_round`."""
    s = 10**digits
    return f"(floor(({expr}) * {s} + 0.5) / {s}.0)"


def stable_avg_sql(expr: str, digits: int = 6) -> str:
    """DuckDB twin of :func:`stable_avg`: same quantize → integer SUM →
    one division, so both engines compute the identical double."""
    s = 10**digits
    return (
        f"SUM(CAST(floor(({expr}) * {s} + 0.5) AS BIGINT))"
        f" / (COUNT({expr}) * {s}.0)"
    )
