"""Exact monetary sums without per-row BigDecimal cost.

The round-8 100× parity sweep proved that double-summing money
diverges cross-engine in the 4th decimal once group sums reach ~3e11
(60M-row sums are summation-order-dependent beyond double's ~16
significant digits).  Round 8 fixed that with per-row
``CAST(x AS DECIMAL(18,4))`` sums — exact in any order, but Spark's
``Sum`` buffer for the resulting decimal(28,4) is a java BigDecimal,
and the per-row BigDecimal.add showed up directly in the flagship
query's wall-clock (agg_hash_groupby 0.55 s → 1.04 s, BENCH_r08 vs
r07).

This module keeps the exactness and drops the BigDecimal: a value on
the 4-decimal grid (quantities are integral, prices 2dp, price×(1−d)
exactly 4dp) is converted per-row to LONG ten-thousandths — an exact
integer — and summed with primitive long adds inside whole-stage
codegen.  Long addition is associative and exact, so the group total
is one exact integer in any summation order, and the final
divide-by-104 happens ONCE per group post-aggregation in DECIMAL
(6 groups, not 60M rows).

Overflow, the reason a bare long sum is NOT enough at 100 TB: with
values up to ~1e6 money units, one row contributes up to 1e10
ten-thousandths, so a single long sum wraps (or, with ANSI on,
raises) at ~9e8 rows per group — real TPC-H groups pass that around
SF150.  The fix is a hi/lo radix split: ``q = hi·100000 + lo`` with
``lo = q % 100000`` and ``hi = q div 100000``; each part is < 1e5 per
row, so BOTH long sums stay exact to ~9×10^13 rows per group —
petabytes of lineitem — and the exact total is reassembled in
decimal(38,0) arithmetic on the handful of post-agg group rows.
Beyond even that bound, ANSI mode (on by default in this session)
raises on the long-sum overflow instead of silently corrupting.

Verified: at sf0.1 and at 100× (6M / 60M rows) the split-long sum is
bit-identical to the DECIMAL(18,4) spelling and to DuckDB's decimal
sum, and the flagship query returned to its r7 cost (~0.55 s vs
1.04 s decimal, sf0.1 median-of-5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: ten-thousandths per money unit — the 4-decimal exactness grid
TT = 10_000
#: hi/lo radix: each split part is < SPLIT per row, so a long sum of
#: either part is exact to ~9.2e18 / 1e5 ≈ 9e13 rows per group
SPLIT = 100_000


def money_units(col: Column) -> Column:
    """Exact LONG ten-thousandths of a 4dp-grid double expression.

    The double carrying a 4dp-grid value is within ~1e-6 of the grid
    point (values < 1e6, relative error ~2^-52), so round-to-nearest
    recovers the exact integer."""
    return F.round(col * TT).cast("long")


def exact_money_sum(col: Column, alias: str | None = None) -> Column:
    """Order-independent EXACT sum of a 4dp-grid monetary expression,
    returned as double — same value as
    ``CAST(SUM(CAST(col AS DECIMAL(18,4))) AS DOUBLE)`` (and DuckDB's
    spelling of the same), at primitive-long speed.

    Use inside ``.agg(...)``; see module docstring for the scale
    bound (~9e13 rows per group) and overflow behavior (ANSI raise).
    """
    out = (exact_money_units_sum(col) / TT).cast("double")
    return out.alias(alias) if alias is not None else out


def exact_money_units_sum(col: Column, alias: str | None = None) -> Column:
    """Exact group sum of a 4dp-grid monetary expression as INTEGER
    ten-thousandths (``decimal(38,0)``) — the mergeable-partial form
    of :func:`exact_money_sum`.

    Use when a group's sum must survive a LATER re-aggregation (state
    + delta merge, rollup of persisted partials): integer partials
    re-sum exactly in any order and any grouping, whereas re-summing
    the rounded DOUBLE output of :func:`exact_money_sum` can be off
    in the last ulp when a group is split across partials.  Convert
    back once at the end: ``(F.sum(units) / money.TT).cast("double")``
    via :func:`money_from_units_sum`."""
    q = money_units(col)
    lo = q % SPLIT
    hi = (q - lo) / F.lit(SPLIT)
    hi = hi.cast("long")
    total = F.sum(hi).cast("decimal(38,0)") * SPLIT + F.sum(lo)
    return total.alias(alias) if alias is not None else total


def money_from_units_sum(col: Column, alias: str | None = None) -> Column:
    """Final merge step for :func:`exact_money_units_sum` partials:
    re-sum the integer partials exactly, divide by the grid ONCE."""
    out = (F.sum(col) / TT).cast("double")
    return out.alias(alias) if alias is not None else out
