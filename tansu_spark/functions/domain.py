"""Explicit numeric-domain enforcement at ingest (r9 advice).

The engine's similarity/analytics oracles are only pinned over a
DOCUMENTED numeric domain (|event value| < 1e10 on the DECIMAL(12,2)
parity grid, |embedding component| within the exact-rational grid —
FIXTURES.md). Outside it the two engines genuinely diverge: DuckDB
raises on the DECIMAL cast, Spark silently NULLs. Rather than leaving
out-of-domain values merely untested, this module is the product's
reject/clamp path: callers validate at ingest and choose what happens
to violations, so an out-of-domain value can never reach an operator
whose cross-engine behavior is undefined.

Scale shape: every mode is a pure column expression (clamp/null) or a
filter (reject/split) — no shuffle, fully pushdown-friendly, and the
fail mode's violation probe is a single count over the filtered scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The documented event-value domain: DECIMAL(12,2) grid boundary.
EVENT_VALUE_ABS_MAX = 1e10


def in_domain(col: Column | str, lo: float, hi: float) -> Column:
    """Boolean column: value is NULL-or-within [lo, hi]. NULL is not a
    domain violation (it is the explicit missing marker); callers that
    also forbid NULL compose with ``isNotNull``."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNull() | ((c >= F.lit(lo)) & (c <= F.lit(hi)))


def enforce_domain(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    mode: str = "reject",
) -> DataFrame:
    """Apply the domain [lo, hi] to ``df[col]``.

    mode='reject' — drop violating rows (filter; the scale default).
    mode='clamp'  — pin violations to the nearest bound (least/greatest).
    mode='null'   — replace violations with NULL.
    mode='fail'   — raise ValueError if ANY violation exists (one count
                    job over the filtered scan), else return df unchanged.
    """
    ok = in_domain(col, lo, hi)
    if mode == "reject":
        return df.where(ok)
    if mode == "clamp":
        return df.withColumn(
            col,
            F.when(
                F.col(col).isNotNull(),
                F.least(F.greatest(F.col(col), F.lit(lo)), F.lit(hi)),
            ),
        )
    if mode == "null":
        return df.withColumn(col, F.when(ok, F.col(col)))
    if mode == "fail":
        n = df.where(~ok).limit(1).count()
        if n:
            raise ValueError(
                f"column {col!r} has values outside the documented domain "
                f"[{lo}, {hi}]; reject, clamp, or null them at ingest"
            )
        return df
    raise ValueError(f"unknown domain mode {mode!r}")
