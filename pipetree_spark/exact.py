"""Cross-engine determinism helpers (SURVEY §2.0 round policy, upgraded).

The driver hash-compares Spark results against DuckDB. Two classes of
drift exist:

1. **Per-row scalar ops** (x*y, sqrt, substring...) are IEEE-identical
   across engines — safe to emit raw.
2. **Aggregation order** (sum/avg over doubles) differs run-to-run and
   engine-to-engine (~1e-7 absolute on sf0.1 money sums). ``round()``
   alone leaves a tiny boundary-flip risk, so sums here are computed in
   **exact decimal arithmetic** and only then cast back to double:
   ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)``. The double→decimal
   cast happens per-row on bit-identical doubles, the decimal sum is
   order-independent, and the final decimal→double cast is exact for the
   magnitudes in play — so both engines produce the *same bits*.

Statistical aggregates (stddev/corr/percentile) have no exact path; they
use the documented round() policy instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = (18, 2)  # decimal(precision, scale) for 2-dp money columns
DERIVED = (24, 6)  # for per-row derived products (price * (1-disc) ...)


def dec(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent (exact) sum of a double column, emitted as double.

    Oracle-side equivalent: ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)``.
    """
    return F.sum(dec(col, scale, precision)).cast("double")


def davg(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Exact-sum average: identical division of identical doubles.

    Oracle-side: ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE) / COUNT(x)``.
    """
    return dsum(col, scale, precision) / F.count(F.col(col) if isinstance(col, str) else col)


def dsum_sql(expr: str, scale: int = 2, precision: int = 18) -> str:
    """DuckDB-side twin of :func:`dsum` for oracle SQL strings."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 2, precision: int = 18) -> str:
    return f"{dsum_sql(expr, scale, precision)} / COUNT({expr})"


def r2(col: Column) -> Column:
    """Round-to-2dp policy for aggregates with no exact path (stddev...)."""
    return F.round(col, 2)


def r4(col: Column) -> Column:
    """Round-to-4dp policy for norms / cosines (SURVEY §2.12)."""
    return F.round(col, 4)
