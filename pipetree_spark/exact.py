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


def safe_div(num: Column, den: Column) -> Column:
    """ANSI-safe division matching DuckDB's float semantics: x/0.0 is
    NULL there, but raises DIVIDE_BY_ZERO under Spark ANSI mode even on
    rows a later filter would drop. nullif(den, 0) reproduces the NULL
    result bit-for-bit; downstream filters/aggregations treat the NULL
    identically in both engines. Use for every denominator that can hit
    zero on legal data: zero-norm embeddings, (n-1) on singleton
    groups, zero variance on constant groups (both r7 torture-test
    findings)."""
    return num / F.nullif(den.cast("double"), F.lit(0.0))


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


def lsum(col: Column | str, scale: int = 2) -> Column:
    """Single-level exact sum via scaled-long accumulation — the fastest
    exact path (pure long math, whole-stage codegen, no decimal at all).

    Safe when (rows_per_GROUP × max|x|·10^scale) < 2⁶³ — a per-group
    bound, so use it for high-cardinality keys whose groups stay small
    as data grows (per-user, per-customer, per-hour-window aggregates:
    a customer with 15 orders has 15 orders at any SF). For few-group
    rollups where one group sees the whole table, use :func:`exact_sums`
    (two-level) instead — its partial bound is per-partition, not
    per-group. Emits double; oracle twin is the same ``dsum_sql``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c * F.lit(10**scale)).cast("long")) / F.lit(float(10**scale))


def exact_sums(
    df,
    keys,
    sums,
    count: str | None = None,
):
    """Two-level exact grouped sums — same bits as :func:`dsum`, ~4× faster.

    ``sums`` maps output name → (column, scale). Level 1 groups by
    (keys + spark_partition_id) and long-sums per-row scaled integers
    (``round(x·10^s)`` — exact for s-dp doubles, which sit within 1e-5 of
    an integer after scaling, so both engines round identically). Long
    math stays in whole-stage codegen; map-side combine emits one row per
    (key, partition). Level 2 decimal(38,0)-sums the ≤ num_partitions
    partials per group — exact at any data scale, with the slow decimal
    path amortized over partials instead of rows.

    Per-partial overflow bound: rows_per_partition × max(|x|·10^s) must
    stay < 2⁶³ — at 128 MiB parquet splits (~1e7 rows) that allows
    per-row scaled magnitudes up to ~9e11, far above any money column.

    Emits sums as DOUBLE (exact for totals < 2⁵³ scaled units; beyond
    that both engines round the same exact decimal to the nearest double
    — the decimal→double cast and the ``/10^s`` double division are both
    correctly rounded). ``count`` optionally adds an exact row count.
    """
    from pyspark.sql import functions as _F

    level1 = [
        _F.sum(_F.round((_F.col(c) if isinstance(c, str) else c) * _F.lit(10**s)).cast("long")).alias(
            f"__{n}"
        )
        for n, (c, s) in sums.items()
    ]
    level1.append(_F.count("*").alias("__n"))
    partials = df.groupBy(*keys, _F.spark_partition_id().alias("__pid")).agg(*level1)
    level2 = [
        (_F.sum(_F.col(f"__{n}").cast("decimal(38,0)")).cast("double") / float(10**s)).alias(n)
        for n, (_, s) in sums.items()
    ]
    if count is not None:
        level2.append(_F.sum("__n").alias(count))
    return partials.groupBy(*keys).agg(*level2)


def r2(col: Column) -> Column:
    """Round-to-2dp policy for aggregates with no exact path (stddev...)."""
    return F.round(col, 2)


def r4(col: Column) -> Column:
    """Round-to-4dp policy for norms / cosines (SURVEY §2.12)."""
    return F.round(col, 4)


def pin_zero(col: Column) -> Column:
    """Collapse ``-0.0`` to ``+0.0`` after a round() whose argument can be
    a tiny negative (log of a ratio just below 1, a difference, a
    correlation). The engines do NOT agree on the sign of a
    rounds-to-zero result — proven failure CORRECTNESS_r09 q_text_pmi:
    DuckDB ``round(log2(x), 2)`` emits ``-0.0`` where Spark emits
    ``+0.0``, bitwise-distinct under the driver's pandas value hash even
    though ``-0.0 == 0.0`` in Python. IEEE ``-0.0 + 0.0 = +0.0`` and
    ``x + 0.0 = x`` for every other value, so adding literal zero is an
    exact no-op everywhere except the one bit that drifts. MUST be
    paired with :func:`pz_sql` (or an explicit ``+ 0.0``) on the oracle
    side of the same column."""
    return col + F.lit(0.0)


def pz_sql(expr: str) -> str:
    """DuckDB-side twin of :func:`pin_zero` for oracle SQL strings."""
    return f"(({expr}) + 0.0)"
