"""Portable cardinality sketches (SURVEY §2.4 approx family).

HyperLogLog with the engine's portable hash discipline: the md5 base
hash and integer-only register math reproduce bit-for-bit in any engine
(the DuckDB twin lives in queries/aggregates.py:_hll_sql), unlike
Spark's native ``approx_count_distinct`` whose HLL++ sketch is opaque.
The frequency (count-min) and membership (Bloom) portable sketches are
certified inline as q_agg_countmin / q_agg_bloom; the broadcast Bloom
PREFILTER (xxhash64, production path) is ops/bloom.py.

Register frames are one-row ``array<int>`` artifacts like the Bloom
bitmap: bounded (m entries), broadcastable, and MERGEABLE — HLL
registers compose by element-wise MAX, so per-partition, per-day, or
per-table sketches roll up without touching raw data again. That merge
law is what makes the sketch THE distinct-count tool at 100 TB: exact
distinct shuffles every key; this shuffles m rows.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: md5 yields 60 usable bits (15 hex chars); after m=2^6 register bits,
#: 54 bits remain for the rank, so rho ∈ [1, 55].
_RANK_BITS = 54


def hll_registers(df: DataFrame, col: str, m: int = 64) -> DataFrame:
    """One-row frame (``registers: array<int>``, length ``m``): the
    HyperLogLog register vector of ``df[col]``.

    Hash: md5 → 60-bit integer; low log2(m) bits pick the register,
    the remaining bits' leading-zero rank (rho) is computed by a
    53-term integer comparison chain — no float log2 anywhere, so the
    sketch is bit-identical in every engine. One map-side-combined
    groupBy with ≤ m groups, then a single-row densify.
    """
    return hll_registers_by(df, col, [], m)


def hll_merge(*register_frames: DataFrame) -> DataFrame:
    """Merge register frames by element-wise MAX — the HLL composition
    law. Inputs must share ``m``. Broadcast-sized work: each input is
    one row."""
    merged = register_frames[0]
    for i, other in enumerate(register_frames[1:]):
        merged = (
            merged.crossJoin(F.broadcast(other.withColumnRenamed("registers", f"__r{i}")))
            .select(
                F.zip_with("registers", f"__r{i}", lambda a, b: F.greatest(a, b)).alias(
                    "registers"
                )
            )
        )
    return merged


def hll_estimate(registers_col: str = "registers", m: int = 64) -> list[Column]:
    """Projection columns (n_zeros, sum_scaled, est) deriving the HLL
    cardinality estimate from a register array.

    ``sum_scaled`` is Σ2^(-reg) in exact DECIMAL units of 2^-62 cast to
    double at the very end (correctly rounded in both engines); only
    the final estimate divides doubles — identical literals, identical
    op order vs the SQL twin. Linear counting below 2.5·m with zero
    registers present; 2-dp rounding absorbs the 1-ulp ln() latitude.
    """
    two62 = float(1 << 62)
    alpha_m2 = 0.709 * m * m
    n_zeros = F.expr(f"CAST(size(filter({registers_col}, x -> x = 0)) AS INT)")
    sum_scaled = F.expr(
        f"CAST(aggregate({registers_col}, CAST(0 AS DECIMAL(38,0)), (acc, x) ->"
        " acc + CAST(shiftleft(CAST(1 AS BIGINT), CAST(62 - x AS INT))"
        " AS DECIMAL(38,0))) AS DOUBLE)"
    )
    est_raw = F.lit(alpha_m2) / (sum_scaled / F.lit(two62))
    est = F.when(
        (est_raw <= F.lit(2.5 * m)) & (n_zeros > 0),
        F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / n_zeros), 2),
    ).otherwise(F.round(est_raw, 2))
    return [n_zeros.alias("n_zeros"), sum_scaled.alias("sum_scaled"), est.alias("est_hll")]


def hll_registers_by(
    df: DataFrame, col: str, group_cols: list[str], m: int = 64
) -> DataFrame:
    """Per-group HLL register vectors: one row per group with a dense
    ``registers: array<int>``. Same hash/rho math as
    :func:`hll_registers`; the groupBy key is (group_cols, j) so the
    map-side combine bounds state at m rows PER GROUP — the per-segment
    distinct-count summary (distinct users per day/type/tenant) that
    replaces a full-key shuffle at 100 TB. Register vectors from
    different runs merge per group with element-wise MAX (hll_merge's
    law), so daily group sketches roll up into monthly ones for free."""
    regs = hll_reg_cells(df, col, group_cols, m)
    return hll_densify(regs, group_cols, m)


def hll_reg_cells(
    df: DataFrame, col: str, group_cols: list[str], m: int = 64
) -> DataFrame:
    """The SPARSE per-group register relation ``(group_cols..., j,
    reg)`` — hll_registers_by before densification. Exposed because
    register-granularity rows compose RELATIONALLY: a sliding window /
    rollup / re-group is a join + ``max(reg)`` over this frame, where
    the dense array form would need array-unzip first."""
    if m & (m - 1) or m < 2:
        raise ValueError(f"m must be a power of two ≥ 2, got {m}")
    base_sql = (
        f"CAST(conv(substring(md5(CAST({col} AS STRING)), 1, 15), 16, 10) AS BIGINT)"
    )
    cells = df.select(
        *group_cols,
        F.expr(f"({base_sql}) % {m}").alias("j"),
        F.expr(f"({base_sql}) div {m}").alias("w"),
    )
    bits = F.lit(1) + functools.reduce(
        operator.add,
        [(F.col("w") >= F.lit(1 << k)).cast("int") for k in range(1, _RANK_BITS)],
    )
    rho = F.when(F.col("w") == 0, F.lit(_RANK_BITS + 1)).otherwise(
        F.lit(_RANK_BITS + 1) - bits
    )
    return (
        cells.select(*group_cols, "j", rho.alias("rho"))
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("reg"))
    )


def hll_densify(regs: DataFrame, group_cols: list[str], m: int = 64) -> DataFrame:
    """Sparse ``(group_cols..., j, reg)`` → one dense ``registers:
    array<int>`` row per group (absent registers are 0)."""
    return (
        regs.groupBy(*group_cols)
        .agg(F.map_from_arrays(F.collect_list("j"), F.collect_list("reg")).alias("__wm"))
        .select(
            *group_cols,
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda i: F.coalesce(F.element_at("__wm", i), F.lit(0)),
            ).alias("registers"),
        )
    )


#: Mersenne prime 2^61-1: the fingerprint modulus. Row-hash sums are
#: taken exactly in DECIMAL(38,0) (10^12 rows × 2^60 ≈ 2^100 < 10^38,
#: no overflow at any realistic scale), then reduced mod p so the
#: emitted fingerprint is a plain BIGINT in every engine.
FP_MOD = (1 << 61) - 1

#: Per-column NULL sentinel — concat_ws silently DROPS nulls, which
#: would alias (NULL,'a') with ('a',NULL); coalescing each column to a
#: control character that can't appear in real data keeps arity fixed.
_NULL_SENTINEL = "\x01"


def table_fingerprint(
    df: DataFrame, cols: list[str], group_cols: list[str] | None = None
) -> DataFrame:
    """Order-independent content fingerprint: one row per group with
    ``(group_cols..., n_rows, fp)`` where ``fp`` is the exact sum of
    60-bit md5 row hashes mod 2^61-1.

    The 100 TB table-equality tool: two tables (or a table and its
    replica/migration/backfill) are content-equal per group w.h.p. iff
    their (n_rows, fp) pairs match — no sort, no full-row shuffle,
    just one map-side-combined aggregate over the scan. The sum is
    COMMUTATIVE and MERGEABLE: fingerprints of partitions, days, or
    shards add (mod p) into the whole-table fingerprint, so a nightly
    incremental pipeline fingerprints only the new partition and folds
    it in.

    Callers pick ``cols`` with engine-stable string casts (ints,
    strings, pre-formatted dates — NOT raw doubles, whose shortest-
    repr stringification is engine-specific). Each column is NULL-
    coalesced to a sentinel so NULL layouts can't alias.
    """
    group_cols = list(group_cols or [])
    parts = ", ".join(
        f"coalesce(CAST({c} AS STRING), '{_NULL_SENTINEL}')" for c in cols
    )
    h = F.expr(
        f"CAST(conv(substring(md5(concat_ws('\x1f', {parts})), 1, 15), 16, 10) AS BIGINT)"
    )
    agg = (
        df.select(*group_cols, h.alias("__h"))
        .groupBy(*group_cols)
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("__h").cast("decimal(38,0)")).alias("__s"),
        )
    )
    return agg.select(
        *group_cols,
        "n_rows",
        F.expr(f"CAST(__s % {FP_MOD} AS BIGINT)").alias("fp"),
    )


def kmv_hash(col: str) -> Column:
    """The portable 60-bit md5 hash (same base hash as the HLL/CMS/
    Bloom family) as a BIGINT column — the KMV sketch's sample space."""
    return F.expr(
        f"CAST(conv(substring(md5(CAST({col} AS STRING)), 1, 15), 16, 10) AS BIGINT)"
    )


def kmv_sketch(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """K-minimum-values distinct sketch: the ≤k SMALLEST distinct
    60-bit hashes of ``df[col]``, as a k-row ``(h: bigint)`` frame.

    Why KMV next to HLL: registers only UNION (element-wise MAX), but
    KMV sketches INTERSECT — the shared k-min sample under one hash
    function is an unbiased Jaccard sample, so distinct-count
    estimates for A∩B (audience overlap, cross-day retention, join
    selectivity) come from two k-row frames instead of a full key
    shuffle. Fully deterministic given the hash: "k smallest" is a
    canonical set, so sketches are oracle-certifiable bit-for-bit.

    Plan: map-side hash projection → distinct (the only shuffle,
    bounded by distinct count) → TakeOrderedAndProject (per-partition
    k-heaps, k-row driver merge — no global sort).
    """
    return df.select(kmv_hash(col).alias("h")).distinct().orderBy("h").limit(k)


def kmv_union(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """The KMV composition law: the k smallest of the merged distinct
    hash sets IS the sketch of the union (k-row work)."""
    return a.unionByName(b).distinct().orderBy("h").limit(k)


def kmv_estimate(k: int) -> Column:
    """Cardinality estimate from a sketch's ``(cnt, hk)`` aggregate
    row: unsaturated sketches (cnt < k) hold EVERY distinct hash, so
    the count is exact; saturated ones use the order-statistic
    estimator (k-1) · 2^60 / h_k. Identical literals and op order on
    both engines; 2-dp rounding absorbs nothing here — the division
    is one correctly-rounded IEEE op on identical longs."""
    return F.when(F.col("cnt") < k, F.col("cnt").cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(float(1 << 60)) / F.col("hk"), 2)
    )
