"""Broadcast Bloom-filter prefilters (SURVEY §2.12 scale tooling).

The 100 TB anti-/semi-join accelerator: when one side of a membership
test is small (an eval set, a blocklist, a seen-ledger) and the other
is the corpus, build a ~KB–MB bitmap over the small side ONCE, ship it
to every executor, and drop non-members map-side before any join or
shuffle touches the big side. A Bloom filter never produces false
negatives, so `bloom prefilter → exact verify on survivors` returns
the EXACT answer while the verify join only sees the (tiny) candidate
stream — the same prefilter-then-verify contract as the LSH dedup path
(ops/text.py) and the ANN shortlist re-rank (ops/vector.py).

Representation: one single-row DataFrame with an ``array<bigint>``
bitmap column — broadcast via ``crossJoin(F.broadcast(...))`` exactly
like the engine's other bounded model artifacts (centroids, codebooks,
vocab tables). No driver collect anywhere; the bitmap is built by a
distributed ``bit_or`` aggregation.

Hashing: ``xxhash64(value, seed_i)`` for ``num_hashes`` independent
seeds — JVM-side, codegen'd, identical on every executor. Sizing rule
(standard Bloom math): for ``n`` distinct keys and target false-
positive rate ``eps``, ``num_bits ≈ 1.44 · n · log2(1/eps)`` and
``num_hashes ≈ 0.7 · num_bits / n``. The defaults (2^17 bits = 16 KiB,
k=5) give eps < 1% out to ~18k keys; at 100 TB you would size from the
small side's count, which stays cheap because the bitmap grows with
the SMALL side only.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_BITS = 1 << 17
DEFAULT_NUM_HASHES = 5


def _probe_bits(col: str, num_bits: int, num_hashes: int) -> list[str]:
    """SQL exprs for the ``num_hashes`` probe bit positions of ``col``.

    String-built exprs (not Column ops) because ``shiftleft``'s Python
    signature only takes a literal shift amount; the SQL function takes
    a column. ``col`` must be a plain column name (no injection risk:
    callers pass engine-internal names).
    """
    return [
        f"pmod(xxhash64({col}, {i}), {num_bits})" for i in range(num_hashes)
    ]


def bloom_build(
    df: DataFrame,
    col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
    chunk_words: int = 4096,
) -> DataFrame:
    """Aggregate ``df[col]`` into a one-row Bloom bitmap DataFrame
    (column ``bloom_bits: array<bigint>``, length ``num_bits/64``).

    Plan (r16, guide §2.3/§4.1): explode each key into its k probe
    positions (narrow), one shuffle on the 64-bit word index for the
    ``bit_or`` partial aggregation (map-side combined, ≤ ``num_bits/64``
    groups), then a JVM-only densify — a global aggregate (always emits
    exactly ONE row, even over an empty member set, so the old (0, 0)
    seed-row union is gone) whose ``map_from_entries`` lookup table is
    walked by one ``transform(sequence(...))``. No Python worker, no
    Arrow boundary, no grouped-map shuffle in the critical path of what
    is almost always a broadcast build (the r15 applyInPandas densify
    put a Python stage + a single-group exchange there, and the
    seed-row union's partitioning measurably destabilized the decontam
    bench — W5 rejection).

    Large-bitmap regime (the ≥10⁷-member escalation): cost scales with
    the SMALL side and the final task is bounded by the BITMAP size,
    never the member count. Above ``chunk_words`` words the densify
    runs two-level (tree-reduce): per-chunk partial arrays built in a
    parallel ``__w div chunk_words`` aggregation, then one final
    flatten of ≤ ``n_words/chunk_words`` chunk rows — so the single
    final task concatenates pre-built arrays instead of scattering
    every word itself. The output is a bounded artifact safe to
    broadcast (16 KiB at the defaults, 128 MiB at the 2^30-bit ceiling
    you'd size for ~10⁸ members at 1% eps).
    """
    if num_bits % 64:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    n_words = num_bits // 64
    probes = df.select(
        F.explode(
            F.array(*[F.expr(e) for e in _probe_bits(col, num_bits, num_hashes)])
        ).alias("__bit")
    )
    words = probes.select(
        (F.col("__bit") / 64).cast("int").alias("__w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__bit % 64 AS INT))").alias("__m"),
    )
    sparse = words.groupBy("__w").agg(F.bit_or("__m").alias("__bits"))
    zero = "CAST(0 AS BIGINT)"
    if n_words <= chunk_words:
        # single-level: one global agg → one map build → one walk.
        # The map is materialized as its own projection first: HOF
        # lambdas evaluate interpreted (no CSE), so an inline
        # map_from_entries would rebuild the map once PER ELEMENT.
        kv = sparse.agg(
            F.map_from_entries(F.collect_list(F.struct("__w", "__bits"))).alias("__kv")
        )
        return kv.select(
            F.expr(
                f"transform(sequence(0, {n_words - 1}),"
                f" i -> coalesce(__kv[i], {zero})) AS bloom_bits"
            )
        )
    # ceil-divide: the last chunk may be short — the flatten below is
    # built at full chunk width and sliced back to n_words, so any
    # num_bits (multiple of 64) works, not just chunk multiples
    n_chunks = -(-n_words // chunk_words)
    # level 1 (parallel): per-chunk dense arrays, keyed by chunk id
    chunks = (
        sparse.groupBy(F.expr(f"__w div {chunk_words}").cast("int").alias("__g"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.expr(f"__w % {chunk_words}"), F.col("__bits")))
            ).alias("__kv")
        )
        .select(
            "__g",
            F.expr(
                f"transform(sequence(0, {chunk_words - 1}),"
                f" i -> coalesce(__kv[i], {zero})) AS __arr"
            ),
        )
    )
    # level 2: one global agg over ≤ n_chunks pre-built rows; missing
    # chunks (no set bits in their range) zero-fill via array_repeat
    gk = chunks.agg(
        F.map_from_entries(F.collect_list(F.struct("__g", "__arr"))).alias("__gk")
    )
    return gk.select(
        F.expr(
            f"slice(flatten(transform(sequence(0, {n_chunks - 1}),"
            f" g -> coalesce(__gk[g], array_repeat({zero}, {chunk_words})))),"
            f" 1, {n_words}) AS bloom_bits"
        )
    )


def bloom_might_contain(
    col: str,
    bits_col: str = "bloom_bits",
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> Column:
    """Boolean membership-test Column: true iff every probe bit of
    ``col`` is set in ``bits_col``. No false negatives; false positives
    at the sized eps. Pure JVM expression (xxhash64 + element_at + bit
    ops) — codegen'd, no UDF, no shuffle. ``num_bits``/``num_hashes``
    MUST match the ``bloom_build`` call that produced the bitmap."""
    conds = [
        F.expr(
            f"(element_at({bits_col}, CAST({p} / 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST({p} % 64 AS INT))) != 0"
        )
        for p in _probe_bits(col, num_bits, num_hashes)
    ]
    return functools.reduce(operator.and_, conds)


def bloom_prefilter(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Keep only rows whose ``col`` MIGHT be in the set ``bloom`` was
    built from (never drops a true member). Broadcast one-row cross
    join + map-side filter: the big side never shuffles, survivors
    carry the original schema. Follow with an exact semi/anti join on
    the survivors for an exact final answer."""
    if "bloom_bits" in df.columns:
        raise ValueError(
            "df already has a 'bloom_bits' column — rename it before prefiltering"
        )
    return (
        df.crossJoin(F.broadcast(bloom))
        .filter(bloom_might_contain(col, "bloom_bits", num_bits, num_hashes))
        .drop("bloom_bits")
    )
