"""Sort / limit / top-k queries (SURVEY §2.6).

The driver's value-hash is order-insensitive, so sort correctness is
asserted via rank columns (the rank encodes the order), never via row
order. Every ORDER BY carries a unique tie-break key — limits without a
total order are nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pipetree_spark.catalog import load_table
from pipetree_spark.ops.relational import zorder_key
from pipetree_spark.exact import dsum, dsum_sql, exact_sums, lsum
from pipetree_spark.queries import declare


@declare(
    "q_sort_multi",
    oracle="""
SELECT * FROM (
  SELECT ROW_NUMBER() OVER (ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC) AS rnk,
         o_orderkey, o_orderstatus, o_totalprice
  FROM orders
) WHERE rnk <= 100
""",
    tags=("sort",),
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column sort asserted through a bounded top-100 rank.

    Scale shape: since the rank is immediately bounded to 100 rows, the
    global ``row_number`` window (single-reducer full sort of the whole
    relation) is replaced by ``orderBy().limit(100)`` —
    TakeOrderedAndProject, a per-partition bounded heap + driver merge
    of 100-row heads — and ONLY the surviving 100 rows are re-ranked
    (a window over ≤100 rows, trivially single-partition). Identical
    output, no full-relation sort at any scale.
    """
    o = load_table(spark, sf_dir, "orders")
    keys = [
        F.col("o_orderstatus").asc(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    ]
    top = (
        o.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(*keys)
        .limit(100)
    )
    return top.withColumn("rnk", F.row_number().over(Window.orderBy(*keys)))


@declare(
    "q_limit",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 50
""",
    tags=("sort",),
)
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy().limit() → TakeOrderedAndProject (per-partition top-k +
    driver merge of k-sized heads — no global sort, scale-safe)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(50)
    )


@declare(
    "q_topk_global",
    oracle=f"""
SELECT o_custkey, {dsum_sql('o_totalprice')} AS spend
FROM orders
GROUP BY o_custkey
ORDER BY spend DESC, o_custkey ASC
LIMIT 10
""",
    tags=("sort", "bench"),
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k spenders: hash agg then TakeOrderedAndProject.
    The exact-decimal spend makes the DESC comparison deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(lsum("o_totalprice").alias("spend"))
        .orderBy(F.col("spend").desc(), F.col("o_custkey").asc())
        .limit(10)
    )


def _zorder_sql(bits: int = 5) -> str:
    """DuckDB twin of q_sort_zorder — the identical BIGINT interleave,
    spelled with DuckDB's native shift/mask operators."""
    terms = []
    for k in range(bits):
        terms.append(f"(((n >> {k}) & 1) << {2 * k})")
        terms.append(f"(((b >> {k}) & 1) << {2 * k + 1})")
    z = " + ".join(terms)
    return f"""
WITH d AS (
  SELECT CAST(c_nationkey AS BIGINT) AS n,
         (CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000) // 35000 AS b
  FROM customer),
z AS (SELECT n, b, ({z}) // 32 AS zbucket FROM d)
SELECT zbucket, COUNT(*) AS n_rows,
       MIN(n) AS min_nation, MAX(n) AS max_nation,
       MIN(b) AS min_bal, MAX(b) AS max_bal
FROM z GROUP BY zbucket
"""


@declare("q_sort_zorder", oracle=_zorder_sql(), tags=("sort", "layout"))
def q_sort_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key (ops.relational.zorder_key) over
    customer (nation × account-balance bucket), summarized per
    32-way z-range bucket with each bucket's min/max box in BOTH
    dimensions.

    The point of the layout: range-partitioning a table by this key
    makes every partition a tight rectangle in (nation, balance) —
    the min/max columns in the result ARE the parquet row-group stats
    a scan would prune with, so filters on EITHER dimension skip most
    of a z-laid-out table, where a single-column sort serves only its
    own column. The key is pure BIGINT shift/mask arithmetic (balance
    enters as exact cents, the engine's decimal policy), so the
    driver certifies the interleave bit-for-bit; the locality claim
    itself is pinned by pytest (z-contiguous chunks bound both dims).

    Scale shape: the key is a narrow map-side projection (whole-stage
    codegen, no UDF); the summary is one 32-group aggregate. The
    production write path is ``repartitionByRange(z).write`` — same
    key, no extra shuffle beyond the range partitioner.
    """
    c = load_table(spark, sf_dir, "customer")
    d = c.select(
        F.col("c_nationkey").cast("long").alias("n"),
        F.expr(
            "(CAST(round(c_acctbal * 100) AS BIGINT) + 100000) div 35000"
        ).alias("b"),
    )
    z = zorder_key("n", "b", bits=5)
    return (
        d.select("n", "b", F.shiftright(z, 5).alias("zbucket"))
        .groupBy("zbucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("n").alias("min_nation"),
            F.max("n").alias("max_nation"),
            F.min("b").alias("min_bal"),
            F.max("b").alias("max_bal"),
        )
    )
