"""Projection / filter / predicate queries (SURVEY §2.2).

All predicates are Column expressions (never Python lambdas) so Catalyst
pushes them into the parquet scan — `.explain` shows PushedFilters.
Per-row arithmetic is IEEE-identical across engines, so row-level
outputs are emitted raw; only the derived money column goes through the
exact-decimal cast (see exact.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipetree_spark.catalog import load_table
from pipetree_spark.exact import dec, dsum_sql
from pipetree_spark.queries import declare


@declare(
    "q_proj_select",
    oracle="""
SELECT c_custkey AS custkey,
       UPPER(c_name) AS name_upper,
       c_mktsegment AS segment,
       CAST(CAST(c_acctbal * 2 AS DECIMAL(18,2)) AS DOUBLE) AS double_bal
FROM customer
""",
    tags=("proj",),
)
def q_proj_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + rename + computed column; scan reads only 3 columns
    (ReadSchema pruning)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.upper("c_name").alias("name_upper"),
        F.col("c_mktsegment").alias("segment"),
        dec(F.col("c_acctbal") * 2).cast("double").alias("double_bal"),
    )


@declare(
    "q_filter_pred",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_quantity BETWEEN 5 AND 45
  AND l_returnflag IN ('A', 'R')
  AND NOT (l_discount > 0.08)
""",
    tags=("proj",),
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate AND/OR/NOT/IN/BETWEEN — fully pushed down."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(
        F.col("l_quantity").between(5, 45)
        & F.col("l_returnflag").isin("A", "R")
        & ~(F.col("l_discount") > 0.08)
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@declare(
    "q_filter_like",
    oracle="""
SELECT p_partkey, p_type, p_brand,
       CAST(p_type LIKE 'PROMO%' AS INT) AS is_promo,
       CAST(regexp_matches(p_brand, '[13579]$') AS INT) AS odd_brand
FROM part
WHERE p_type LIKE '%ECONOMY%' OR p_brand LIKE 'Brand#1%' OR contains(p_type, 'LARGE')
""",
    tags=("proj",),
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern predicates: LIKE / RLIKE / contains (portable regex only)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("%ECONOMY%")
        | F.col("p_brand").like("Brand#1%")
        | F.col("p_type").contains("LARGE")
    ).select(
        "p_partkey",
        "p_type",
        "p_brand",
        F.col("p_type").like("PROMO%").cast("int").alias("is_promo"),
        F.col("p_brand").rlike("[13579]$").cast("int").alias("odd_brand"),
    )


@declare(
    "q_filter_null",
    oracle="""
SELECT c_custkey,
       NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
       CAST(NULLIF(c_mktsegment, 'BUILDING') IS NULL AS INT) AS was_building,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'NONE') AS seg_filled
FROM customer
""",
    tags=("proj",),
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null semantics. Testdata is null-free (FIXTURES.md) so nulls are
    manufactured with nullif, then round-tripped through isNull/coalesce."""
    c = load_table(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        seg.alias("seg_or_null"),
        seg.isNull().cast("int").alias("was_building"),
        F.coalesce(seg, F.lit("NONE")).alias("seg_filled"),
    )


@declare(
    "q_case_when",
    oracle=f"""
SELECT CASE WHEN o_totalprice > 300000 THEN 'big'
            WHEN o_totalprice > 150000 THEN 'mid'
            ELSE 'small' END AS bucket,
       o_orderstatus,
       COUNT(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS sum_total
FROM orders
GROUP BY 1, 2
""",
    tags=("proj",),
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional projection feeding an aggregate."""
    o = load_table(spark, sf_dir, "orders")
    from pipetree_spark.exact import exact_sums

    bucket = (
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("small")
    )
    return exact_sums(
        o.withColumn("bucket", bucket),
        keys=["bucket", "o_orderstatus"],
        sums={"sum_total": ("o_totalprice", 2)},
        count="n_orders",
    )
