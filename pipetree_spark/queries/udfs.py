"""UDF / UDAF / UDTF tier queries (SURVEY §2.11).

This maps the reference's entire compute surface — "run arbitrary
python over upstream data" (executor stages, SURVEY §2.10 [PK]) — onto
Spark's python-execution tiers, slowest to fastest:

- row-at-a-time ``@F.udf``       (pickle per row — demo only, never hot path)
- ``@F.pandas_udf`` scalar       (Arrow batches, vectorized)
- ``@F.pandas_udf`` grouped-agg  (UDAF)
- ``applyInPandas`` grouped-map  (UDTF-style reshape)

Float discipline: inside pandas UDAFs use ``math.fsum`` (exact,
order-independent) so a round(2) suffices against the oracle's
double sums.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipetree_spark.catalog import load_table
from pipetree_spark.queries import declare


@declare(
    "q_udf_row",
    oracle="""
SELECT CASE WHEN l_quantity >= 30 THEN 'high'
            WHEN l_quantity >= 10 THEN 'mid'
            ELSE 'low' END AS qty_band,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY 1
""",
    tags=("udf",),
)
def q_udf_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time python UDF (the slow tier — kept off hot paths)."""

    @F.udf(T.StringType())
    def qty_band(q: float) -> str:
        return "high" if q >= 30 else ("mid" if q >= 10 else "low")

    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy(qty_band("l_quantity").alias("qty_band")).agg(F.count("*").alias("n_items"))


@declare(
    "q_udf_pandas",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(LN(l_extendedprice) * (1 - l_discount), 4) AS score
FROM lineitem
""",
    tags=("udf",),
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF over Arrow batches (~10-100× the row
    tier). numpy's log agrees with the oracle's to the ulp; round(4)
    absorbs any last-bit drift."""

    @F.pandas_udf(T.DoubleType())
    def score(price: pd.Series, discount: pd.Series) -> pd.Series:
        import numpy as np

        return np.log(price) * (1.0 - discount)

    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(score("l_extendedprice", "l_discount"), 4).alias("score"),
    )


@declare(
    "q_udaf_pandas",
    oracle="""
SELECT l_returnflag,
       ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 2) AS weighted_avg_price
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("udf",),
)
def q_udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (UDAF): quantity-weighted mean price.
    math.fsum gives an exactly-rounded, order-independent sum so the
    comparison against DuckDB's double sum holds at round(2)."""

    @F.pandas_udf(T.DoubleType())
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return math.fsum((price * qty).tolist()) / math.fsum(qty.tolist())

    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(wavg("l_extendedprice", "l_quantity"), 2).alias("weighted_avg_price")
    )


@declare(
    "q_udtf_grouped",
    oracle="""
SELECT c_custkey,
       ROUND((c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_nationkey))
             / STDDEV_SAMP(c_acctbal) OVER (PARTITION BY c_nationkey), 4) AS z_score
FROM customer
""",
    tags=("udf",),
)
def q_udtf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (UDTF-style): per-nation z-score
    normalization — each group arrives as one pandas DataFrame.
    Scale note: a group must fit in one executor's memory; for wide
    groups switch to window functions (which this oracle uses)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf["c_acctbal"].mean()
        sd = pdf["c_acctbal"].std(ddof=1)
        return pd.DataFrame(
            {"c_custkey": pdf["c_custkey"], "z_score": ((pdf["c_acctbal"] - mean) / sd).round(4)}
        )

    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").applyInPandas(
        zscore, schema="c_custkey long, z_score double"
    )
