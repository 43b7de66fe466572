"""Set-operation queries (SURVEY §2.7).

Inputs are two multisets of nation keys (AUTOMOBILE customers' nations
vs suppliers' nations) so the ALL-variants have non-trivial
multiplicities. unionByName is used over union to stay schema-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipetree_spark.catalog import load_table
from pipetree_spark.queries import declare

_A_SQL = "SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'"
_B_SQL = "SELECT s_nationkey AS nationkey FROM supplier"


def _sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    a = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    b = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return a, b


@declare("q_set_union_all", oracle=f"{_A_SQL} UNION ALL {_B_SQL}", tags=("setop",))
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — multiplicities preserved (the hash is a multiset hash)."""
    a, b = _sides(spark, sf_dir)
    return a.unionByName(b)


@declare("q_set_union", oracle=f"{_A_SQL} UNION {_B_SQL}", tags=("setop",))
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct union (one shuffle for the dedup)."""
    a, b = _sides(spark, sf_dir)
    return a.unionByName(b).distinct()


@declare("q_set_intersect", oracle=f"{_A_SQL} INTERSECT ALL {_B_SQL}", tags=("setop",))
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — min-multiplicity bag semantics."""
    a, b = _sides(spark, sf_dir)
    return a.intersectAll(b)


@declare("q_set_except", oracle=f"{_A_SQL} EXCEPT ALL {_B_SQL}", tags=("setop",))
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiplicity-subtracting bag difference."""
    a, b = _sides(spark, sf_dir)
    return a.exceptAll(b)


@declare("q_set_distinct_ops", oracle=f"({_A_SQL} INTERSECT {_B_SQL}) UNION ALL ({_A_SQL} EXCEPT {_B_SQL})", tags=("setop",))
def q_set_distinct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct INTERSECT/EXCEPT variants, combined so both are graded."""
    a, b = _sides(spark, sf_dir)
    return a.intersect(b).unionByName(a.subtract(b))
