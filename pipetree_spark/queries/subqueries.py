"""Subquery queries (SURVEY §4.2 decorrelation rules).

These enter through the SQL lifecycle (``Engine.sql`` — SURVEY §3.2.2):
Catalyst rewrites correlated scalar subqueries to aggregated joins
(``RewriteCorrelatedScalarSubquery``) and IN/EXISTS predicates to
semi/anti joins (``RewritePredicateSubquery``) — asserted in
tests/test_plans.py. Float policy: the correlated aggregate is over an
INT column, so avg = exact-int-sum / count is a correctly-rounded double
on both engines (no rounding needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pipetree_spark.catalog import register_views
from pipetree_spark.queries import declare

_SCALAR_SQL = """
SELECT p.p_partkey, p.p_brand, p.p_size
FROM part p
WHERE p.p_size > (SELECT AVG(p2.p_size) FROM part p2 WHERE p2.p_brand = p.p_brand)
"""

_IN_SQL = """
SELECT c_custkey, c_nationkey
FROM customer
WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
"""

_NOTIN_SQL = """
SELECT s_suppkey, s_nationkey
FROM supplier
WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 1)
"""


def _sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)


@declare("q_subq_scalar", oracle=_SCALAR_SQL, tags=("subquery",))
def q_subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: parts bigger than their brand's mean
    size. Catalyst decorrelates to a per-brand aggregate + join — at
    100 TB that is one extra shuffle on the (low-cardinality) brand key,
    not a per-row re-scan."""
    return _sql(spark, sf_dir, _SCALAR_SQL)


@declare("q_subq_in", oracle=_IN_SQL, tags=("subquery",))
def q_subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery → left-semi join against a 5-row dim (broadcast)."""
    return _sql(spark, sf_dir, _IN_SQL)


@declare("q_subq_notin", oracle=_NOTIN_SQL, tags=("subquery",))
def q_subq_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery → null-aware anti join (the tricky one: NOT IN
    over a nullable column needs null-aware semantics; nationkeys are
    non-null so this plans as a plain broadcast anti join)."""
    return _sql(spark, sf_dir, _NOTIN_SQL)
