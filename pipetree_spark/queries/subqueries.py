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

from pipetree_spark.catalog import load_table
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


@declare(
    "q_subq_recursive",
    oracle="""
WITH RECURSIVE months(m) AS (
  SELECT TIMESTAMP '1995-01-01 00:00:00'
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months WHERE m < TIMESTAMP '2001-08-01 00:00:00'
)
SELECT months.m AS month_start,
       COALESCE(o.n_orders, 0) AS n_orders
FROM months
LEFT JOIN (
  SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS m, COUNT(*) AS n_orders
  FROM orders GROUP BY 1
) o USING (m)
""",
    tags=("subquery", "timeseries"),
)
def q_subq_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.x `WITH RECURSIVE`): month spine over the
    order-date domain, zero-filled order counts per month.

    Recursion is the SQL-entry path — the DataFrame API equivalent is
    the sequence()-spine in q_ts_gapfill; declaring both proves the two
    spine-generation idioms agree. The recursion depth (~80 months) is
    driver-side plan unrolling, not data-scale-dependent.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_rec_v")
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT TIMESTAMP '1995-01-01 00:00:00'
          UNION ALL
          SELECT m + INTERVAL 1 MONTH FROM months WHERE m < TIMESTAMP '2001-08-01 00:00:00'
        )
        SELECT months.m AS month_start,
               COALESCE(o.n_orders, 0) AS n_orders
        FROM months
        LEFT JOIN (
          SELECT DATE_TRUNC('month', o_orderdate) AS m, COUNT(*) AS n_orders
          FROM orders_rec_v GROUP BY 1
        ) o USING (m)
        """
    )


@declare(
    "q_subq_exists_or",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND (o_orderpriority = '1-URGENT' OR o_totalprice > 300000.0)
)
""",
    tags=("subquery",),
)
def q_subq_exists_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with a disjunctive inner predicate — the shape
    that stresses decorrelation (the OR must stay inside the semi-join
    condition, not split into a union of scans)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_eor_v")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_eor_v")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment
        FROM customer_eor_v
        WHERE EXISTS (
          SELECT 1 FROM orders_eor_v
          WHERE o_custkey = c_custkey
            AND (o_orderpriority = '1-URGENT' OR o_totalprice > 300000.0)
        )
        """
    )


_LATERAL_SQL = """
SELECT n_name, c.c_name, c.c_acctbal
FROM nation, LATERAL (
  SELECT c_name, c_acctbal FROM customer
  WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) c
"""


@declare("q_subq_lateral", oracle=_LATERAL_SQL, tags=("subquery", "join"))
def q_subq_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    SQL spelling of top-k-per-group (here: top-2 customers per nation
    by balance, custkey tie-break). The same SQL text runs on both
    engines; Spark decorrelates the lateral into a
    DomainJoin/window-equivalent plan rather than re-executing the
    inner query per outer row — the plan property that separates a
    LATERAL that scales from one that is a hidden nested loop. The
    DataFrame-API twin of this shape is q_topk_pergroup
    (ops.relational.topk_per_group)."""
    return _sql(spark, sf_dir, _LATERAL_SQL)
