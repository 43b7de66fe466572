"""TPC-H-derived analytical query suite (SURVEY §2 extension).

The driver's testdata is a TPC-H-like schema (FIXTURES.md), so the
classic TPC-H workload is the natural "complete analytics engine"
acceptance suite: multi-way joins, correlated subqueries, scalar
subqueries against aggregates, conditional ratios, top-k with
post-aggregation order. Queries below are *adapted* to the columns that
exist (no ``partsupp`` table; lineitem has no commit/receipt dates, so
"late" predicates are derived from ``l_shipdate - o_orderdate``; part
names are adjective–noun pairs). Each docstring states the adaptation.

Exactness policy: money sums use the exact-decimal / scaled-long paths
from :mod:`pipetree_spark.exact` so the driver's value-hash is
bit-stable across engines; quantity sums are integral doubles (1..50,
FIXTURES.md) and therefore order-independent in IEEE double as-is.
Every ORDER BY ... LIMIT query carries a unique-key tie-break so the
selected row set is deterministic (SURVEY §7 "hard parts").

Reference note: the reference (pipetree/pipetree — an ML pipeline
orchestrator; /root/reference is empty, SURVEY §0) has no SQL surface;
this suite is north-star extension coverage [SURVEY §2.0 tag E].

100 TB notes are per-query: the dominant pattern is fact-fact join on
orderkey (co-bucketable), dims broadcast, aggregation pushed below the
dimension join wherever the group key allows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pipetree_spark.catalog import load_table
from pipetree_spark.exact import dsum, dsum_sql, exact_sums, lsum
from pipetree_spark.queries import declare

def _rev():
    """Per-row discounted revenue (built lazily: F.col needs a live session)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


REV_SQL = "l_extendedprice * (1 - l_discount)"


def _t(spark: SparkSession, sf_dir: str, *names: str):
    return [load_table(spark, sf_dir, n) for n in names]


# --------------------------------------------------------------------------
# Q2 (adapted): regional minimum-price part per type.
# Original Q2 ranks suppliers by partsupp supply cost; without partsupp we
# keep its essence — "per (region, part-type), the cheapest part actually
# supplied into that region" — via the lineitem→supplier→nation→region path.
# --------------------------------------------------------------------------
@declare(
    "q_tpch_q2",
    oracle=f"""
WITH rp AS (
  SELECT r_name, p_type, p_partkey, p_retailprice,
         MIN(p_retailprice) OVER (PARTITION BY r_name, p_type) AS min_price
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  JOIN region   ON r_regionkey = n_regionkey
)
SELECT DISTINCT r_name, p_type, p_partkey, p_retailprice
FROM rp WHERE p_retailprice = min_price
""",
    tags=("tpch", "join", "window"),
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-by-group selection via window MIN (no self-join re-scan).

    100 TB: part/supplier/nation/region are dims (broadcast); the only
    shuffle is the window partition on (r_name, p_type) AFTER projecting
    to the 4 needed columns. Raw-double equality is safe: both engines
    compare the identical stored bits.
    """
    part, l, s, n, r = _t(spark, sf_dir, "part", "lineitem", "supplier", "nation", "region")
    j = (
        l.select("l_partkey", "l_suppkey")
        .join(F.broadcast(part.select("p_partkey", "p_type", "p_retailprice")), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_regionkey")), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
    )
    w = Window.partitionBy("r_name", "p_type")
    return (
        j.select("r_name", "p_type", "p_partkey", "p_retailprice")
        .withColumn("min_price", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("min_price"))
        .select("r_name", "p_type", "p_partkey", "p_retailprice")
        .distinct()
    )


# --------------------------------------------------------------------------
# Q3: shipping-priority candidate orders (verbatim shape; no o_shippriority
# column, so it is dropped from the projection).
# --------------------------------------------------------------------------
@declare(
    "q_tpch_q3",
    oracle="""
SELECT l_orderkey,
       CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue,
       o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-07-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    tags=("tpch", "join", "topk"),
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 unshipped orders by revenue for one market segment.

    Spark plans orderBy().limit() as TakeOrderedAndProject — no global
    sort at scale. customer is dim-sized relative to orders (broadcast
    the filtered segment); lineitem⋈orders co-bucketable on orderkey.
    Per-order revenue uses the scaled-long exact sum (≤13 lines/order
    at any SF — FIXTURES.md), so cross-engine ordering is bit-stable.
    """
    c, o, l = _t(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1998-07-01 00:00:00").cast("timestamp")
    return (
        l.filter(F.col("l_shipdate") > cutoff)
        .join(o.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(lsum(_rev(), scale=6).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q4 (adapted): order-priority checking. Original counts orders with a line
# whose commitdate < receiptdate; lineitem has neither, so "problem order"
# is adapted to "a line shipped > 60 days after the order date".
# --------------------------------------------------------------------------
@declare(
    "q_tpch_q4",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
""",
    tags=("tpch", "join", "subquery"),
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS decorrelated to a left-semi join with a non-equi residual.

    Spark rewrites the semi join to shuffle on orderkey with the date
    inequality as a join residual — no per-row subquery execution.
    """
    o, l = _t(spark, sf_dir, "orders", "lineitem")
    o_f = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o_f.join(l.select("l_orderkey", "l_shipdate"), cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --------------------------------------------------------------------------
# Q5: local supplier volume (verbatim shape).
# --------------------------------------------------------------------------
@declare(
    "q_tpch_q5",
    oracle=f"""
SELECT n_name, {dsum_sql(REV_SQL, 6, 24)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""",
    tags=("tpch", "join"),
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-way join where customer and supplier must share a nation.

    Join order: fact-fact (lineitem⋈orders) first on orderkey, then
    broadcast dims; the c_nationkey = s_nationkey residual rides on the
    customer join rather than forcing an extra shuffle. ≤25 output
    groups → exact_sums two-level path.
    """
    c, o, l, s, n, r = _t(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    asia_nations = n.join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey")).select(
        "n_nationkey", "n_name"
    )
    j = (
        l.join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            ).select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(c.select("c_custkey", "c_nationkey")),
            (F.col("o_custkey") == F.col("c_custkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return exact_sums(j, keys=["n_name"], sums={"revenue": (_rev(), 6)})


# --------------------------------------------------------------------------
# Q6: forecasting revenue change (verbatim shape).
# --------------------------------------------------------------------------
@declare(
    "q_tpch_q6",
    oracle=f"""
SELECT {dsum_sql('l_extendedprice * l_discount', 6, 24)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
""",
    tags=("tpch", "agg"),
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan-filter-sum; every predicate pushes to the parquet scan.

    Single global group → two-level exact sum (long partials per
    partition, decimal only across ≤num_partitions partials).
    """
    (l,) = _t(spark, sf_dir, "lineitem")
    f = l.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    )
    return exact_sums(f, keys=[], sums={"revenue": (F.col("l_extendedprice") * F.col("l_discount"), 6)})


# --------------------------------------------------------------------------
# Q7 (adapted): volume shipping. Original pins two nations; to stay
# non-empty at every SF (supplier nations are sparse at sf0.001) we keep
# ALL cross-nation pairs — same plan shape, wider group key.
# --------------------------------------------------------------------------
@declare(
    "q_tpch_q7",
    oracle=f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
       {dsum_sql(REV_SQL, 6, 24)} AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_nationkey <> n2.n_nationkey
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n1.n_name, n2.n_name, l_year
""",
    tags=("tpch", "join"),
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-nation trade volume by year; two aliased dim joins.

    ≤ 25·24·2 groups — exact_sums two-level path. The nation dim joins
    broadcast; only the fact-fact orderkey join shuffles.
    """
    s, l, o, c, n = _t(spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    j = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(o.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .withColumn("l_year", F.year("l_shipdate"))
    )
    return exact_sums(j, keys=["supp_nation", "cust_nation", "l_year"], sums={"revenue": (_rev(), 6)})


# --------------------------------------------------------------------------
# Q8: national market share (verbatim shape; p_type is a single word here).
# --------------------------------------------------------------------------
@declare(
    "q_tpch_q8",
    oracle=f"""
SELECT o_year,
       {dsum_sql("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END", 6, 24)}
       / {dsum_sql('volume', 6, 24)} AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         {REV_SQL} AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
) GROUP BY o_year
""",
    tags=("tpch", "join"),
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-volume ratio per order year.

    Both sums are exact (two-level), so the final double division is
    bit-identical across engines — no rounding needed on the ratio.
    """
    part, l, s, o, c, n, r = _t(spark, sf_dir, "part", "lineitem", "supplier", "orders", "customer", "nation", "region")
    america = (
        n.join(F.broadcast(r.filter(F.col("r_name") == "AMERICA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    n2 = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation"))
    j = (
        l.join(F.broadcast(part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(america), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .select(F.year("o_orderdate").alias("o_year"), _rev().alias("volume"), "nation")
    )
    g = exact_sums(
        j,
        keys=["o_year"],
        sums={
            "nat_vol": (F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0.0)), 6),
            "all_vol": (F.col("volume"), 6),
        },
    )
    return g.select("o_year", (F.col("nat_vol") / F.col("all_vol")).alias("mkt_share"))


# --------------------------------------------------------------------------
# Q9 (adapted): product-type profit. No partsupp → profit has no
# ps_supplycost term; amount = discounted revenue for parts named '%red%'.
# --------------------------------------------------------------------------
@declare(
    "q_tpch_q9",
    oracle=f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
       {dsum_sql(REV_SQL, 6, 24)} AS sum_profit
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
""",
    tags=("tpch", "join"),
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation × order year for one part family."""
    part, l, s, o, n = _t(spark, sf_dir, "part", "lineitem", "supplier", "orders", "nation")
    j = (
        l.join(F.broadcast(part.filter(F.col("p_name").like("%red%")).select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(o.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n.select("n_nationkey", F.col("n_name").alias("nation"))), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("o_year", F.year("o_orderdate"))
    )
    return exact_sums(j, keys=["nation", "o_year"], sums={"sum_profit": (_rev(), 6)})


# --------------------------------------------------------------------------
# Q10: returned-item reporting (verbatim shape, top 20).
# --------------------------------------------------------------------------
@declare(
    "q_tpch_q10",
    oracle="""
SELECT c_custkey, c_name,
       CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("tpch", "join", "topk"),
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by returned revenue in a half-year window.

    Aggregates on c_custkey BEFORE attaching the wide customer columns
    would need a re-join; group cardinality is |customers in window|,
    small relative to lineitem, so grouping after the dim join is the
    simpler plan with the same shuffle volume (keys carry the payload).
    Per-customer scaled-long sums stay exact at any SF (a customer's
    order count is SF-invariant — FIXTURES.md).
    """
    c, o, l, n = _t(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    j = (
        l.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
            ).select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(lsum(_rev(), scale=6).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q11 (adapted): important part values. No partsupp → "value" of a part is
# its discounted-revenue volume from EUROPE-based suppliers; keep parts
# whose value exceeds 0.1% of the total (scalar-subquery threshold).
# --------------------------------------------------------------------------
@declare(
    "q_tpch_q11",
    oracle=f"""
WITH pv AS (
  SELECT l_partkey AS partkey,
         CAST(SUM(CAST(ROUND(({REV_SQL}) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS value
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  JOIN region   ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey
)
SELECT partkey, value FROM pv
WHERE value > (
  SELECT CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 FROM pv
) * 0.001
""",
    tags=("tpch", "join", "subquery"),
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts above a global-fraction threshold (scalar subquery).

    Per-part lineitem count is SF-invariant (parts scale with lineitem)
    → scaled-long sums. The global total is a single-row broadcast, so
    the threshold filter adds no shuffle. Exact sums make the 0.001·total
    comparison deterministic cross-engine.
    """
    l, s, n, r = _t(spark, sf_dir, "lineitem", "supplier", "nation", "region")
    euro_supp = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    pv = (
        l.join(F.broadcast(euro_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(lsum(_rev(), scale=6).alias("value"))
    )
    total = pv.agg(F.sum(F.round(F.col("value") * F.lit(10**6)).cast("long")).alias("tot6"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("value") > (F.col("tot6") / F.lit(1e6)) * F.lit(0.001))
        .select("partkey", "value")
    )


# --------------------------------------------------------------------------
# Q12 (adapted): shipping-delay classes. lineitem has no shipmode /
# commit / receipt dates, so the Q12 buckets become delay classes from
# l_shipdate - o_orderdate, keeping the CASE-counting shape.
# --------------------------------------------------------------------------
@declare(
    "q_tpch_q12",
    oracle="""
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30  THEN 'FAST'
            WHEN date_diff('day', o_orderdate, l_shipdate) <= 180 THEN 'MEDIUM'
            ELSE 'SLOW' END AS delay_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY delay_class
""",
    tags=("tpch", "join"),
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority mix per shipping-delay class (conditional counts).

    Day difference on midnight-aligned ms timestamps is an exact integer
    in both engines (FIXTURES.md: no time-of-day component).
    """
    o, l = _t(spark, sf_dir, "orders", "lineitem")
    dd = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(o.select("o_orderkey", "o_orderdate", "o_orderpriority"), F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "delay_class",
            F.when(dd <= 30, "FAST").when(dd <= 180, "MEDIUM").otherwise("SLOW"),
        )
        .groupBy("delay_class")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q13: customer order-count distribution (verbatim; no comment-pattern
# exclusion — orders has no comment column).
# --------------------------------------------------------------------------
@declare(
    "q_tpch_q13",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
""",
    tags=("tpch", "join", "agg"),
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of orders-per-customer incl. zero-order customers.

    COUNT(col) over the left join counts only matched rows — the
    outer-null row contributes 0, exactly the distribution's zero
    bucket (~9% of customers — FIXTURES.md integrity notes).
    """
    c, o = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        c.select("c_custkey")
        .join(o.select("o_orderkey", "o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# Q14: promotion effect (p_type is a single word → equality, not LIKE).
# --------------------------------------------------------------------------
@declare(
    "q_tpch_q14",
    oracle=f"""
SELECT 100.00 * {dsum_sql("CASE WHEN p_type = 'PROMO' THEN " + REV_SQL + " ELSE 0 END", 6, 24)}
       / {dsum_sql(REV_SQL, 6, 24)} AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
""",
    tags=("tpch", "join"),
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo share of one month's revenue — exact-sum ratio."""
    l, part = _t(spark, sf_dir, "lineitem", "part")
    j = l.filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    ).join(F.broadcast(part.select("p_partkey", "p_type")), F.col("l_partkey") == F.col("p_partkey"))
    g = exact_sums(
        j,
        keys=[],
        sums={
            "promo": (F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0)), 6),
            "total": (_rev(), 6),
        },
    )
    return g.select((F.lit(100.0) * F.col("promo") / F.col("total")).alias("promo_revenue"))


# --------------------------------------------------------------------------
# Q15: top supplier (view → max-revenue supplier(s)).
# --------------------------------------------------------------------------
@declare(
    "q_tpch_q15",
    oracle=f"""
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(ROUND(({REV_SQL}) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
""",
    tags=("tpch", "join", "subquery"),
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the quarter's max revenue.

    Exact per-supplier sums make the MAX comparison bit-deterministic.
    The global max over the per-supplier aggregate is a 1-row ``max``
    agg broadcast back onto revenue0 (the q22 scalar-subquery idiom) —
    no Window over an unpartitioned frame anywhere in the plan, so no
    single-partition funnel of the |suppliers| relation at scale.
    """
    l, s = _t(spark, sf_dir, "lineitem", "supplier")
    rev0 = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(lsum(_rev(), scale=6).alias("total_revenue"))
    )
    max_rev = rev0.agg(F.max("total_revenue").alias("max_rev"))
    top = rev0.crossJoin(F.broadcast(max_rev)).filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    return (
        F.broadcast(top)
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q16 (adapted): supplier-count per part attribute. No partsupp → the
# part↔supplier relation is derived from lineitem.
# --------------------------------------------------------------------------
@declare(
    "q_tpch_q16",
    oracle="""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_size IN (1, 5, 10, 15, 23, 36, 42, 50)
GROUP BY p_brand, p_type, p_size
""",
    tags=("tpch", "join", "agg"),
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-supplier counts over a filtered part family."""
    l, part = _t(spark, sf_dir, "lineitem", "part")
    p_f = part.filter((F.col("p_brand") != "Brand#5") & F.col("p_size").isin(1, 5, 10, 15, 23, 36, 42, 50))
    return (
        l.select("l_partkey", "l_suppkey")
        .join(F.broadcast(p_f.select("p_partkey", "p_brand", "p_type", "p_size")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q17: small-quantity-order revenue (verbatim shape).
# --------------------------------------------------------------------------
@declare(
    "q_tpch_q17",
    oracle=f"""
WITH pa AS (
  SELECT l_partkey AS pa_key, SUM(l_quantity) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT {dsum_sql('l_extendedprice', 2)} / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa   ON pa_key = l_partkey
WHERE p_brand = 'Brand#3' AND l_quantity < 0.2 * avg_qty
""",
    tags=("tpch", "join", "subquery"),
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from below-average-quantity lines of one brand.

    The correlated scalar subquery (per-part avg quantity) is
    decorrelated into an aggregate + re-join — Spark's own
    RewriteCorrelatedScalarSubquery does the same. Quantities are
    integral doubles, so SUM/COUNT and the 0.2·avg comparison are exact
    and order-independent in both engines.
    """
    l, part = _t(spark, sf_dir, "lineitem", "part")
    pa = l.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        (F.sum("l_quantity") / F.count("*")).alias("avg_qty")
    )
    j = (
        l.join(F.broadcast(part.filter(F.col("p_brand") == "Brand#3").select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(pa, F.col("pa_key") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    )
    g = exact_sums(j, keys=[], sums={"total_price": (F.col("l_extendedprice"), 2)})
    return g.select((F.col("total_price") / F.lit(7.0)).alias("avg_yearly"))


# --------------------------------------------------------------------------
# Q18: large-volume customers (verbatim shape; threshold fits testdata's
# per-order quantity distribution — p99 ≈ 260).
# --------------------------------------------------------------------------
@declare(
    "q_tpch_q18",
    oracle="""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       SUM(l_quantity) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    tags=("tpch", "join", "subquery", "topk"),
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds a threshold, with customer.

    The IN-subquery is a self-aggregation of lineitem → left-semi join.
    Quantity sums are integral-exact; o_totalprice ordering ties are
    broken by o_orderkey in both engines.
    """
    c, o, l = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 250)
        .select(F.col("l_orderkey").alias("big_key"))
    )
    return (
        l.join(big, F.col("l_orderkey") == F.col("big_key"), "left_semi")
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.select("c_custkey", "c_name")), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q19: discounted revenue, OR-of-ANDs predicate (shipmode/shipinstruct
# clauses dropped — columns don't exist).
# --------------------------------------------------------------------------
@declare(
    "q_tpch_q19",
    oracle=f"""
SELECT {dsum_sql(REV_SQL, 6, 24)} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 45 AND l_quantity BETWEEN 20 AND 40)
""",
    tags=("tpch", "join"),
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive multi-attribute predicate across the part join."""
    l, part = _t(spark, sf_dir, "lineitem", "part")
    j = l.join(F.broadcast(part.select("p_partkey", "p_brand", "p_size")), F.col("l_partkey") == F.col("p_partkey"))
    q = F.col("l_quantity")
    sz = F.col("p_size")
    pred = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & sz.between(10, 30) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & sz.between(20, 45) & q.between(20, 40))
    )
    return exact_sums(j.filter(pred), keys=[], sums={"revenue": (_rev(), 6)})


# --------------------------------------------------------------------------
# Q20 (adapted): potential part promotion. No partsupp → a supplier
# qualifies by having shipped > 300 units of '%blue%' parts in 1997.
# --------------------------------------------------------------------------
@declare(
    "q_tpch_q20",
    oracle="""
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%blue%'
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING SUM(l_quantity) > 300
)
""",
    tags=("tpch", "join", "subquery"),
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers over a volume threshold for one part family."""
    s, n, l, part = _t(spark, sf_dir, "supplier", "nation", "lineitem", "part")
    qualified = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(part.filter(F.col("p_name").like("%blue%")).select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 300)
        .select("l_suppkey")
    )
    return (
        s.join(qualified, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n.select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


# --------------------------------------------------------------------------
# Q21 (adapted): suppliers who kept orders waiting. "Late" is adapted to
# l_shipdate > o_orderdate + 180 days (no receipt/commit dates); a waiter
# is the ONLY late supplier in a multi-supplier finished order.
# --------------------------------------------------------------------------
@declare(
    "q_tpch_q21",
    oracle="""
WITH per_supp AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 180 DAY THEN 1 ELSE 0 END) AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
),
per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_supps, SUM(is_late) AS n_late
  FROM per_supp GROUP BY l_orderkey
)
SELECT s_name, COUNT(*) AS numwait
FROM per_supp
JOIN per_order USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE is_late = 1 AND n_supps >= 2 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
    tags=("tpch", "join", "subquery", "topk"),
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sole-late-supplier count per supplier (EXISTS/NOT EXISTS pair in
    the original, expressed as one grouped pass + order-level counts —
    a single shuffle on orderkey instead of two self-joins).
    """
    l, o, s = _t(spark, sf_dir, "lineitem", "orders", "supplier")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 180 DAYS"), F.lit(1)
    ).otherwise(F.lit(0))
    per_supp = (
        l.join(
            o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_supp.withColumn("n_supps", F.count("*").over(w)).withColumn(
        "n_late", F.sum("is_late").over(w)
    )
    return (
        flagged.filter((F.col("is_late") == 1) & (F.col("n_supps") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(s.select("s_suppkey", "s_name")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q22 (adapted): global sales opportunity. customer has no phone column →
# "country code" is c_nationkey % 7. Every customer has ≥1 order in this
# testdata (verified at sf0.01), so the no-orders anti-join is adapted to
# "no order since 2000-01-01" to keep the result non-trivial.
# --------------------------------------------------------------------------
@declare(
    "q_tpch_q22",
    oracle=f"""
SELECT cntrycode, COUNT(*) AS numcust, {dsum_sql('c_acctbal', 2)} AS totacctbal
FROM (
  SELECT c_nationkey % 7 AS cntrycode, c_acctbal, c_custkey
  FROM customer
  WHERE c_acctbal > (
    SELECT {dsum_sql('c_acctbal', 2)} / COUNT(*) FROM customer WHERE c_acctbal > 0.0
  )
)
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
)
GROUP BY cntrycode
""",
    tags=("tpch", "subquery", "join"),
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich customers with no recent orders, grouped by derived country code.

    The average in the scalar subquery is computed as exact-decimal
    sum / count so the > comparison can't flip on accumulation order.
    Anti join replaces NOT EXISTS (same Catalyst rewrite).
    """
    c, o = _t(spark, sf_dir, "customer", "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum("c_acctbal", 2) / F.count("*")).alias("avg_bal")
    )
    rich = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .select((F.col("c_nationkey") % 7).alias("cntrycode"), "c_acctbal", "c_custkey")
    )
    return (
        rich.join(
            o.filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("cntrycode")
        .agg(F.count("*").alias("numcust"), dsum("c_acctbal", 2).alias("totacctbal"))
    )
