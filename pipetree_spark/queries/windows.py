"""Window-function queries (SURVEY §2.5).

Determinism rules encoded here:
- ntile / row_number / lag / lead / first / last need a TOTAL order →
  every orderBy ends with a unique key tie-break.
- rank / dense_rank / percent_rank / cume_dist are value-deterministic
  under ties, so they keep the natural (possibly tying) sort key.
- Windowed sums go through the exact-decimal cast like group aggs.

Scale: one shuffle per distinct partitionBy clause; Spark evaluates all
same-partitioning windows in a single WindowExec pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pipetree_spark.catalog import load_table
from pipetree_spark.exact import dec
from pipetree_spark.ops.relational import topk_per_group
from pipetree_spark.queries import declare


@declare(
    "q_win_rownum",
    oracle="""
SELECT o_orderkey, o_custkey,
       ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
FROM orders
""",
    tags=("window", "bench"),
)
def q_win_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number per partition — the dedup-pick-one idiom."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return o.select("o_orderkey", "o_custkey", F.row_number().over(w).alias("rn"))


@declare(
    "q_win_rank",
    oracle="""
SELECT c_custkey,
       RANK()         OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
       DENSE_RANK()   OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk,
       PERCENT_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS prnk,
       CUME_DIST()    OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS cdist,
       NTILE(4)       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS quart
FROM customer
""",
    tags=("window",),
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank family. rank/dense/percent/cume are tie-stable; ntile is not,
    so its order adds the unique custkey tie-break."""
    c = load_table(spark, sf_dir, "customer")
    w_val = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    w_tot = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        F.rank().over(w_val).alias("rnk"),
        F.dense_rank().over(w_val).alias("drnk"),
        F.percent_rank().over(w_val).alias("prnk"),
        F.cume_dist().over(w_val).alias("cdist"),
        F.ntile(4).over(w_tot).alias("quart"),
    )


@declare(
    "q_win_laglead",
    oracle="""
SELECT event_id,
       COALESCE((epoch_ns(ts) // 1000000000)
                - LAG(epoch_ns(ts) // 1000000000)
                  OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000000000, event_id), -1) AS gap_sec,
       COALESCE(LEAD(event_type)
                OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000000000, event_id), 'NONE') AS next_type
FROM events
""",
    tags=("window", "events"),
)
def q_win_laglead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead per user ordered by (epoch sec, event_id) — inter-event
    gaps, the sessionization building block."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    return e.select(
        "event_id",
        F.coalesce(F.col("ts_sec") - F.lag("ts_sec").over(w), F.lit(-1)).alias("gap_sec"),
        F.coalesce(F.lead("event_type").over(w), F.lit("NONE")).alias("next_type"),
    )


@declare(
    "q_win_running",
    oracle="""
SELECT o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
""",
    tags=("window",),
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum, unbounded-preceding frame, exact-decimal inside."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@declare(
    "q_win_moving",
    oracle="""
SELECT o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER w AS DOUBLE) / COUNT(*) OVER w AS moving_avg
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
    tags=("window",),
)
def q_win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over a bounded 3-row frame — expressed as exact
    decimal sum / count so both engines divide identical doubles."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(-2, 0)
    return o.select(
        "o_orderkey",
        (F.sum(dec("o_totalprice")).over(w).cast("double") / F.count("*").over(w)).alias("moving_avg"),
    )


@declare(
    "q_win_rangeframe",
    oracle="""
SELECT o_orderkey,
       COUNT(*) OVER w AS n_in_band,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS band_spend
FROM (SELECT *, CAST(FLOOR(o_totalprice) AS BIGINT) AS tp_long FROM orders)
WINDOW w AS (PARTITION BY o_custkey ORDER BY tp_long
             RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW)
""",
    tags=("window",),
)
def q_win_rangeframe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a value axis (orders within $50k below current).
    Order column is an integral BIGINT so both engines agree on the
    frame boundary arithmetic exactly."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "tp_long", F.floor("o_totalprice").cast("long")
    )
    w = Window.partitionBy("o_custkey").orderBy("tp_long").rangeBetween(-50000, 0)
    return o.select(
        "o_orderkey",
        F.count("*").over(w).alias("n_in_band"),
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("band_spend"),
    )


@declare(
    "q_win_firstlast",
    oracle="""
SELECT o_orderkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       LAST_VALUE(o_orderkey)  OVER w AS last_order,
       NTH_VALUE(o_orderkey, 2) OVER w AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    tags=("window",),
)
def q_win_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value with an explicit full-partition frame —
    last_value over the default frame is the classic silent bug, so the
    frame is always spelled out. nth beyond partition size → NULL
    (identical semantics both engines)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@declare(
    "q_topk_pergroup",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) WHERE rnk <= 3
""",
    tags=("window", "bench"),
)
def q_topk_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via the ops-layer topk_per_group."""
    o = load_table(spark, sf_dir, "orders")
    return topk_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        partition_by=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    ).select("o_custkey", "o_orderkey", "rnk")


@declare(
    "q_win_timerange",
    oracle="""
SELECT event_id,
       COUNT(*) OVER w AS n_last_hour,
       CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) OVER w AS DOUBLE) / 1000000.0 AS sum_last_hour
FROM (SELECT event_id, user_id, value,
             CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_sec
      FROM events WHERE user_id < 10)
WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
""",
    tags=("window", "events", "timeseries"),
)
def q_win_timerange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per-user trailing-1-hour rolling
    count/sum at every event — the per-entity sliding aggregate that
    windowed (bucketed) rollups can't express.

    Ordered on integral epoch SECONDS (the catalog's ts_sec), so frame
    boundary arithmetic is exact integer math in both engines and the
    ns/µs precision gap cannot move a boundary. Scaled-long window sums
    keep the doubles bit-identical. At 100 TB the window partitions by
    user — embarrassingly parallel, state bounded by events-per-hour.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = Window.partitionBy("user_id").orderBy("ts_sec").rangeBetween(-3600, 0)
    return e.select(
        "event_id",
        F.count("*").over(w).alias("n_last_hour"),
        (
            F.sum(F.round(F.col("value") * F.lit(10**6)).cast("long")).over(w) / F.lit(1e6)
        ).alias("sum_last_hour"),
    )


@declare(
    "q_win_ignorenulls",
    oracle="""
SELECT user_id, event_id,
       LAST_VALUE(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY sec, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
FROM (SELECT user_id, event_id, (epoch_ns(ts) // 1000000000) AS sec,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events)
""",
    tags=("window", "events", "timeseries"),
)
def q_win_ignorenulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``LAST_VALUE ... IGNORE NULLS`` carry-forward — the NATIVE LOCF
    spelling (error readings nulled, then filled from the user's most
    recent non-null observation). q_ts_locf implements the identical
    semantics via the portable gaps-and-islands rewrite for engines
    without IGNORE NULLS; this query certifies the direct form agrees
    across Spark and DuckDB, so users can take whichever their other
    engines support. Per-row value pick (no float aggregation) —
    deterministic under the unique (sec, event_id) order."""
    from pipetree_spark.catalog import load_table as _lt

    e = _lt(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.last(v, ignorenulls=True).over(w).alias("filled"),
    )


@declare(
    "q_win_nth",
    oracle="""
SELECT c_custkey,
       NTH_VALUE(c_acctbal, 2) OVER w AS second_bal,
       NTH_VALUE(c_acctbal, 3) OVER w AS third_bal
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    tags=("window",),
)
def q_win_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTH_VALUE with the default running frame: per customer, the
    2nd- and 3rd-highest account balance SEEN SO FAR in their nation's
    descending-balance order (NULL until the frame reaches n rows) —
    the benchmark-vs-runner-up window shape. Order carries the unique
    custkey tie-break, and the frame is stated explicitly because the
    engines' implicit default frames differ; values pass through as
    raw stored doubles (hash-safe, no arithmetic).
    """
    c = load_table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return c.select(
        "c_custkey",
        F.nth_value("c_acctbal", 2).over(w).alias("second_bal"),
        F.nth_value("c_acctbal", 3).over(w).alias("third_bal"),
    )


@declare(
    "q_win_distribution",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       NTILE(4) OVER w AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
QUALIFY o_orderkey % 97 = 0
""",
    tags=("window",),
)
def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distribution window trio — NTILE / PERCENT_RANK / CUME_DIST
    (the §2.5 members not yet declared): quartile bucketing and
    percentile position of each order's price within its priority
    class. The order carries the unique orderkey tie-break, which
    makes all three deterministic AND makes percent_rank = (rn−1)/
    (n−1) and cume_dist = rn/n exact integer ratios (no peer groups) —
    single correctly-rounded IEEE divides, hash-stable cross-engine.
    Output samples every 97th orderkey AFTER the windows run, so the
    emitted rows are a stable audit slice while the window semantics
    cover the full table.

    Scale shape: one shuffle on the partition key; all three windows
    share a single WindowExec pass."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .where(F.col("o_orderkey") % 97 == 0)
    )
