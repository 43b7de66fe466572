"""Join queries (SURVEY §2.3).

All equi-joins are one ``df.join`` — Catalyst+AQE pick the physical
algorithm; the engine steers with explicit ``broadcast()`` for dims and
``hint("merge")`` where a sort-merge is wanted. Non-equi (theta) joins
plan as broadcast-nested-loop with the small side broadcast. Range and
as-of joins use the ops-layer rewrites (ops/relational.py).

Scale notes per query are in docstrings: the rule is "shuffle on the
join key, broadcast dims, never cross-join unbounded sides".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipetree_spark.catalog import load_table, table_path
from pipetree_spark.exact import dsum, dsum_sql, exact_sums, lsum
from pipetree_spark.ops.relational import (
    asof_join,
    binned_interval_join,
    incremental_join_delta,
    range_join,
)
from pipetree_spark.queries import declare


def _parse_byte_conf(v: str) -> int:
    """Spark byte confs accept unit suffixes ('10MB', '1g', '512k');
    ``int()`` on those raises. Parse the Spark way: optional b/k/m/g/t
    (case-insensitive, optional trailing 'b'), base-1024. Unparseable →
    -1 (broadcast disabled), which falls back to the aggregation-
    pushdown branch — correct at any scale."""
    s = str(v).strip().lower()
    try:
        return int(s)
    except ValueError:
        pass
    import re

    m = re.fullmatch(r"(-?\d+)\s*([kmgt]?)b?", s)
    if not m:
        return -1
    mult = {"": 1, "k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}[m.group(2)]
    return int(m.group(1)) * mult


def _dir_bytes(path: str) -> int:
    """On-disk size of a table path (file or directory of files) — the
    cheap stand-in for catalog statistics when choosing a plan shape.
    Returns 0 when unknowable (treat as 'not broadcastable')."""
    try:
        if os.path.isfile(path):
            return os.path.getsize(path)
        total = 0
        for root, _dirs, files in os.walk(path):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        return total
    except OSError:
        return 0


@declare(
    "q_join_inner",
    oracle=f"""
SELECT o.o_orderpriority,
       COUNT(*) AS n_items,
       {dsum_sql('l.l_extendedprice')} AS sum_price
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
    tags=("join", "bench"),
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact inner equi-join (lineitem⋈orders on orderkey): both
    sides shuffle on the key → SMJ/SHJ by AQE; agg is map-side-combined
    after the join."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    joined = l.join(o, l.l_orderkey == o.o_orderkey, "inner")
    return exact_sums(
        joined, keys=["o_orderpriority"], sums={"sum_price": ("l_extendedprice", 2)}, count="n_items"
    )


@declare(
    "q_join_broadcast",
    oracle=f"""
SELECT r.r_name,
       COUNT(*) AS n_customers,
       {dsum_sql('c.c_acctbal')} AS sum_bal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
    tags=("join", "bench"),
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dim joins with explicit broadcast: zero shuffle for
    the joins (dims ship to every executor); only the final 5-group agg
    shuffles. This is THE pattern for dim joins at 100 TB."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), F.col("n_regionkey") == r.r_regionkey
    )
    return exact_sums(
        joined, keys=["r_name"], sums={"sum_bal": ("c_acctbal", 2)}, count="n_customers"
    )


@declare(
    "q_join_smj",
    oracle=f"""
SELECT p.p_brand,
       COUNT(*) AS n_items,
       {dsum_sql('l.l_quantity')} AS sum_qty
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""",
    tags=("join",),
)
def q_join_smj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-merge join forced via hint — the spill-safe strategy for two
    large sides whose key is also a downstream sort key."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").hint("merge")
    joined = l.join(p, l.l_partkey == p.p_partkey)
    return exact_sums(joined, keys=["p_brand"], sums={"sum_qty": ("l_quantity", 2)}, count="n_items")


@declare(
    "q_join_left",
    oracle=f"""
SELECT c.c_custkey,
       COUNT(o.o_orderkey) AS n_orders,
       COALESCE({dsum_sql('o.o_totalprice')}, 0.0) AS total_spend
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
""",
    tags=("join",),
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: ~9% of customers have no orders (FIXTURES.md) so
    null-extension is exercised; count(o_orderkey) counts non-nulls."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(lsum("o_totalprice"), F.lit(0.0)).alias("total_spend"),
        )
    )


@declare(
    "q_join_right",
    oracle="""
SELECT c.c_nationkey,
       COUNT(o.o_orderkey) AS n_orders,
       COUNT(DISTINCT c.c_custkey) AS n_customers
FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_nationkey
""",
    tags=("join",),
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_nationkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.count_distinct("c_custkey").alias("n_customers"),
        )
    )


@declare(
    "q_join_full",
    oracle="""
SELECT COALESCE(cn.c_nationkey, sn.s_nationkey) AS nationkey,
       COALESCE(cn.n_cust, -1) AS n_cust,
       COALESCE(sn.n_supp, -1) AS n_supp
FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer WHERE c_nationkey < 15 GROUP BY c_nationkey) cn
FULL JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier WHERE s_nationkey > 10 GROUP BY s_nationkey) sn
  ON cn.c_nationkey = sn.s_nationkey
""",
    tags=("join",),
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with manufactured one-sided keys (nation<15 vs
    nation>10) so both null-extension directions occur."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cn = c.filter(F.col("c_nationkey") < 15).groupBy("c_nationkey").agg(F.count("*").alias("n_cust"))
    sn = s.filter(F.col("s_nationkey") > 10).groupBy("s_nationkey").agg(F.count("*").alias("n_supp"))
    return cn.join(sn, cn.c_nationkey == sn.s_nationkey, "full").select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        F.coalesce("n_cust", F.lit(-1)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(-1)).alias("n_supp"),
    )


@declare(
    "q_join_semi",
    oracle="""
SELECT c_custkey, c_nationkey
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
""",
    tags=("join", "bench"),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join — customers with ≥1 URGENT order; no right columns
    leak, and the right side reduces to distinct keys before shuffling."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_nationkey")


@declare(
    "q_join_anti",
    oracle="""
SELECT c_custkey, c_nationkey
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
""",
    tags=("join",),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join — customers with no pending ('P') order. (Note:
    every customer has ≥1 order in this testdata, so the unfiltered
    anti-join would be empty — a uselessly weak check.)"""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_nationkey")


@declare(
    "q_join_cross",
    oracle="""
SELECT r.r_name, n.n_name
FROM region r CROSS JOIN nation n
""",
    tags=("join",),
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded cross join (5×25). Cross joins are only ever legal on
    bounded/dim inputs — the engine never cross-joins fact tables."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@declare(
    "q_join_theta",
    oracle="""
SELECT c.c_custkey,
       COUNT(*) AS n_richer_suppliers
FROM customer c JOIN supplier s ON s.s_acctbal > c.c_acctbal
WHERE c.c_custkey < 100
GROUP BY c.c_custkey
""",
    tags=("join",),
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi theta join → broadcast-nested-loop with the bounded side
    broadcast. Theta joins MUST have at least one bounded side; at scale
    prefer banding the inequality into an equi band-key join."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    s = load_table(spark, sf_dir, "supplier")
    return (
        c.join(F.broadcast(s), s.s_acctbal > c.c_acctbal)
        .groupBy("c_custkey")
        .agg(F.count("*").alias("n_richer_suppliers"))
    )


@declare(
    "q_join_range",
    oracle="""
SELECT a.user_id,
       COUNT(*) AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND (epoch_ns(b.ts) // 1000000000) >  (epoch_ns(a.ts) // 1000000000)
 AND (epoch_ns(b.ts) // 1000000000) <= (epoch_ns(a.ts) // 1000000000) + 300
GROUP BY a.user_id
""",
    tags=("join", "events"),
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: event pairs of the same user within 5 minutes
    (strictly later, ≤300 s). Uses the ops-layer range_join: SMJ on
    user_id with the range condition inside the join. Times compared as
    integer epoch seconds derived from the raw int64 ns — the only
    representation both engines agree on exactly (SURVEY §1.2)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts_sec", "event_id")
    pairs = range_join(e, e, on=["user_id"], left_time="ts_sec", right_time="ts_sec", lower=1, upper=300)
    return pairs.groupBy(F.col("l.user_id").alias("user_id")).agg(F.count("*").alias("n_pairs"))


@declare(
    "q_join_asof",
    oracle="""
SELECT p.event_id AS purchase_id,
       COALESCE(MAX(epoch_ns(c.ts) // 1000000000), -1) AS last_click_sec,
       COUNT(c.user_id) AS n_prior_clicks
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id AND (epoch_ns(c.ts) // 1000000000) <= (epoch_ns(p.ts) // 1000000000)
GROUP BY p.event_id
""",
    tags=("join", "events"),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward): each purchase ↔ latest click of the same
    user at/before it. Declared in its aggregate form (MAX of prior
    click times) which is SQL-oracle-expressible; the row-picking
    rewrite lives in ops.relational.asof_join and is pytest-covered.
    Shuffles both event slices on user_id only."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id"), F.col("ts_sec").alias("p_sec")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts_sec").alias("c_sec")
    )
    j = p.join(c, (p.user_id == c.c_user) & (c.c_sec <= p.p_sec), "left")
    return j.groupBy("purchase_id").agg(
        F.coalesce(F.max("c_sec"), F.lit(-1)).alias("last_click_sec"),
        F.count("c_user").alias("n_prior_clicks"),
    )


@declare(
    "q_join_3way",
    oracle=f"""
SELECT n.n_name,
       COUNT(*) AS n_items,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6, 24)} AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
    tags=("join", "bench"),
)
def q_join_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BASELINE.md's q_join_3way: fact⋈fact⋈dim⋈dim + agg, with an
    adaptive shape keyed on whether customer fits the broadcast
    threshold (the same signal AQE uses for join strategy):

    - **broadcastable customer** (bench scale): join everything and run
      ONE 25-group exact agg — a single pass over lineitem, one tiny
      exchange, matching the baseline's plan shape.
    - **big customer** (100 TB): manual aggregation pushdown (Catalyst
      doesn't push aggs through joins) — reduce to exact per-customer
      partials BEFORE the customer join, so that join shuffles
      |customers| rows, not |lineitem|. Per-customer long sums are
      scale-safe: a customer's order count doesn't grow with data
      volume.

    Both shapes sum the identical per-row round(revenue·10⁶) longs, so
    they emit the same bits. At 100 TB, additionally co-bucket
    lineitem/orders on orderkey to make the first join shuffle-free
    (bucketed-sink recipe in the pipeline cache layer)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    bcast_bytes = _parse_byte_conf(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    )
    cust_bytes = _dir_bytes(table_path(sf_dir, "customer"))
    if 0 < cust_bytes <= bcast_bytes:
        j = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        )
        g = exact_sums(j, keys=["n_name"], sums={"revenue": (revenue, 6)}, count="n_items")
        return g.select("n_name", "revenue", F.col("n_items").cast("long").alias("n_items"))
    per_cust = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(revenue * F.lit(10**6)).cast("long")).alias("rev6"),
            F.count("*").alias("n_i"),
        )
    )
    j = per_cust.join(c, per_cust.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    g = exact_sums(
        j,
        keys=["n_name"],
        # rev6/1e6 round-trips exactly through exact_sums' ·10^6 rescale
        sums={"revenue": (F.col("rev6") / F.lit(1e6), 6), "n_items_d": (F.col("n_i"), 0)},
    )
    return g.select("n_name", "revenue", F.col("n_items_d").cast("long").alias("n_items"))


@declare(
    "q_join_nullsafe",
    oracle="""
WITH o AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN NULL ELSE o_orderpriority END AS k,
         o_totalprice
  FROM orders
),
d AS (
  SELECT DISTINCT CASE WHEN o_orderpriority = '1-URGENT' THEN NULL ELSE o_orderpriority END AS k
  FROM orders
)
SELECT COALESCE(o.k, '<NULL>') AS k, COUNT(*) AS n_orders
FROM o JOIN d ON o.k IS NOT DISTINCT FROM d.k
GROUP BY COALESCE(o.k, '<NULL>')
""",
    tags=("join",),
)
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-SAFE equality join (``<=>`` / ``IS NOT DISTINCT FROM``):
    null keys MATCH null keys instead of vanishing — the join variant a
    plain equi-join silently gets wrong when keys are nullable (the
    '1-URGENT' priority is nulled out on both sides to manufacture the
    case; its orders survive only because of null-safe semantics).
    Plan note: Spark plans ``<=>`` as a hash join on a null-coalesced
    key (BroadcastHashJoin here — the dim side is 5 rows), NOT a
    nested-loop — null-safety costs nothing at scale."""
    o = load_table(spark, sf_dir, "orders")
    nullk = F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(None)).otherwise(
        F.col("o_orderpriority")
    )
    left = o.select(nullk.alias("k"), "o_totalprice")
    dim = o.select(nullk.alias("kd")).distinct()
    return (
        left.join(F.broadcast(dim), left["k"].eqNullSafe(dim["kd"]))
        .groupBy(F.coalesce("k", F.lit("<NULL>")).alias("k"))
        .agg(F.count("*").alias("n_orders"))
    )


@declare(
    "q_join_salted",
    oracle=f"""
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    tags=("join", "agg"),
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALTED skewed join — the replicate-and-salt rewrite, declared
    against the plain-join oracle to prove it is semantics-preserving:
    the fact side gets a deterministic salt in [0, 8), the build side is
    replicated once per salt value, and the join key becomes
    (key, salt) so one hot key's rows spread across 8 reducers instead
    of collapsing onto one. ``shuffle_hash`` hint keeps the exercised
    path the salted shuffle (a broadcast would bypass the salt — and at
    the scale where salting matters, the build side no longer fits a
    broadcast). This is the manual fallback for the skew AQE's
    skew-join split cannot fix: a single key too hot for ANY unsalted
    partitioning, at the cost of an 8× build-side replication — the
    same two-phase trick as q_agg_salted on the join side."""
    S = 8
    o = load_table(spark, sf_dir, "orders").withColumn(
        "__salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(S))
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    ).withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(S - 1))))
    c = c.withColumn("__salt", F.col("__salt").cast("long"))
    j = o.join(
        c.hint("shuffle_hash"),
        (F.col("o_custkey") == F.col("c_custkey")) & (o["__salt"] == c["__salt"]),
    )
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"), lsum("o_totalprice").alias("sum_price")
    )


@declare(
    "q_join_range_binned",
    oracle="""
WITH err AS (SELECT event_id, epoch_ns(ts) // 1000000000 AS et
             FROM events WHERE event_type = 'error'),
oth AS (SELECT epoch_ns(ts) // 1000000000 AS ot, event_type AS otype
        FROM events WHERE event_type <> 'error'),
p AS (SELECT e.event_id, o.otype
      FROM err e JOIN oth o ON o.ot BETWEEN e.et - 300 AND e.et + 300),
agg AS (SELECT event_id,
               COUNT(*) FILTER (otype = 'click')    AS n_click,
               COUNT(*) FILTER (otype = 'view')     AS n_view,
               COUNT(*) FILTER (otype = 'purchase') AS n_purchase,
               COUNT(*) FILTER (otype = 'signup')   AS n_signup
        FROM p GROUP BY event_id)
SELECT e.event_id,
       COALESCE(a.n_click, 0)    AS n_click,
       COALESCE(a.n_view, 0)     AS n_view,
       COALESCE(a.n_purchase, 0) AS n_purchase,
       COALESCE(a.n_signup, 0)   AS n_signup
FROM err e LEFT JOIN agg a ON e.event_id = a.event_id
""",
    tags=("join", "events"),
)
def q_join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYLESS interval join via the bucket rewrite
    (ops.relational.binned_interval_join): for every error event, how
    many click/view/purchase/signup events happened anywhere on the
    platform within ±300 s — the root-cause correlation window, with
    NO shared key between the sides.

    The naive plan for this predicate is BroadcastNestedLoopJoin
    (|L|·|R| comparisons — the oracle's DuckDB IEJoin hides the same
    cost class behind a sort); the rewrite buckets both sides by
    floor(ts/Δ), replicates the right side ×3, and equi-joins on the
    bucket — shuffle-keyed, AQE-balanceable, candidate count bounded
    by event rate per Δ-window, not corpus size. Errors with an empty
    window still appear (count 0) via the left join back to the error
    side.
    """
    ev = load_table(spark, sf_dir, "events")
    err = ev.where(F.col("event_type") == "error").select(
        "event_id", F.col("ts_sec").alias("et")
    )
    oth = ev.where(F.col("event_type") != "error").select(
        F.col("ts_sec").alias("ot"), F.col("event_type").alias("otype")
    )
    pairs = binned_interval_join(err, oth, "et", "ot", delta=300)
    agg = pairs.groupBy("event_id").agg(
        F.count_if(F.col("otype") == "click").alias("n_click"),
        F.count_if(F.col("otype") == "view").alias("n_view"),
        F.count_if(F.col("otype") == "purchase").alias("n_purchase"),
        F.count_if(F.col("otype") == "signup").alias("n_signup"),
    )
    return err.select("event_id").join(agg, "event_id", "left").select(
        "event_id",
        *[
            F.coalesce(F.col(c), F.lit(0)).alias(c)
            for c in ("n_click", "n_view", "n_purchase", "n_signup")
        ],
    )


@declare(
    "q_join_incremental",
    oracle="""
SELECT o.o_orderpriority,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT o.o_orderkey) AS n_orders,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS HUGEINT)) AS DOUBLE) / 100 AS sum_price
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
""",
    tags=("join", "pipeline"),
)
def q_join_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN maintenance
    (ops.relational.incremental_join_delta): orders and lineitem each
    split into history + a new batch (keys %7 / %5 — independent
    moduli so all three delta terms ΔA⋈B, A⋈ΔB, ΔA⋈ΔB are non-empty,
    the %35 overlap exercising the cross-delta term), the stored join
    advanced by APPENDING the delta, then summarized per priority.
    The oracle joins the full tables flat — if the delta algebra
    drops, duplicates, or double-counts any term, the counts and the
    exact-cents price sum diverge.

    Scale shape: history⋈history stands in for the stored
    materialization (at production scale it's a parquet read, not a
    join); the nightly increment is two delta-sized probes + Δ⋈Δ —
    broadcast the deltas and history never shuffles.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    a_old, a_new = (
        o.where(F.col("o_orderkey") % 7 != 0),
        o.where(F.col("o_orderkey") % 7 == 0),
    )
    b_old, b_new = (
        l.where(F.col("o_orderkey") % 5 != 0),
        l.where(F.col("o_orderkey") % 5 == 0),
    )
    stored = a_old.join(b_old, "o_orderkey")
    delta = incremental_join_delta(a_old, a_new, b_old, b_new, ["o_orderkey"])
    maintained = stored.unionByName(delta)
    return maintained.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("o_orderkey").alias("n_orders"),
        (lsum("l_extendedprice")).alias("sum_price"),
    )


@declare(
    "q_join_asof_fwd",
    oracle="""
WITH err AS (SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS t
             FROM events WHERE event_type = 'error'),
pur AS (SELECT event_id AS p_id, user_id, epoch_ns(ts) // 1000000000 AS pt
        FROM events WHERE event_type = 'purchase'),
m AS (
  SELECT e.event_id, p.p_id, p.pt - e.t AS gap_sec,
         ROW_NUMBER() OVER (PARTITION BY e.event_id ORDER BY p.pt, p.p_id) AS rn
  FROM err e JOIN pur p ON e.user_id = p.user_id
  WHERE p.pt >= e.t AND p.pt <= e.t + 3600)
SELECT e.event_id, m.p_id AS next_purchase_id, m.gap_sec
FROM err e LEFT JOIN (SELECT * FROM m WHERE rn = 1) m ON e.event_id = m.event_id
""",
    tags=("join", "events"),
)
def q_join_asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance (ops.relational.asof_join,
    direction='forward', tolerance=3600): for each error event, the
    same user's NEXT purchase within an hour — "did the error block
    conversion". Errors with no in-window purchase still appear
    (NULL match) via how='left'.

    The tolerance is not just semantics: it bounds the per-key join
    fan-out (candidates per error = purchases in one hour, not the
    user's entire history), which is what keeps the equi-join +
    row_number rewrite flat on an unbounded event stream. Ties on the
    purchase timestamp break on the purchase id — fully deterministic,
    so the driver hash certifies every match and gap.
    """
    ev = load_table(spark, sf_dir, "events")
    err = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts_sec").alias("t")
    )
    pur = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts_sec").alias("pt"),
    )
    m = asof_join(
        err,
        pur,
        on=["user_id"],
        left_time="t",
        right_time="pt",
        left_key="event_id",
        how="left",
        direction="forward",
        tolerance=3600,
    )
    return m.select(
        "event_id",
        F.col("p_id_r").alias("next_purchase_id"),
        (F.col("pt_r") - F.col("t")).alias("gap_sec"),
    )
