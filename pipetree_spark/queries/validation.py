"""Data-validation queries (SURVEY §2.12b extension): content
fingerprints and snapshot diffs — the two primitives a 100 TB lakehouse
uses to prove "this backfill/migration/replica equals the source"
without sorting or shuffling whole tables.

Reference note: /root/reference is empty (SURVEY §0); north-star
extension over the TPC-H-ish fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipetree_spark.catalog import load_table
from pipetree_spark.ops.relational import snapshot_diff
from pipetree_spark.ops.sketch import FP_MOD, table_fingerprint
from pipetree_spark.queries import declare

# the same canonical lineitem column set on both engines: exact types
# only (ints, strings, formatted dates) — raw doubles stringify
# differently per engine and are banned from fingerprint inputs
_FP_COLS = ["k1", "k2", "k3", "k4", "k5", "k6"]

_FP_SQL = f"""
WITH c AS (
  SELECT l_returnflag,
         CAST(l_orderkey AS VARCHAR)                 AS k1,
         CAST(l_linenumber AS VARCHAR)               AS k2,
         CAST(l_suppkey AS VARCHAR)                  AS k3,
         CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS k4,
         l_linestatus                                AS k5,
         strftime(l_shipdate, '%Y-%m-%d')            AS k6
  FROM lineitem),
h AS (
  SELECT l_returnflag,
         CAST(concat('0x', substr(md5(concat_ws(chr(31),
              coalesce(k1, chr(1)), coalesce(k2, chr(1)),
              coalesce(k3, chr(1)), coalesce(k4, chr(1)),
              coalesce(k5, chr(1)), coalesce(k6, chr(1)))), 1, 15))
              AS BIGINT) AS h
  FROM c)
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(SUM(CAST(h AS HUGEINT)) % {FP_MOD} AS BIGINT) AS fp
FROM h GROUP BY l_returnflag
"""


@declare("q_table_fingerprint", oracle=_FP_SQL, tags=("agg", "validation"))
def q_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag content fingerprint of lineitem
    (ops.sketch.table_fingerprint): exact DECIMAL sum of 60-bit md5
    row hashes mod 2^61-1, plus row counts.

    Content equality without sorting: replicas, migrations, and
    backfills compare (n_rows, fp) per group — one map-side-combined
    aggregate pass over each side, no row-level join, no full-table
    shuffle. The sum is commutative and mergeable, so per-partition /
    per-day fingerprints fold into the table fingerprint (pinned by
    pytest), which is what makes the check INCREMENTAL at 100 TB:
    fingerprint only the partitions that changed. The DuckDB oracle
    recomputes the identical hash-sum, so the driver certifies the
    whole hash pipeline bit-for-bit.
    """
    l = load_table(spark, sf_dir, "lineitem")
    c = l.select(
        "l_returnflag",
        F.col("l_orderkey").cast("string").alias("k1"),
        F.col("l_linenumber").cast("string").alias("k2"),
        F.col("l_suppkey").cast("string").alias("k3"),
        F.col("l_quantity").cast("bigint").cast("string").alias("k4"),
        F.col("l_linestatus").alias("k5"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("k6"),
    )
    return table_fingerprint(c, _FP_COLS, ["l_returnflag"])


_DIFF_SQL = f"""
WITH canon AS (
  SELECT o_orderkey AS k, o_custkey, o_orderstatus,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c,
         strftime(o_orderdate, '%Y-%m-%d') AS od, o_orderpriority
  FROM orders),
new AS (
  SELECT k, o_custkey, o_orderstatus, price_c, od,
         CASE WHEN k % 89 = 0 THEN 'X-SIMULATED' ELSE o_orderpriority END AS o_orderpriority
  FROM canon WHERE k % 97 <> 0
  UNION ALL
  SELECT k + 10000000000, o_custkey, o_orderstatus, price_c, od, o_orderpriority
  FROM canon WHERE k % 101 = 0),
ho AS (SELECT k, md5(concat_ws(chr(31), CAST(o_custkey AS VARCHAR), o_orderstatus,
            CAST(price_c AS VARCHAR), od, o_orderpriority)) AS rh FROM canon),
hn AS (SELECT k, md5(concat_ws(chr(31), CAST(o_custkey AS VARCHAR), o_orderstatus,
            CAST(price_c AS VARCHAR), od, o_orderpriority)) AS rh FROM new),
d AS (
  SELECT COALESCE(ho.k, hn.k) AS k,
         CASE WHEN ho.k IS NULL THEN 'added'
              WHEN hn.k IS NULL THEN 'removed'
              WHEN ho.rh <> hn.rh THEN 'changed' END AS status
  FROM ho FULL OUTER JOIN hn ON ho.k = hn.k)
SELECT status, COUNT(*) AS n,
       CAST(SUM(CAST(k AS HUGEINT)) % {FP_MOD} AS BIGINT) AS key_sum
FROM d WHERE status IS NOT NULL GROUP BY status
"""


@declare("q_table_diff", oracle=_DIFF_SQL, tags=("join", "validation"))
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (ops.relational.snapshot_diff): orders vs a
    simulated next-day snapshot (keys %97 deleted, %89 repriorized,
    %101 re-inserted under new keys), classified added / removed /
    changed by content hash over the non-key columns, reported as
    per-status counts plus a mod-p key checksum so the driver's hash
    certifies WHICH keys changed, not just how many.

    This is the verify step of every backfill/migration story: both
    sides prune to (key, row-hash) at the scan, one full-outer
    shuffle join on the key, unchanged keys never materialize. The
    money column rides as exact cents (round(x·100) — the engine's
    decimal policy) inside the hash, so the diff is bit-deterministic
    across engines.
    """
    o = load_table(spark, sf_dir, "orders")
    canon = o.select(
        F.col("o_orderkey").alias("k"),
        "o_custkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("od"),
        "o_orderpriority",
    )
    new = canon.where(F.col("k") % 97 != 0).withColumn(
        "o_orderpriority",
        F.when(F.col("k") % 89 == 0, F.lit("X-SIMULATED")).otherwise(
            F.col("o_orderpriority")
        ),
    ).unionByName(
        canon.where(F.col("k") % 101 == 0).withColumn(
            "k", F.col("k") + F.lit(10_000_000_000)
        )
    )
    rh = F.md5(
        F.concat_ws(
            "\x1f",
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            F.col("price_c").cast("string"),
            F.col("od"),
            F.col("o_orderpriority"),
        )
    )
    d = snapshot_diff(
        canon.withColumn("rh", rh), new.withColumn("rh", rh), ["k"], "rh"
    )
    return d.groupBy("status").agg(
        F.count("*").alias("n"),
        F.expr(f"CAST(SUM(CAST(k AS DECIMAL(38,0))) % {FP_MOD} AS BIGINT)").alias(
            "key_sum"
        ),
    )
