"""Catalog: pinned schemas + loaders for the testdata star schema.

Schemas are ground truth from FIXTURES.md (read from parquet footers).
The one irregular table is ``events`` whose ``ts`` is parquet
TIMESTAMP(NANOS): Spark reads it only as LongType nanoseconds
(``spark.sql.legacy.parquet.nanosAsLong=true``). The loader owns the
conversion in ONE place (SURVEY §1.2):

- ``ts_ns``  raw int64 nanoseconds (exact)
- ``ts``     TimestampType truncated to microseconds via integer ``div``
             (never double division — 1.7e18 ns exceeds double's 2^53
             integer range and would corrupt microseconds)
- ``ts_sec`` int64 epoch seconds (the cross-engine-safe comparison unit;
             the DuckDB oracle uses ``epoch_ns(ts) // 1000000000``)

100 TB note: loaders return plain lazy DataFrames — no caching, no
collect. Partitioning/bucketing decisions belong to the operators, not
the scan; filters/projections written against these frames push down to
the parquet scan (verified via .explain — PushedFilters/ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipetree_spark.session import apply_runtime_confs

#: All driver-provided tables (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: "Open interval" timestamp sentinel for SCD2-style valid_to columns.
#: Must stay inside Arrow's int64-nanosecond range (max 2262-04-11): the
#: driver canonicalizes results via toPandas(), and the conventional
#: 9999-12-31 overflows ns and raises ArrowInvalid. Do NOT "fix" this
#: back to 9999-12-31 — it will pass Spark-side and explode in the
#: correctness harness. Used identically in the Spark query and its
#: DuckDB oracle so both hash the same value.
OPEN_INTERVAL_SENTINEL = "2260-12-31 00:00:00"

#: Pinned logical schemas (FIXTURES.md). ``events.ts`` listed as the
#: post-conversion TimestampType; raw parquet is int64 ns.
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


#: Memoized table frames per (session, sf_dir, table). A DataFrame is a
#: reusable lazy plan — caching it avoids re-reading parquet footers and
#: re-running analysis on every query construction (catalog metadata
#: caching, same as a production metastore). Queries built on a cached
#: frame still re-execute fully: new Dataset ⇒ new exchanges.
_DF_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _assert_schema(name: str, df: DataFrame) -> None:
    """Pin the logical schema (SURVEY §1.2: fixed/explicit — inference is
    for ad-hoc sources only). The pinned fields must appear first, in
    order, with exact types; the events loader appends ts_ns/ts_sec."""
    expected = SCHEMAS[name].fields
    got = df.schema.fields[: len(expected)]
    drift = [
        f"{e.name}:{e.dataType.simpleString()} != {g.name}:{g.dataType.simpleString()}"
        for e, g in zip(expected, got)
        if e.name != g.name or e.dataType != g.dataType
    ]
    if len(got) < len(expected) or drift:
        raise ValueError(f"schema drift for table {name!r}: {drift or 'missing columns'}")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a lazy DataFrame (events converted)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    cache_key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"), name)
    if cache_key in _DF_CACHE:
        return _DF_CACHE[cache_key]
    apply_runtime_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # Two generator encodings exist for events.ts: parquet
        # TIMESTAMP(NANOS) (reads as LongType ns under nanosAsLong) and
        # plain µs TIMESTAMP/TIMESTAMP_NTZ. Branch on the read type so
        # both load to the same pinned layout (ts TimestampType + exact
        # ts_ns/ts_sec int64 columns).
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = (
                df.withColumn("ts_ns", F.col("ts").cast("long"))
                # integer div keeps full precision; double division would not
                .withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
                .withColumn("ts_sec", F.expr("ts_ns div 1000000000"))
            )
        else:
            df = (
                # NTZ → session-tz (UTC) timestamp keeps DuckDB parity
                df.withColumn("ts", F.col("ts").cast("timestamp"))
                # µs epoch ≈ 1.7e15 → ×1000 fits int64 comfortably
                .withColumn("ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000))
                .withColumn("ts_sec", F.expr("unix_micros(ts) div 1000000"))
            )
    _assert_schema(name, df)
    _DF_CACHE[cache_key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries run
    against the same (converted) frames the DataFrame API sees."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
