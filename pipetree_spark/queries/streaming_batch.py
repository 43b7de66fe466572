"""Streaming operators, declared in batch-equivalent form (SURVEY §2.9).

Spark's unified semantics guarantee these functions produce identical
results over a static DataFrame and a stream; the *streaming* execution
path (readStream → watermark → writeStream) is exercised by
tests/test_streaming.py with file sources + memory sinks.

All window arithmetic runs on second-truncated time (``ts_sec`` /
``timestamp_seconds``) so the DuckDB-ns vs Spark-µs precision gap can't
flip a window boundary (SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipetree_spark.catalog import load_table
from pipetree_spark.exact import dsum, dsum_sql, exact_sums, lsum
from pipetree_spark.queries import declare


@declare(
    "q_stream_tumbling",
    oracle=f"""
SELECT ((epoch_ns(ts) // 1000000000) // 3600) * 3600 AS window_start_sec,
       event_type,
       COUNT(*) AS n_events,
       {dsum_sql('value')} AS sum_value
FROM events
GROUP BY 1, 2
""",
    tags=("stream", "events", "bench"),
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window per event_type via F.window() — identical
    code runs under readStream+watermark (see tests). Epoch-aligned
    window starts are emitted as epoch seconds."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window(F.timestamp_seconds("ts_sec"), "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"), lsum("value").alias("sum_value"))
        .select(
            F.col("window.start").cast("long").alias("window_start_sec"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@declare(
    "q_stream_sliding",
    oracle="""
SELECT ((epoch_ns(ts) // 1000000000) // 900) * 900 - g.k * 900 AS window_start_sec,
       COUNT(*) AS n_events
FROM events CROSS JOIN generate_series(0, 3) AS g(k)
GROUP BY 1
""",
    tags=("stream", "events"),
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h length, 15 min slide): every event lands in
    exactly 4 windows. Oracle reproduces Spark's epoch-aligned window
    assignment with an offset cross join."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window(F.timestamp_seconds("ts_sec"), "1 hour", "15 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("window.start").cast("long").alias("window_start_sec"), "n_events")
    )


@declare(
    "q_stream_session",
    oracle=f"""
WITH flagged AS (
  SELECT user_id,
         event_id,
         epoch_ns(ts) // 1000000000 AS sec,
         value,
         CASE WHEN (epoch_ns(ts) // 1000000000)
                   - LAG(epoch_ns(ts) // 1000000000)
                     OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000000000, event_id)
                   >= 1800
              OR LAG(epoch_ns(ts) // 1000000000)
                 OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000000000, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id, sec, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       MIN(sec) AS session_start_sec,
       COUNT(*) AS n_events,
       {dsum_sql('value')} AS sum_value
FROM sessions
GROUP BY user_id, session_id
""",
    tags=("stream", "events"),
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window, 30-minute gap, per user (F.session_window works in
    batch). Oracle is the classic gaps-and-islands rewrite; a gap of
    exactly 1800 s starts a NEW session (Spark session end is exclusive:
    [start, last+gap))."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window(F.timestamp_seconds("ts_sec"), "30 minutes"))
        .agg(F.count("*").alias("n_events"), lsum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("session_window.start").cast("long").alias("session_start_sec"),
            "n_events",
            "sum_value",
        )
    )


@declare(
    "q_stream_watermark",
    oracle="""
WITH arr AS (
  SELECT event_type,
         epoch_ns(ts) // 1000000000 AS sec,
         MAX(epoch_ns(ts) // 1000000000) OVER (
           ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS high_water
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(count_if(high_water IS NOT NULL AND sec < high_water - 600) AS BIGINT) AS n_late,
       CAST(count_if(high_water IS NULL OR sec >= high_water - 600) AS BIGINT) AS n_kept
FROM arr
GROUP BY event_type
""",
    tags=("stream", "events", "certification-replay"),
)
def q_stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data semantics as a deterministic batch replay
    (SURVEY §2.9): the watermark after each arrival is the running max
    event time over arrival order (event_id) minus the 10-minute delay;
    an event whose time is below the watermark at its arrival would be
    DROPPED by `withWatermark("ts", "10 minutes")`. Declares the drop
    rule itself — the stateful streaming twin runs in
    tests/test_streaming.py.

    Scale note: the global arrival-order window is a single-partition
    sort by construction — it is the definitional sequential replay of
    one stream, used as a certification query; the production path is
    the incremental watermark state inside Structured Streaming, never
    a batch global window."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, -1)
    arr = e.select(
        "event_type",
        F.col("ts_sec").alias("sec"),
        F.max("ts_sec").over(w).alias("high_water"),
    )
    late = F.col("high_water").isNotNull() & (F.col("sec") < F.col("high_water") - 600)
    return arr.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count_if(late).alias("n_late"),
        F.count_if(~late).alias("n_kept"),
    )


@declare(
    "q_stream_static_join",
    oracle=f"""
SELECT ((epoch_ns(e.ts) // 1000000000) // 3600) * 3600 AS window_start_sec,
       c.c_mktsegment,
       COUNT(*) AS n_events,
       {dsum_sql('e.value')} AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
""",
    tags=("stream", "events"),
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join + windowed agg (SURVEY §2.9): the
    unbounded side (events) joins a broadcast static dim (customer) —
    in streaming this is the per-micro-batch map-side join that needs
    no state — then aggregates per tumbling hour per segment. Identical
    code runs under readStream (stream-static joins are stateless);
    tests/test_streaming.py exercises that path."""
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    j = e.join(F.broadcast(c), e.user_id == c.c_custkey)
    return (
        j.groupBy(F.window(F.timestamp_seconds("ts_sec"), "1 hour"), "c_mktsegment")
        .agg(F.count("*").alias("n_events"), lsum("value").alias("sum_value"))
        .select(
            F.col("window.start").cast("long").alias("window_start_sec"),
            "c_mktsegment",
            "n_events",
            "sum_value",
        )
    )


@declare(
    "q_stream_dedup",
    oracle="""
SELECT DISTINCT user_id, event_type
FROM events
""",
    tags=("stream", "events"),
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analog of stateful stream dedup: dropDuplicates over the
    projected key. The streaming twin (dropDuplicatesWithinWatermark) is
    covered in tests/test_streaming.py — its keep-first row choice is
    arrival-order-dependent and so only the key projection is declared."""
    e = load_table(spark, sf_dir, "events")
    return e.select("user_id", "event_type").dropDuplicates()
