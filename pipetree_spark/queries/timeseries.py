"""Time-series operators: spine generation, gap-filling, LOCF, histograms.

A 100 TB training-data pipeline constantly needs dense time grids over
sparse event data (rollups with empty buckets, carry-forward state,
distribution histograms). These are built engine-side — the spine is
``sequence()`` + ``explode`` (no driver loop, no collect), the fill is a
left join, and LOCF is the portable gaps-and-islands rewrite (COUNT over
preceding rows → island id → MAX per island) rather than
``last_value IGNORE NULLS``, so the identical algorithm runs on the
DuckDB oracle side.

Reference note: the reference (pipetree/pipetree, ML pipeline
orchestrator; /root/reference empty — SURVEY §0) has no time-series
surface; north-star extension [SURVEY §2.0 tag E].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pipetree_spark.catalog import OPEN_INTERVAL_SENTINEL, load_table
from pipetree_spark.exact import dec, dsum, dsum_sql, pin_zero, safe_div
from pipetree_spark.queries import declare

# One-week hourly spine over the first 20 users: 20 × 168 = 3360 cells at
# every SF (events span 2024-01-01..2024-01-30, user_id ⊇ 0..149 — FIXTURES).
SPINE_START = "2024-01-01 00:00:00"
SPINE_END = "2024-01-07 23:00:00"
N_USERS = 20

SPINE_SQL = f"""
  SELECT u.user_id, h.bucket_hour
  FROM (SELECT UNNEST(range(0, {N_USERS})) AS user_id) u
  CROSS JOIN (
    SELECT UNNEST(generate_series(TIMESTAMP '{SPINE_START}',
                                  TIMESTAMP '{SPINE_END}',
                                  INTERVAL 1 HOUR)) AS bucket_hour
  ) h
"""

HOURLY_SQL = f"""
  SELECT user_id, DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS bucket_hour,
         COUNT(*) AS n_events,
         {dsum_sql('value', 6, 24)} AS sum_value
  FROM events
  WHERE user_id < {N_USERS}
  GROUP BY 1, 2
"""


def _spine(spark: SparkSession) -> DataFrame:
    """Dense (user, hour) grid, generated engine-side.

    ``sequence()`` builds the arrays inside codegen; the explode is the
    lateral op. At scale the spine stays tiny relative to the fact side
    (its size is grid cells, not events).
    """
    users = spark.range(1).select(
        F.explode(F.sequence(F.lit(0), F.lit(N_USERS - 1))).alias("user_id")
    )
    hours = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(SPINE_START).cast("timestamp"),
                F.lit(SPINE_END).cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bucket_hour")
    )
    return users.crossJoin(hours)


def _hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < N_USERS)
    return e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("bucket_hour")
    ).agg(F.count("*").alias("n_events"), dsum("value", 6, 24).alias("sum_value"))


@declare(
    "q_ts_gapfill",
    oracle=f"""
WITH spine AS ({SPINE_SQL}), hourly AS ({HOURLY_SQL})
SELECT s.user_id, s.bucket_hour,
       COALESCE(h.n_events, 0) AS n_events,
       COALESCE(h.sum_value, 0.0) AS sum_value
FROM spine s LEFT JOIN hourly h
  ON s.user_id = h.user_id AND s.bucket_hour = h.bucket_hour
""",
    tags=("timeseries", "events"),
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled dense hourly rollup: spine LEFT JOIN sparse aggregates.

    The aggregate runs BEFORE the spine join (shuffle carries one row
    per non-empty bucket, not per event); empty buckets materialize only
    in the joined output. (The spine is the preserved side of the left
    join, so it cannot broadcast — both inputs are post-aggregation
    small, and the shuffle keys are the grid keys.)
    """
    h = _hourly(spark, sf_dir)
    s = _spine(spark)
    return (
        s.join(h, ["user_id", "bucket_hour"], "left")
        .select(
            "user_id",
            "bucket_hour",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
    )


@declare(
    "q_ts_locf",
    oracle=f"""
WITH spine AS ({SPINE_SQL}), hourly AS ({HOURLY_SQL}),
filled AS (
  SELECT s.user_id, s.bucket_hour, h.sum_value,
         COUNT(h.sum_value) OVER (
           PARTITION BY s.user_id ORDER BY s.bucket_hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS island
  FROM spine s LEFT JOIN hourly h
    ON s.user_id = h.user_id AND s.bucket_hour = h.bucket_hour
)
SELECT user_id, bucket_hour,
       COALESCE(MAX(sum_value) OVER (PARTITION BY user_id, island), 0.0) AS locf_value
FROM filled
""",
    tags=("timeseries", "events", "window"),
)
def q_ts_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward over gap hours.

    Portable gaps-and-islands: a running COUNT of non-null observations
    assigns every gap row to the island of its last observation; MAX per
    island broadcasts that observation forward (each island has exactly
    one non-null value, so MAX is a carry, not an aggregate choice).
    Hours before a user's first observation stay at 0.0. Exact-decimal
    hourly sums make the carried doubles bit-identical cross-engine.
    """
    h = _hourly(spark, sf_dir).select("user_id", "bucket_hour", "sum_value")
    s = _spine(spark)
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("bucket_hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        s.join(h, ["user_id", "bucket_hour"], "left")
        .withColumn("island", F.count("sum_value").over(w_run))
    )
    w_island = Window.partitionBy("user_id", "island")
    return filled.select(
        "user_id",
        "bucket_hour",
        F.coalesce(F.max("sum_value").over(w_island), F.lit(0.0)).alias("locf_value"),
    )


@declare(
    "q_ts_histogram",
    oracle="""
SELECT LEAST(CAST(FLOOR(l_extendedprice / 5000.0) AS INTEGER), 19) AS bucket,
       COUNT(*) AS n_rows,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price
FROM lineitem
GROUP BY 1
""",
    tags=("timeseries", "agg"),
)
def q_ts_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (20 × $5000 buckets, top-clamped).

    The bucket expression is plain FLOOR/LEAST double math — identical
    bits in both engines, no width_bucket dialect drift. At 100 TB this
    is a pure map-side-combine aggregation with ≤20 final groups.
    """
    l = load_table(spark, sf_dir, "lineitem")
    bucket = F.least(
        F.floor(F.col("l_extendedprice") / F.lit(5000.0)).cast("int"), F.lit(19)
    )
    return l.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n_rows"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@declare(
    "q_ts_funnel",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END) AS first_signup,
         MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS first_purchase
  FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       CAST(count_if(first_signup IS NOT NULL) AS BIGINT) AS n_signed_up,
       CAST(count_if(first_signup IS NOT NULL AND first_purchase > first_signup) AS BIGINT) AS n_converted,
       CAST(count_if(first_signup IS NOT NULL
                AND first_purchase > first_signup
                AND first_purchase <= first_signup + INTERVAL 72 HOUR) AS BIGINT) AS n_converted_72h
FROM per_user
""",
    tags=("timeseries", "events"),
)
def q_ts_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step conversion funnel (signup → purchase, 72 h window).

    One grouped pass computes each user's first signup / first purchase
    (conditional MIN — no per-step self-joins, the naive funnel shape
    that collapses at scale); the funnel counts reduce the per-user
    relation. Timestamp comparisons run on the µs-truncated engine
    timestamps; event times carry sub-second but NO sub-microsecond
    parts (verified across SFs), so the catalog's ns→µs conversion is
    lossless and every comparison is bit-identical to the oracle's.
    """
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("first_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    converted = F.col("first_signup").isNotNull() & (
        F.col("first_purchase") > F.col("first_signup")
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count_if(F.col("first_signup").isNotNull()).alias("n_signed_up"),
        F.count_if(converted).alias("n_converted"),
        F.count_if(
            converted
            & (F.col("first_purchase") <= F.col("first_signup") + F.expr("INTERVAL 72 HOURS"))
        ).alias("n_converted_72h"),
    )


@declare(
    "q_ts_retention",
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(DATE_TRUNC('week', CAST(ts AS TIMESTAMP))) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         date_diff('week', f.cohort_week, DATE_TRUNC('week', CAST(e.ts AS TIMESTAMP))) AS week_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
       CAST(week_offset AS INTEGER) AS week_offset,
       COUNT(*) AS n_active_users
FROM activity
GROUP BY 1, 2
""",
    tags=("timeseries", "events", "window"),
)
def q_ts_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle.

    cohort = user's first active ISO week; each (cohort, offset) cell
    counts distinct users active that many weeks later. Two shuffles on
    user_id (first-week agg + cohort join — co-partitioned, AQE merges
    them) then one on the tiny (cohort, offset) grid. Week truncation
    uses Monday-start ISO weeks in both engines; events carry no
    sub-MICROSECOND parts, so the ns→µs load conversion is lossless
    and week boundaries agree exactly.
    """
    e = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    firsts = e.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.to_date(wk), F.to_date("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("n_active_users")
    )


@declare(
    "q_ts_scd2",
    oracle=f"""
SELECT o_custkey AS custkey,
       o_orderkey AS version_key,
       o_totalprice AS attr_price,
       o_orderdate AS valid_from,
       COALESCE(
         LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
         TIMESTAMP '{OPEN_INTERVAL_SENTINEL}'
       ) AS valid_to,
       CASE WHEN LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                 IS NULL THEN 1 ELSE 0 END AS is_current
FROM orders
WHERE o_custkey < 100
""",
    tags=("timeseries", "window", "pipeline"),
)
def q_ts_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 interval construction from a change log.

    Treats each order as a new version of its customer's state and
    derives [valid_from, valid_to) intervals + current flag with one
    LEAD window — the standard dimension-versioning build (no self
    join). Order-by carries the unique key as tie-break so equal-date
    versions chain deterministically. At 100 TB the window partitions
    by the dimension key — perfectly parallel, skew bounded by max
    versions per entity.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt_date = F.lead("o_orderdate").over(w)
    nxt_key = F.lead("o_orderkey").over(w)
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("version_key"),
        F.col("o_totalprice").alias("attr_price"),
        F.col("o_orderdate").alias("valid_from"),
        # Arrow-safe sentinel — rationale at catalog.OPEN_INTERVAL_SENTINEL.
        F.coalesce(nxt_date, F.lit(OPEN_INTERVAL_SENTINEL).cast("timestamp")).alias("valid_to"),
        F.when(nxt_key.isNull(), 1).otherwise(0).alias("is_current"),
    )


@declare(
    "q_ts_sessionize",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, (epoch_ns(ts) // 1000000000) AS sec, value FROM events
),
m AS (
  SELECT *,
         CASE WHEN LAG(sec) OVER w IS NULL OR sec - LAG(sec) OVER w > 1800
              THEN 1 ELSE 0 END AS is_start
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
),
s AS (
  SELECT *,
         CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM m
)
SELECT user_id, session_idx,
       MIN(sec) AS session_start_sec,
       MAX(sec) AS session_end_sec,
       COUNT(*) AS n_events,
       {dsum_sql('value')} AS sum_value
FROM s GROUP BY user_id, session_idx
""",
    tags=("timeseries", "events", "window"),
)
def q_ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH sessionization — the gaps-and-islands build: a session
    starts at any event whose gap to the user's previous event exceeds
    30 min; session id = running count of starts; one aggregate row per
    session (start/end/size/spend). The batch counterpart of
    q_stream_session's state-store sessions, and the standard rewrite
    that replaces a per-user UDF loop with two window passes + one
    groupBy — fully declarative, so Catalyst plans it.

    Determinism: gap logic is pure int64 epoch-second arithmetic with
    the unique event_id tie-break; the only float, session spend, goes
    through the exact-decimal sum. Scale: both windows AND the final
    groupBy cluster on user_id — Catalyst plans ONE exchange and reuses
    it end-to-end; skew is bounded by one user's event count."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts_sec", "value")
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    gap = F.col("ts_sec") - F.lag("ts_sec").over(w)
    is_start = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts_sec", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = e.withColumn("is_start", is_start).withColumn(
        "session_idx", F.sum("is_start").over(run)
    )
    return s.groupBy("user_id", "session_idx").agg(
        F.min("ts_sec").alias("session_start_sec"),
        F.max("ts_sec").alias("session_end_sec"),
        F.count("*").alias("n_events"),
        dsum("value").alias("sum_value"),
    )


@declare(
    "q_ts_anomaly",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, (epoch_ns(ts) // 1000000000) AS sec, value FROM events
),
m AS (
  SELECT *,
         COUNT(value)                                    OVER w AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2)))          OVER w AS DOUBLE) AS s1,
         CAST(SUM(CAST(value * value AS DECIMAL(24,4)))  OVER w AS DOUBLE) AS s2
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, sec, value, baseline_mean, z
FROM (
  -- SQRT is gated on var > 0 INSIDE a CASE, not by conjunct order:
  -- a constant fractional-cents window cancels var to a tiny NEGATIVE
  -- double, and an unguarded SQRT in a reorderable WHERE conjunct
  -- could crash the engine (mirrors the query's safe_div hardening)
  SELECT event_id, user_id, sec, value, n,
         s1 / n AS baseline_mean,
         CASE WHEN (s2 - (s1 * s1) / n) / (n - 1) > 0
              THEN (value - s1 / n) / SQRT((s2 - (s1 * s1) / n) / (n - 1))
         END AS z
  FROM m
  WHERE n = 20
)
WHERE ABS(z) > 3
""",
    tags=("timeseries", "events", "window"),
)
def q_ts_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event is scored against
    its user's TRAILING 20-event baseline (frame excludes the current
    row — the score must not contaminate its own baseline) and flagged
    when it sits >3σ out. The monitoring primitive every ingest
    pipeline bolts onto a metric stream.

    Determinism (the interesting part — rolling *variance* normally
    drifts cross-engine): both moments are EXACT-DECIMAL window sums —
    value has 2 dp so DECIMAL(18,2) is exact, value² has 4 dp and one
    IEEE multiply of identical bits lands within 1 ulp of the true 4-dp
    product, so DECIMAL(24,4) rounds identically in both engines. From
    those identical doubles, mean/var/z is a pinned tree of correctly-
    rounded IEEE ops (÷, −, ×, √) — bit-identical, no rounding policy
    needed even though this is a statistical aggregate.

    Scale: one exchange on user_id, one WindowExec pass computing all
    three frame aggregates together; skew bounded by one user's events.
    The n = 20 full-window gate drops each user's warm-up rows."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts_sec", "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec", "event_id")
        .rowsBetween(-20, -1)
    )
    # raw moments only in the window pass; divisions happen AFTER the
    # n = 20 gate so ANSI mode never sees a 0-count warm-up row
    m = (
        e.withColumn("n", F.count("value").over(w))
        .withColumn("s1", F.sum(dec("value")).over(w).cast("double"))
        .withColumn(
            "s2", F.sum(dec(F.col("value") * F.col("value"), 4, 24)).over(w).cast("double")
        )
        .filter(F.col("n") == 20)
    )
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") - (F.col("s1") * F.col("s1")) / F.col("n")) / (F.col("n") - 1)
    # safe_div: a constant 20-event window has var = 0; relying on the
    # conjunct order of the (var > 0) filter to shield the division is
    # plan-order fragile under ANSI — NULL z is dropped by |z| > 3
    # exactly as DuckDB's x/0 NULL is (r7 hardening)
    z = safe_div(F.col("value") - mean, F.sqrt(var))
    return (
        m.withColumn("baseline_mean", mean)
        .withColumn("var", var)
        .withColumn("z", z)
        .filter((F.col("var") > 0) & (F.abs(F.col("z")) > 3))
        .select(
            "event_id",
            "user_id",
            F.col("ts_sec").alias("sec"),
            "value",
            "baseline_mean",
            "z",
        )
    )


@declare(
    "q_ts_ohlc",
    oracle="""
WITH e AS (
  SELECT event_type,
         epoch_ns(ts) // 1000000000 // 86400 AS day,
         epoch_ns(ts) AS tns, event_id, value
  FROM events),
r AS (
  SELECT event_type, day, value,
         ROW_NUMBER() OVER (PARTITION BY event_type, day ORDER BY tns, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type, day ORDER BY tns DESC, event_id DESC) AS rn_d
  FROM e)
SELECT event_type, day,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*) AS volume
FROM r GROUP BY event_type, day
""",
    tags=("timeseries", "window"),
)
def q_ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar downsampling: per (event_type, day) the opening /
    highest / lowest / closing ``value`` and the tick count — the
    canonical time-series rollup that turns a raw tick stream into
    fixed-period bars.

    Determinism: bars order ticks by EXACT int64 nanoseconds (ts_ns —
    second-truncated ordering would make open/close depend on shuffle
    order within a second) with event_id as the total-order tie-break;
    open/high/low/close are raw stored doubles passed through
    untouched, so the driver hash is bit-safe with no rounding policy.

    Scale shape: one shuffle on (event_type, day) shared by both
    window passes and the aggregate; day keys partition evenly by
    construction (time advances), and downstream consumers read
    |types|·|days| bars instead of the tick firehose — the rollup IS
    the data-reduction step at 100 TB.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("ts_sec div 86400").alias("day"),
        "ts_ns",
        "event_id",
        "value",
    )
    w_a = Window.partitionBy("event_type", "day").orderBy("ts_ns", "event_id")
    w_d = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts_ns").desc(), F.col("event_id").desc()
    )
    r = e.select(
        "event_type",
        "day",
        "value",
        F.row_number().over(w_a).alias("rn_a"),
        F.row_number().over(w_d).alias("rn_d"),
    )
    return r.groupBy("event_type", "day").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count("*").alias("volume"),
    )


@declare(
    "q_ts_trend",
    oracle="""
WITH m AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(CAST(epoch_ns(ts) // 1000000000 AS HUGEINT)) AS sx,
         SUM(CAST(CAST(ROUND(value * 100) AS BIGINT) AS HUGEINT)) AS sy,
         SUM(CAST((epoch_ns(ts) // 1000000000) * CAST(ROUND(value * 100) AS BIGINT) AS HUGEINT)) AS sxy,
         SUM(CAST((epoch_ns(ts) // 1000000000) * (epoch_ns(ts) // 1000000000) AS HUGEINT)) AS sxx
  FROM events WHERE value IS NOT NULL GROUP BY event_type)
SELECT event_type, n,
       round((CAST(n * sxy - sx * sy AS DOUBLE) * 864.0)
             / nullif(CAST(n * sxx - sx * sx AS DOUBLE), 0), 6) + 0.0 AS slope_per_day,
       round(CAST(sy AS DOUBLE) / (n * 100.0), 2) + 0.0 AS mean_value
FROM m
""",
    tags=("timeseries", "agg"),
)
def q_ts_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend (value vs time) from EXACT integer
    moment sums: slope = (nΣxy − ΣxΣy) / (nΣxx − Σx²) with x = epoch
    seconds and y = exact cents, every sum and cross-term accumulated
    in 128-bit-exact integers (BIGINT products → DECIMAL(38,0)/HUGEINT
    sums — no float summation anywhere, so no order drift), and ONLY
    the final slope touching doubles: two correctly-rounded casts and
    one multiply+divide in pinned order on identical integers.
    slope_per_day scales by 864 (86400 s/day ÷ the 100 cents/unit).

    This is the moment-sums discipline (q_agg_moments, q_ts_anomaly)
    applied to regression: the whole fit is ONE map-side-combined
    aggregate pass with |groups| output rows — per-segment trend
    detection ("is error volume drifting up?") at 100 TB costs one
    scan, no window, no sort, and partial moment sums merge across
    partitions/days by addition.
    """
    e = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    m = (
        e.select(
            "event_type",
            F.col("ts_sec").alias("x"),
            cents.alias("y"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("CAST(x AS DECIMAL(38,0))")).alias("sx"),
            F.sum(F.expr("CAST(y AS DECIMAL(38,0))")).alias("sy"),
            F.sum(F.expr("CAST(x * y AS DECIMAL(38,0))")).alias("sxy"),
            F.sum(F.expr("CAST(x * x AS DECIMAL(38,0))")).alias("sxx"),
        )
    )
    return m.select(
        "event_type",
        "n",
        # nullif guards the zero-variance group (n=1 or all-equal ts):
        # NULL-on-zero division matches DuckDB, where a raw double /0
        # would diverge (safe_div's contract, exact.py)
        pin_zero(F.round(
            safe_div(
                F.expr("CAST(n * sxy - sx * sy AS DOUBLE)") * F.lit(864.0),
                F.expr("CAST(n * sxx - sx * sx AS DOUBLE)"),
            ),
            6,
        )).alias("slope_per_day"),
        pin_zero(F.round(F.expr("CAST(sy AS DOUBLE)") / F.expr("n * 100.0"), 2)).alias(
            "mean_value"
        ),
    )


@declare(
    "q_ts_autocorr",
    oracle="""
WITH c AS (
  SELECT event_type, epoch_ns(ts) AS tns, event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL),
p AS (
  SELECT event_type, y,
         LEAD(y) OVER (PARTITION BY event_type ORDER BY tns, event_id) AS y_next
  FROM c),
m AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(y AS HUGEINT)) AS s,
         SUM(CAST(y * y AS HUGEINT)) AS syy,
         SUM(CAST(CASE WHEN y_next IS NOT NULL THEN y * y_next END AS HUGEINT)) AS sadj,
         SUM(CAST(CASE WHEN y_next IS NOT NULL THEN y END AS HUGEINT)) AS sh,
         SUM(CAST(CASE WHEN y_next IS NOT NULL THEN y_next END AS HUGEINT)) AS st
  FROM p GROUP BY event_type)
SELECT event_type, n,
       round(CAST(n * n * sadj - n * s * (sh + st) + (n - 1) * s * s AS DOUBLE)
             / nullif(CAST(n * (n * syy - s * s) AS DOUBLE), 0), 4) + 0.0 AS autocorr_lag1
FROM m
""",
    tags=("timeseries", "stats"),
)
def q_ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of event value per event type — the
    trend/Spearman family's memory test ("does a high value predict
    the next one?"). The estimator Σ(y_t−ȳ)(y_{t+1}−ȳ) / Σ(y−ȳ)² is
    multiplied through by n² so EVERY term is an exact 128-bit
    integer (adjacent products via one lead window ordered by exact
    (ns, event_id); no float mean ever materializes), and only the
    final ratio divides pinned doubles — nullif for degenerate
    (constant or n ≤ 1) series, where both engines yield NULL.

    Scale: one shuffle on event_type shared by the lead window and
    the moment aggregate; |groups| output rows; partial moment sums
    merge by addition except across the per-partition boundary pair —
    at 100 TB the window's shuffle IS that boundary handling.
    """
    e = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    c = e.select(
        "event_type",
        "ts_ns",
        "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("y"),
    )
    w = Window.partitionBy("event_type").orderBy("ts_ns", "event_id")
    p = c.select("event_type", "y", F.lead("y").over(w).alias("y_next"))
    m = p.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0))")).alias("s"),
        F.sum(F.expr("CAST(y * y AS DECIMAL(38,0))")).alias("syy"),
        F.sum(
            F.expr("CAST(CASE WHEN y_next IS NOT NULL THEN y * y_next END AS DECIMAL(38,0))")
        ).alias("sadj"),
        F.sum(
            F.expr("CAST(CASE WHEN y_next IS NOT NULL THEN y END AS DECIMAL(38,0))")
        ).alias("sh"),
        F.sum(
            F.expr("CAST(CASE WHEN y_next IS NOT NULL THEN y_next END AS DECIMAL(38,0))")
        ).alias("st"),
    )
    return m.select(
        "event_type",
        "n",
        pin_zero(F.round(
            F.expr("CAST(n * n * sadj - n * s * (sh + st) + (n - 1) * s * s AS DOUBLE)")
            / F.expr("nullif(CAST(n * (n * syy - s * s) AS DOUBLE), 0)"),
            4,
        )).alias("autocorr_lag1"),
    )


@declare(
    "q_ts_cusum",
    oracle="""
WITH c AS (
  SELECT event_type, event_id, epoch_ns(ts) AS tns,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL),
m AS (SELECT event_type, COUNT(*) AS n, SUM(CAST(cents AS HUGEINT)) AS s
      FROM c GROUP BY event_type),
w AS (
  SELECT c.event_type, c.event_id, c.tns, m.n,
         SUM(CAST(m.n AS HUGEINT) * c.cents - m.s)
           OVER (PARTITION BY c.event_type ORDER BY c.tns, c.event_id
                 ROWS UNBOUNDED PRECEDING) AS cusum
  FROM c JOIN m ON c.event_type = m.event_type),
st AS (
  SELECT event_type, event_id, n,
         cusum - MIN(cusum) OVER (PARTITION BY event_type ORDER BY tns, event_id
                                  ROWS UNBOUNDED PRECEDING) AS stat
  FROM w),
top AS (
  SELECT event_type, event_id, n, stat,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY stat DESC, event_id) AS rn
  FROM st)
SELECT event_type, n,
       round(CAST(stat AS DOUBLE) / (n * 100.0), 4) AS max_drift,
       event_id AS at_event
FROM top WHERE rn = 1
""",
    tags=("timeseries", "stats"),
)
def q_ts_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point statistic per event type: the
    maximum of (cusum − running-min cusum) over the time-ordered
    cumulative deviation from the series mean — WHERE the value level
    shifted hardest upward, and by how much (reported in value units,
    with the event id at the peak). The drift detector that catches
    sustained small shifts a per-point z-score (q_ts_anomaly) misses.

    Integer-exact throughout: deviations are scaled by n (dev = n·y −
    Σy, so the fractional mean never materializes), the cusum and its
    running min are 128-bit integer window sums over the exact
    (ns, event_id) order, and only the final report divides pinned
    doubles. The event_id ordering inside cusum is the same total
    order every time-series op here uses — one row-order flip anywhere
    changes the certified statistic, so the driver hash pins the whole
    path, not just the endpoint.

    Scale: one shuffle on event_type shared by two window passes and
    the top-1 pick; |groups| output rows.
    """
    e = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    c = e.select(
        "event_type",
        "event_id",
        "ts_ns",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    m = c.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.expr("CAST(cents AS DECIMAL(38,0))")).alias("s"),
    )
    d = c.join(F.broadcast(m), "event_type").select(
        "event_type",
        "event_id",
        "ts_ns",
        "n",
        F.expr("CAST(n AS DECIMAL(38,0)) * cents - s").alias("dev"),
    )
    w_time = (
        Window.partitionBy("event_type")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wdf = d.select(
        "event_type",
        "event_id",
        "ts_ns",
        "n",
        F.sum("dev").over(w_time).alias("cusum"),
    )
    st = wdf.select(
        "event_type",
        "event_id",
        "n",
        (F.col("cusum") - F.min("cusum").over(w_time)).alias("stat"),
    )
    w_top = Window.partitionBy("event_type").orderBy(
        F.col("stat").desc(), F.col("event_id")
    )
    return (
        st.withColumn("rn", F.row_number().over(w_top))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            "n",
            F.round(F.expr("CAST(stat AS DOUBLE)") / F.expr("n * 100.0"), 4).alias(
                "max_drift"
            ),
            F.col("event_id").alias("at_event"),
        )
    )


@declare(
    "q_ts_ewma",
    oracle="""
WITH ev AS (
  SELECT user_id, ts, event_id, CAST(ROUND(value * 10000) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL),
arr AS (
  SELECT user_id, COUNT(*) AS n, list(x ORDER BY ts, event_id) AS xs
  FROM ev GROUP BY user_id)
SELECT user_id,
       CAST(n AS BIGINT) AS n_events,
       CAST(xs[len(xs)] AS BIGINT) AS last_x4,
       CAST(list_reduce(xs, (r, x) -> CAST(FLOOR((3 * r + x) / 4) AS BIGINT))
            AS BIGINT) AS ewma4
FROM arr
""",
    tags=("timeseries",),
)
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average, INTEGER-EXACT — the
    recursive smoother missing from the rolling/anomaly family (EWMA
    is a recurrence, so no window frame expresses it): per user, over
    (ts, event_id)-ordered 4-dp-scaled values, r ← ⌊(3·r + x) / 4⌋
    with r₀ = x₀ (α = 1/4). The divisor is a power of two, so the
    IEEE divide is exact and FLOOR is the same function in both
    engines — no truncate-vs-floor divergence on negative deltas, the
    trap that rules out integer ``div`` here. Spark folds with
    F.aggregate over the sorted per-user array (first element as init,
    mirroring DuckDB's list_reduce seeding) — per-user state is one
    long, and the collected array is bounded by the user's own event
    count, the same per-key bound every sessionization op carries.

    Scale shape: one groupBy(user_id) shuffle; the fold is a narrow
    array expression. NULL values are filtered explicitly because the
    engines disagree on NULLs in collected lists."""
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            F.round(F.col("value") * 10000).cast("long").alias("x"),
        )
    )
    arr = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "x"))).alias("s"),
    )
    xs = F.transform(F.col("s"), lambda t: t["x"])
    ewma = F.aggregate(
        F.slice(xs, F.lit(2), F.size(xs) - 1),
        F.element_at(xs, 1),
        lambda r, x: F.floor((r * 3 + x) / 4).cast("long"),
    )
    return arr.select(
        "user_id",
        "n_events",
        F.element_at(xs, -1).alias("last_x4"),
        ewma.alias("ewma4"),
    )
