"""Scalar-function surface: string / date / math / array / map / JSON
(SURVEY §2.8).

Per-row scalar ops are IEEE/bit-identical across engines, so results are
emitted raw except transcendentals (round 4). Dialect gotchas handled:
- DuckDB ``regexp_replace`` needs the ``'g'`` flag to match Spark's
  global replace.
- Day-of-week: Spark ``weekday()`` is 0=Monday; DuckDB ``isodow`` is
  1=Monday → normalize to 0=Monday on both sides.
- Date-typed outputs are rendered as strings (both engines format the
  same wall-clock value under the engine's pinned UTC session TZ).
- DuckDB ``floor``/``sign`` return doubles/ints inconsistently with
  Spark → explicit casts on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipetree_spark.catalog import load_table
from pipetree_spark.exact import pin_zero
from pipetree_spark.queries import declare


@declare(
    "q_fn_string",
    oracle="""
SELECT p_partkey,
       UPPER(p_type) AS type_upper,
       LOWER(p_name) AS name_lower,
       SUBSTRING(p_name, 1, 8) AS name_prefix,
       CONCAT_WS('|', p_brand, p_type) AS brand_type,
       LEN(string_split(p_type, ' ')) AS n_type_words,
       LENGTH(p_name) AS name_len,
       LPAD(p_brand, 12, '*') AS brand_padded,
       REGEXP_REPLACE(p_type, ' ', '_', 'g') AS type_snake,
       CAST(REGEXP_EXTRACT(p_brand, '#([0-9]+)', 1) AS INT) AS brand_num,
       TRIM(CONCAT(' ', p_brand, ' ')) AS brand_trim
FROM part
""",
    tags=("fn",),
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_type").alias("type_upper"),
        F.lower("p_name").alias("name_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.size(F.split("p_type", " ")).alias("n_type_words"),
        F.length("p_name").alias("name_len"),
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.regexp_extract("p_brand", "#([0-9]+)", 1).cast("int").alias("brand_num"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("brand_trim"),
    )


@declare(
    "q_fn_date",
    oracle="""
SELECT o_orderkey,
       YEAR(o_orderdate) AS yr,
       MONTH(o_orderdate) AS mo,
       DAY(o_orderdate) AS dy,
       QUARTER(o_orderdate) AS qtr,
       STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
       STRFTIME(CAST(o_orderdate AS DATE) + INTERVAL 7 DAY, '%Y-%m-%d') AS plus_week,
       DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch0,
       STRFTIME(LAST_DAY(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       CAST(DATE_PART('isodow', o_orderdate) AS INT) - 1 AS dow_mon0
FROM orders
""",
    tags=("fn",),
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions, normalized to the 0=Monday convention
    (SURVEY §2.8 dow gotcha)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dy"),
        F.quarter(d).alias("qtr"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(d.cast("date"), 7), "yyyy-MM-dd").alias("plus_week"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since_epoch0"),
        F.date_format(F.last_day(d.cast("date")), "yyyy-MM-dd").alias("month_end"),
        F.weekday(d).alias("dow_mon0"),
    )


@declare(
    "q_fn_math",
    oracle="""
SELECT p_partkey,
       ABS(p_size - 25) AS size_dev,
       CAST(FLOOR(p_retailprice * 0.1) AS BIGINT) AS price_floor,
       CAST(CEIL(p_retailprice * 0.1) AS BIGINT) AS price_ceil,
       ROUND(SQRT(p_retailprice), 4) AS price_sqrt,
       CAST(POW(p_size, 2) AS DOUBLE) AS size_sq,
       ROUND(EXP(p_size * 0.01), 4) AS size_exp,
       ROUND(LN(p_retailprice), 4) AS price_ln,
       ROUND(LOG10(p_retailprice), 4) AS price_log10,
       CAST(SIGN(p_size - 25) AS INT) AS size_sign,
       p_partkey % 7 AS key_mod7
FROM part
""",
    tags=("fn",),
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.floor(F.col("p_retailprice") * 0.1).cast("bigint").alias("price_floor"),
        F.ceil(F.col("p_retailprice") * 0.1).cast("bigint").alias("price_ceil"),
        F.round(F.sqrt("p_retailprice"), 4).alias("price_sqrt"),
        F.pow("p_size", F.lit(2)).cast("double").alias("size_sq"),
        F.round(F.exp(F.col("p_size") * 0.01), 4).alias("size_exp"),
        F.round(F.log("p_retailprice"), 4).alias("price_ln"),
        F.round(F.log10("p_retailprice"), 4).alias("price_log10"),
        F.signum(F.col("p_size") - 25).cast("int").alias("size_sign"),
        F.pmod("p_partkey", F.lit(7)).alias("key_mod7"),
    )


@declare(
    "q_fn_array",
    oracle="""
SELECT doc_id,
       LEN(string_split(text, ' ')) AS n_words,
       LEN(list_distinct(string_split(text, ' '))) AS n_distinct_words,
       list_sort(string_split(text, ' '))[1] AS first_word_sorted,
       CAST(list_contains(string_split(text, ' '), 'join') AS INT) AS has_join,
       ARRAY_TO_STRING(list_slice(string_split(text, ' '), 1, 5), ' ') AS first5
FROM documents
""",
    tags=("fn", "text"),
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over tokenized text (explode/posexplode are
    exercised by q_text_tf and q_vec_centroid)."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
        F.element_at(F.array_sort(words), 1).alias("first_word_sorted"),
        F.array_contains(words, "join").cast("int").alias("has_join"),
        F.array_join(F.slice(words, 1, 5), " ").alias("first5"),
    )


@declare(
    "q_fn_map",
    oracle="""
SELECT user_id,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
       'n_click,n_view' AS map_keys_csv
FROM events
GROUP BY user_id
""",
    tags=("fn", "events"),
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType round-trip: build a map from arrays, extract values and
    keys back out. The oracle states the expected *values* directly
    (DuckDB MAP element access semantics drift across versions, so the
    map machinery runs Spark-side and is validated by its outputs)."""
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("c"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("v"),
    )
    m = F.map_from_arrays(F.array(F.lit("n_click"), F.lit("n_view")), F.array(F.col("c"), F.col("v")))
    return agg.select(
        "user_id",
        F.element_at(m, "n_click").alias("n_click"),
        F.element_at(m, "n_view").alias("n_view"),
        F.array_join(F.map_keys(m), ",").alias("map_keys_csv"),
    )


@declare(
    "q_fn_json",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY 1
""",
    tags=("fn", "events"),
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events props column (string JSON →
    get_json_object; integer sums are exact)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select((k % 10).alias("k_bucket"), k.alias("k"))
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n_events"), F.sum("k").alias("sum_k"))
    )


@declare(
    "q_fn_variant",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_typed,
       json_extract_string(props, '$.missing') AS missing_str
FROM events
WHERE event_id % 100 = 0
""",
    tags=("fn", "events"),
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured path via Spark 4 VariantType: parse_json once,
    then typed variant_get extraction (shredded access beats repeated
    string re-parsing when many keys are pulled from one JSON column).
    Missing keys: try_variant_get returns NULL, matching the oracle."""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.filter(F.col("event_id") % 100 == 0).select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_typed"),
        F.try_variant_get(v, "$.missing", "string").alias("missing_str"),
    )


@declare(
    "q_fn_interval",
    oracle="""
SELECT o_orderkey,
       STRFTIME(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS plus_90d,
       STRFTIME(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus_2mo,
       DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1996-01-01') AS days_to_anchor,
       CAST(EPOCH(TIMESTAMP '1996-01-01') - EPOCH(o_orderdate) AS BIGINT) AS secs_to_anchor
FROM orders
WHERE o_orderkey % 50 = 0
""",
    tags=("fn",),
)
def q_fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-time / year-month interval arithmetic (DayTimeIntervalType in
    the plan; outputs rendered portable as strings/longs). Calendar
    semantics pinned: month addition clamps to month end in both engines;
    day diffs count date boundaries (midnight timestamps ⇒ exact)."""
    o = load_table(spark, sf_dir, "orders")
    anchor = F.lit("1996-01-01").cast("timestamp_ntz")
    return o.filter(F.col("o_orderkey") % 50 == 0).select(
        "o_orderkey",
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"), "yyyy-MM-dd").alias("plus_90d"),
        F.date_format(F.add_months("o_orderdate", 2), "yyyy-MM-dd").alias("plus_2mo"),
        F.datediff(F.lit("1996-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_anchor"
        ),
        (anchor - F.col("o_orderdate")).cast("long").alias("secs_to_anchor"),
    )


@declare(
    "q_fn_bitwise",
    oracle="""
SELECT event_id,
       event_id & 255 AS band,
       event_id | 4096 AS bor,
       xor(event_id, 1365) AS bxor,
       event_id << 3 AS shl,
       event_id >> 2 AS shr,
       bit_count(event_id) AS bcount
FROM events
WHERE event_id < 64
""",
    tags=("fn",),
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator family (AND/OR/XOR/shifts/popcount) — exact
    integer ops, identical in both engines."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 64)
    k = F.col("event_id")
    return e.select(
        "event_id",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(4096)).alias("bor"),
        k.bitwiseXOR(F.lit(1365)).alias("bxor"),
        F.shiftleft(k, 3).alias("shl"),
        F.shiftright(k, 2).alias("shr"),
        F.bit_count(k).cast("long").alias("bcount"),
    )


@declare(
    "q_fn_condagg",
    oracle="""
SELECT o_orderstatus,
       CAST(count_if(o_totalprice > 150000.0) AS BIGINT) AS n_big,
       CAST(bool_and(o_totalprice > 0.0) AS INT) AS all_positive,
       CAST(bool_or(o_orderpriority = '1-URGENT') AS INT) AS any_urgent,
       MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END) AS max_urgent_price
FROM orders
GROUP BY o_orderstatus
""",
    tags=("fn", "agg"),
)
def q_fn_condagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregates: count_if / bool_and / bool_or and the
    filtered-MAX idiom (NULL-absorbing CASE inside the aggregate).

    Boolean aggregates are emitted as 0/1 INT on both sides: the
    driver's pandas canonicalizer hashes raw booleans unreliably
    (r1 hash_match=false on bit-identical rows), so the declared
    output schema is representation-proof by construction.
    """
    o = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    return o.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 150000.0).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0.0).cast("int").alias("all_positive"),
        F.bool_or(urgent).cast("int").alias("any_urgent"),
        F.max(F.when(urgent, F.col("o_totalprice"))).alias("max_urgent_price"),
    )


@declare(
    "q_fn_struct",
    oracle="""
SELECT c_nationkey,
       MIN(CASE WHEN rf = 1 THEN o_orderkey END) AS first_order_key,
       MIN(CASE WHEN rl = 1 THEN o_orderkey END) AS last_order_key,
       MIN(o_orderdate) AS first_date,
       MAX(o_orderdate) AS last_date
FROM (
  SELECT c_nationkey, o_orderkey, o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY o_orderdate ASC, o_orderkey ASC) AS rf,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY o_orderdate DESC, o_orderkey ASC) AS rl
  FROM customer JOIN orders ON o_custkey = c_custkey
)
GROUP BY c_nationkey
""",
    tags=("fn", "agg"),
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin/argmax via ordered STRUCT aggregation.

    Spark's ``min_by`` breaks ordering ties arbitrarily, so the engine
    uses the deterministic struct idiom instead: MIN/MAX over
    struct(orderdate, orderkey) orders lexicographically by field
    position — date first, key as tie-break — then projects the key
    back out — smallest key among the earliest date, and smallest key
    among the latest date (the oracle states the same choice with
    explicit row_number tie-breaks). Struct build + field access
    exercises the nested-type surface with scalar (hash-safe) outputs.
    """
    c, o = (load_table(spark, sf_dir, t) for t in ("customer", "orders"))
    j = o.join(F.broadcast(c.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
    first_s = F.min(F.struct(F.col("o_orderdate"), F.col("o_orderkey")))
    # for the max side, invert the tie-break so the SMALLEST key wins
    # among equal dates in both engines: max over (date, -key)
    last_s = F.max(F.struct(F.col("o_orderdate"), (-F.col("o_orderkey")).alias("neg_key")))
    return j.groupBy("c_nationkey").agg(
        first_s.getField("o_orderkey").alias("first_order_key"),
        (-last_s.getField("neg_key")).alias("last_order_key"),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
    )


@declare(
    "q_fn_hof",
    oracle="""
SELECT vec_id,
       array_to_string(list_transform(e2, x -> CAST(ROUND(x * 20000.0) AS BIGINT)), ',') AS doubled_head,
       len(list_filter(e2, x -> x > 0.0)) AS n_pos,
       ROUND(list_sum(list_transform(e2, x -> CAST(x AS DOUBLE))), 4) + 0.0 AS head_sum,
       CAST(list_sum(list_transform(e2, x -> CAST(x > 0.0 AS INT))) > 0 AS INT) AS any_pos,
       CAST(list_sum(list_transform(e2, x -> CAST(x <= 1.0 AS INT))) = len(e2) AS INT) AS all_le1
FROM (
  SELECT vec_id, list_transform(embedding[1:8], x -> ROUND(CAST(x AS DOUBLE), 4)) AS e2
  FROM embeddings WHERE vec_id < 100
)
""",
    tags=("fn", "vector"),
)
def q_fn_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: transform / filter / aggregate /
    exists / forall over an 8-dim embedding slice.

    Per-element math on identically-rounded doubles is bit-stable; the
    8-term aggregate sum runs in array order in both engines (fixed
    order ⇒ deterministic), rounded to 4dp for belt-and-braces. exists/
    forall are declared via their sum-of-indicators SQL equivalents.

    Driver-hashable output schema: the transformed array is serialized
    as a comma-joined string of scaled longs (e2 elements are 4dp
    multiples, so x*20000 is near-integer — exact in both engines; no
    float-formatting divergence), and exists/forall emit 0/1 INT —
    raw arrays break the driver's pandas sort (r1 ndarray TypeError)
    and raw booleans its hash.
    """
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    head = F.transform(F.slice("embedding", 1, 8), lambda x: F.round(x.cast("double"), 4))
    d = e.select("vec_id", head.alias("e2"))
    return d.select(
        "vec_id",
        F.array_join(
            F.transform("e2", lambda x: F.round(x * 20000.0).cast("long").cast("string")), ","
        ).alias("doubled_head"),
        F.size(F.filter("e2", lambda x: x > 0.0)).alias("n_pos"),
        pin_zero(F.round(
            F.aggregate("e2", F.lit(0.0), lambda acc, x: acc + x), 4
        )).alias("head_sum"),
        F.exists("e2", lambda x: x > 0.0).cast("int").alias("any_pos"),
        F.forall("e2", lambda x: x <= 1.0).cast("int").alias("all_le1"),
    )


@declare(
    "q_fn_from_json",
    oracle="""
SELECT COALESCE(CAST(json_extract_string(props, '$.k') AS INTEGER) % 10, -1) AS k_mod,
       COUNT(*) AS n_events,
       MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
FROM events
GROUP BY 1
""",
    tags=("fn", "events"),
)
def q_fn_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-full JSON parsing: ``from_json`` into a typed struct (vs
    q_fn_json's path-extraction) then struct-field access — the path a
    pipeline takes when the JSON schema is known and columnar pruning
    should apply downstream."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.select(
        F.from_json("props", T.StructType([T.StructField("k", T.IntegerType())])).alias("p")
    )
    return (
        parsed.select(F.coalesce(F.col("p.k") % 10, F.lit(-1)).alias("k_mod"), F.col("p.k").alias("k"))
        .groupBy("k_mod")
        .agg(
            F.count("*").alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@declare(
    "q_fn_editdist",
    oracle="""
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS edit_dist
FROM part a JOIN part b
  ON a.p_type = b.p_type AND b.p_partkey = a.p_partkey + 1
WHERE levenshtein(a.p_name, b.p_name) <= 6
""",
    tags=("fn", "text"),
)
def q_fn_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit distance over blocked name pairs — the fuzzy-
    match primitive (typo-level dedup) both engines implement with the
    identical DP definition (exact integer output). Pairing is bounded
    (adjacent keys within a type block), the discipline any edit-
    distance join needs — the DP is O(len²) per pair."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type", "p_name")
    a, b = p.alias("a"), p.alias("b")
    j = a.join(
        b,
        (F.col("a.p_type") == F.col("b.p_type"))
        & (F.col("b.p_partkey") == F.col("a.p_partkey") + 1),
    )
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return j.select(
        F.col("a.p_partkey").alias("key_a"),
        F.col("b.p_partkey").alias("key_b"),
        F.col("a.p_name").alias("name_a"),
        F.col("b.p_name").alias("name_b"),
        dist.alias("edit_dist"),
    ).filter(F.col("edit_dist") <= 6)


@declare(
    "q_fn_string2",
    oracle="""
SELECT p_partkey,
       split_part(p_name, ' ', 1) AS first_word,
       split_part(p_name, ' ', 2) AS second_word,
       reverse(p_brand) AS brand_rev,
       translate(p_type, 'AEIOU', 'aeiou') AS type_xlate,
       repeat(left(p_name, 2), 3) AS rep2x3,
       position('a' IN p_name) AS a_pos,
       right(p_name, 3) AS last3
FROM part
WHERE p_partkey < 500
""",
    tags=("fn",),
)
def q_fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string family: split_part / reverse / translate / repeat /
    left / right / position — all 1:1 portable builtins (byte-exact on
    ASCII name columns)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.reverse("p_brand").alias("brand_rev"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_xlate"),
        F.repeat(F.left("p_name", F.lit(2)), 3).alias("rep2x3"),
        F.instr("p_name", "a").cast("long").alias("a_pos"),
        F.right("p_name", F.lit(3)).alias("last3"),
    )


@declare(
    "q_fn_regexp",
    oracle="""
SELECT doc_id,
       len(regexp_extract_all(text, '[a-z]+e')) AS n_e_words,
       COALESCE(array_to_string(list_sort(list_distinct(regexp_extract_all(text, '[a-z]+e'))), ','), '')
         AS e_words_csv,
       regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
       CAST(regexp_matches(text, 'batch batch') AS INT) AS has_double_batch
FROM documents
""",
    tags=("fn", "text"),
)
def q_fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family — extract_all / capture-group extract / match-test.

    Dialect portability is the point: both engines must agree on greedy
    backtracking ('[a-z]+e' over 'order' yields 'orde' — the + gives
    back one char so the literal e can match), on capture-group
    indexing, and on empty results: no-match extract is '' in BOTH
    engines, but DuckDB's array_to_string over an EMPTY match list is
    NULL where Spark's array_join is '' — the oracle COALESCEs to ''
    (r7 fuzz-harness finding; invisible on the fixed corpus, where
    every doc has an e-word). The pattern
    set deliberately stays inside the RE2-safe subset (no backrefs, no
    lookarounds — SURVEY §2.8 / clean_text's _PUNCT_SQUEEZE note), so
    the same query runs on any RE2 engine. extract_all's match ORDER is
    execution-defined only per-row (it is left-to-right in both
    engines), but the csv output still sorts for belt-and-braces
    determinism. Pure per-row scalar ops — no shuffle at all."""
    d = load_table(spark, sf_dir, "documents")
    # idx=0 = whole match (Spark defaults to capture group 1; DuckDB's
    # extract_all defaults to the whole match — pin them equal)
    ew = F.regexp_extract_all("text", F.lit("[a-z]+e"), 0)
    return d.select(
        "doc_id",
        F.size(ew).alias("n_e_words"),
        F.array_join(F.array_sort(F.array_distinct(ew)), ",").alias("e_words_csv"),
        F.regexp_extract("text", r"([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.col("text").rlike("batch batch").cast("int").alias("has_double_batch"),
    )
