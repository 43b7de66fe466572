"""Sampling operators: deterministic hash sampling + seeded RNG tiers.

Training-data pipelines sample constantly (eval splits, ablations,
decontamination spot-checks). Two tiers:

- **Hash sampling** (``q_sample_hash``): keyed md5 — deterministic,
  engine-portable, cluster-size-invariant, and stable under re-runs and
  repartitioning, which is what you want for reproducible 100 TB splits.
  Oracle-exact (both engines compute identical md5 hex).
- **Seeded RNG sampling** (``q_sample_bernoulli``, ``q_sample_strat``):
  Spark's native ``sample``/``sampleBy`` — per-partition XOR-shift
  streams, deterministic for a fixed seed + partitioning but NOT
  portable to other engines → declared rows-only (SURVEY §2.0), with
  the output shaped as a 1-row/3-row summary so the row count itself is
  partition-independent.

Reference note: /root/reference is empty (SURVEY §0); the reference is
an ML-pipeline orchestrator with no sampling surface — extension ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipetree_spark.catalog import load_table
from pipetree_spark.exact import dsum, dsum_sql
from pipetree_spark.queries import declare


@declare(
    "q_sample_hash",
    oracle=f"""
SELECT COUNT(*) AS n_sampled,
       COUNT(DISTINCT o_custkey) AS n_custs,
       {dsum_sql('o_totalprice')} AS sum_total
FROM orders
WHERE SUBSTR(MD5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
""",
    tags=("sampling",),
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1/16 sample keyed on md5(orderkey).

    The predicate is a pure per-row expression → pushes into the scan,
    no shuffle, no RNG state; the same rows are selected on 1 executor
    or 1000, today and in every rerun — the reproducibility property
    RNG sampling can't give across engines/cluster layouts.
    """
    o = load_table(spark, sf_dir, "orders")
    sampled = o.filter(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1) == "0")
    return sampled.agg(
        F.count("*").alias("n_sampled"),
        F.count_distinct("o_custkey").alias("n_custs"),
        dsum("o_totalprice").alias("sum_total"),
    )


@declare("q_sample_bernoulli", oracle=None, tags=("sampling", "approx"))
def q_sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample (Spark-native, rows-only check).

    ``df.sample`` draws per-partition pseudo-random streams — fast and
    unbiased but partitioning-dependent, so no cross-engine oracle
    exists. Output is a single summary row (count + bounds) so the
    declared result shape is stable regardless of which rows land."""
    l = load_table(spark, sf_dir, "lineitem")
    s = l.sample(fraction=0.1, seed=42)
    return s.agg(
        F.count("*").alias("n_sampled"),
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"),
    )


@declare("q_sample_strat", oracle=None, tags=("sampling", "approx"))
def q_sample_strat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded stratified sample: per-stratum fractions via ``sampleBy``
    on l_returnflag (rows-only check — same RNG caveat as Bernoulli).
    Emits per-stratum achieved counts, the quantity a pipeline monitors
    to confirm stratum balance."""
    l = load_table(spark, sf_dir, "lineitem")
    s = l.sampleBy("l_returnflag", fractions={"A": 0.2, "N": 0.05, "R": 0.1}, seed=42)
    return s.groupBy("l_returnflag").agg(F.count("*").alias("n_sampled"))


#: Training-mixture keep-rates per language stratum (permille).
#: Downsample the over-represented head (en), keep the tails — the
#: data-mixing step of corpus construction, with rates AS DATA so a
#: real pipeline can swap the dim without a code change.
MIXTURE_PERMILLE: dict[str, int] = {"en": 300, "zh": 800, "es": 600, "de": 600, "fr": 900}


@declare(
    "q_sample_strat_hash",
    oracle=f"""
WITH rates(lang, permille) AS (
  VALUES {', '.join(f"('{k}', {v})" for k, v in MIXTURE_PERMILLE.items())}
)
SELECT d.doc_id, d.lang
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000
      < r.permille
""",
    tags=("sampling", "text"),
)
def q_sample_strat_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified mixture sampling (the oracle-exact twin
    of seeded ``q_sample_strat``): each language keeps ``permille``/1000
    of its documents, selected by a 60-bit md5 bucket of the doc key —
    reproducible across engines, reruns, and cluster layouts, and
    NESTED (a 30% sample is a strict subset of an 80% sample of the
    same stratum), which RNG sampling cannot offer.

    Scale shape: the rates dim joins broadcast (rates are data, not
    code); the bucket predicate is a pure per-row expression evaluated
    map-side — one broadcast join, zero shuffles, no RNG state."""
    d = load_table(spark, sf_dir, "documents")
    rates = spark.createDataFrame(
        list(MIXTURE_PERMILLE.items()), "lang string, permille int"
    ).coalesce(1)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast("long")
        % 1000
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(bucket < F.col("permille"))
        .select("doc_id", "lang")
    )
