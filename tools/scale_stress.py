"""Scale-stress harness: does each hot plan hold at 10× the data?

Synthesizes an sf1-equivalent dataset in /tmp by replicating the sf0.1
fact tables 10× with key offsets (dims stay fixed — at 100 TB dims are
still broadcast-sized), then times representative queries at both
scales. The verdict is the RUNTIME RATIO: a plan that holds scales
~linearly (ratio ≈ 10 at worst, much less while fixed JVM/scheduling
overhead dominates); a hidden quadratic or a skew collapse shows up as a
ratio ≫ 10. Results are recorded in SCALING.md.

Usage: python tools/scale_stress.py [--skip-gen]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from pipetree_spark.catalog import TABLES  # noqa: E402
from pipetree_spark.queries import load_registry  # noqa: E402
from pipetree_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/pipetree_spark_sfstress"
COPIES = 10

#: table → (unique key columns to offset, FK columns tied to another
#: replicated fact's key). Dims and the doc/embedding corpora replicate
#: with key offsets too; dims (region/nation/customer/supplier/part)
#: stay fixed.
REPLICATED = {
    "orders": {"offset": ["o_orderkey"], "fixed_fk": ["o_custkey"]},
    "lineitem": {"offset": ["l_orderkey"], "fixed_fk": ["l_partkey", "l_suppkey"]},
    "events": {"offset": ["event_id"], "fixed_fk": ["user_id"]},
    "documents": {"offset": ["doc_id"], "fixed_fk": []},
    "embeddings": {"offset": ["vec_id"], "fixed_fk": []},
}

QUERIES = [
    "q_agg_groupby",       # scan+filter+group (flagship)
    "q_join_3way",         # fact⋈fact⋈dims + agg pushdown
    "q_topk_global",       # TakeOrderedAndProject
    "q_agg_distinct_global",
    "q_stream_tumbling",   # windowed event rollup
    "q_dedup_exact",       # hash dedup over documents
    "q_dedup_near",        # inverted-index Jaccard pairs
    "q_vec_cosine_knn",    # brute-force kNN (broadcast query side)
    "q_text_tfidf",        # explode + two shuffles + window
    "q_tpch_q5",           # six-way join
]


def generate(spark) -> None:
    for t in TABLES:
        src = spark.read.parquet(f"{SRC}/{t}.parquet")
        if t in REPLICATED:
            spec = REPLICATED[t]
            max_keys = {
                c: src.agg(F.max(c)).collect()[0][0] + 1 for c in spec["offset"]
            }
            parts = []
            for i in range(COPIES):
                df = src
                for c, mk in max_keys.items():
                    df = df.withColumn(c, F.col(c) + F.lit(i * mk))
                parts.append(df)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        else:
            out = src
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(f"  wrote {t}", flush=True)


def bench(spark, registry, sf_dir: str) -> dict[str, float]:
    out = {}
    for name in QUERIES:
        fn = registry[name].fn
        fn(spark, sf_dir).count()  # warm-up
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        out[name] = best
        print(f"  {name}: {best:.2f}s", flush=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()
    spark = get_spark("pipetree-spark-scale-stress")
    if not args.skip_gen:
        print("generating 10x dataset ...", flush=True)
        generate(spark)
    registry = load_registry()
    print(f"timing at sf0.1 ({SRC}):", flush=True)
    base = bench(spark, registry, SRC)
    print(f"timing at 10x ({DST}):", flush=True)
    big = bench(spark, registry, DST)
    print("\nratios (10x data / 1x data; linear-or-better target ≤ 10):")
    for name in QUERIES:
        print(f"  {name:24s} {base[name]:7.2f}s -> {big[name]:7.2f}s  ratio {big[name]/base[name]:5.2f}")


if __name__ == "__main__":
    main()
