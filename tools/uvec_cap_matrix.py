"""Ad-hoc clean-machine matrix: BLAS pair mode with and without cell_cap
tiling on the 200k-unique-vector stress corpus, interleaved reps so
machine drift cancels. Decides the harness default for scale_stress.py
and the SCALING.md record. Not part of the test suite."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from tools.scale_stress import build_jittered_corpus, get_spark
from pipetree_spark.ops import vector as VX


def run_once(df, cents, n, copies, cap):
    t0 = time.perf_counter()
    res = VX.semantic_dedup_ann(
        df, threshold=0.9, n_clusters="auto", n_probe="auto",
        centroids=cents, assign_via="arrow", exact_pairs=False, cell_cap=cap,
    ).localCheckpoint(eager=True)
    assert res.count() == n
    dt = time.perf_counter() - t0
    planted = res.withColumn("planted", (F.col("vec_id") / copies).cast("long"))
    co = planted.groupBy("planted", "component").count()
    num = co.select(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("s")).collect()[0]["s"]
    recall = float(num) / (n // copies * copies * (copies - 1) / 2)
    res.unpersist()
    return dt, recall


def main():
    copies = 100
    spark = get_spark("pipetree-spark-uvec-cap-matrix")
    df = build_jittered_corpus(spark, copies=copies)
    n = df.count()
    cents = VX.ivf_train(
        df.sample(0.05, seed=3), "embedding", "vec_id",
        n_clusters=max(8, int(n ** 0.5) + 1), iters=2,
    ).localCheckpoint(eager=True)
    print(f"corpus n={n}, interleaved reps (nocap, cap=4096) x 2:", flush=True)
    for rep in range(2):
        for cap in (None, 4096):
            dt, recall = run_once(df, cents, n, copies, cap)
            print(f"  rep{rep} cap={cap}: dedup {dt:.1f}s recall {recall:.3f}", flush=True)


if __name__ == "__main__":
    main()
