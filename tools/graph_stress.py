"""Graph-op stress on SYNTHETIC constant-degree random graphs.

The replicated-fact stress (tools/scale_stress.py) densifies the
co-purchase graph (orders replicate onto fixed customers/parts), which
is NOT how a real corpus grows — at 100 TB both nodes and edges scale
while average degree stays roughly constant. This harness generates
deterministic uniform random graphs at constant degree and times the
iterative graph ops across two orders of magnitude of |edges|, so the
recorded ratios measure the honest regime: wedge work for triangles
should grow ~linearly in m (degree-ordered orientation bound), BFS and
SSSP with |frontier|.

Edges are hash-derived (xxhash64 of the edge index), so the graph is
identical across runs and engines — no RNG state anywhere.

Usage: python tools/graph_stress.py [--degree 20] [--sizes 10000 100000]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from pipetree_spark.ops.graph import bfs_khop, sssp_khop, triangle_counts  # noqa: E402
from pipetree_spark.session import get_spark  # noqa: E402


def random_edges(spark, n_nodes: int, degree: int):
    """m = n_nodes * degree / 2 undirected edges, endpoints from
    xxhash64 over the edge index — deterministic, uniform, self-loops
    and dups left in (the ops canonicalize)."""
    m = n_nodes * degree // 2
    return (
        spark.range(m)
        .select(
            F.pmod(F.xxhash64(F.col("id") * 2 + 1), F.lit(n_nodes)).alias("src"),
            F.pmod(F.xxhash64(F.col("id") * 2 + 2), F.lit(n_nodes)).alias("dst"),
        )
        .localCheckpoint(eager=True)
    )


def time_op(fn) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = fn().count()
    return time.perf_counter() - t0, n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--degree", type=int, default=20)
    ap.add_argument("--sizes", type=int, nargs="+", default=[10_000, 100_000])
    args = ap.parse_args()

    spark = get_spark("graph-stress")
    results: dict[int, dict[str, float]] = {}
    for n in args.sizes:
        e = random_edges(spark, n, args.degree)
        srcs = spark.range(max(1, n // 1000)).select(
            F.pmod(F.xxhash64("id"), F.lit(n)).alias("node")
        )
        ew = e.withColumn("w", F.pmod(F.xxhash64("src", "dst"), F.lit(100)) + 1)
        rows: dict[str, float] = {}
        for name, fn in [
            ("triangle_counts", lambda: triangle_counts(e)),
            ("bfs_khop(k=3)", lambda: bfs_khop(e, srcs, k=3)),
            ("sssp_khop(k=3)", lambda: sssp_khop(ew, srcs, k=3)),
        ]:
            fn().count()  # warm-up
            best, out_rows = float("inf"), 0
            for _ in range(2):
                t, out_rows = time_op(fn)
                best = min(best, t)
            rows[name] = best
            print(f"  n={n:>8} m~{n * args.degree // 2:>9} {name:<18} "
                  f"{best:6.2f}s  ({out_rows} rows)", flush=True)
        results[n] = rows
    if len(args.sizes) >= 2:
        lo, hi = args.sizes[0], args.sizes[-1]
        scale = hi / lo
        print(f"\nratios at {scale:.0f}x nodes+edges (constant degree "
              f"{args.degree}; linear target ~{scale:.0f}):")
        for name in results[lo]:
            r = results[hi][name] / results[lo][name]
            print(f"  {name:<18} {results[lo][name]:6.2f}s -> "
                  f"{results[hi][name]:6.2f}s  ratio {r:5.2f}")


if __name__ == "__main__":
    main()
