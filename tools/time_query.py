"""Isolated best-of-N wall timing for a subset of bench metrics (guide §1).

Same protocol as bench.py (fresh DataFrame per rep, full .collect(), warm-up
first) but only for the metrics named on the command line, so a single
query's before/after can be measured without paying for the whole bench.
Not the official record — BENCH_rNN stays bench.py's output.

Usage:
    python tools/time_query.py q_graph_pagerank [q_dedup_cc ...]
    TIME_QUERY_RUNS=7 python tools/time_query.py q_dedup_cc
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import BENCH_QUERIES  # noqa: E402
from pipetree_spark.queries import load_registry  # noqa: E402
from pipetree_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("TIME_QUERY_RUNS", "5"))


def main() -> None:
    metrics = sys.argv[1:]
    if not metrics:
        print(__doc__)
        return
    registry = load_registry()
    spark = get_spark("pipetree-spark-time-query")
    out = {}
    for m in metrics:
        qname = BENCH_QUERIES.get(m, m)
        fn = registry[qname].fn
        spark.sparkContext.setJobDescription(f"time_query warmup {m}")
        fn(spark, SF_DIR).collect()
        times = []
        for i in range(RUNS):
            spark.sparkContext.setJobDescription(f"time_query {m} rep{i}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            times.append(time.perf_counter() - t0)
        times.sort()
        out[m] = {
            "best": round(times[0], 4),
            "median": round(times[len(times) // 2], 4),
            "spread": round(times[-1] - times[0], 4),
            "runs": RUNS,
        }
        print(f"# {m}: best={out[m]['best']} median={out[m]['median']} spread={out[m]['spread']}", file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "loadavg": list(os.getloadavg()), "results": out}))


if __name__ == "__main__":
    main()
