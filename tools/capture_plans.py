"""Dump `.explain("formatted")` for every bench-tracked query (guide §1 / §7.2).

Writes plans/r15/<metric>_<suffix>.txt for each entry of bench.BENCH_QUERIES
so before/after plan claims in OPTIMIZATION_r15.md are checkable without
running Spark.

Usage:
    python tools/capture_plans.py before          # plans/r15/<metric>_before.txt
    python tools/capture_plans.py after           # plans/r15/<metric>_after.txt
    python tools/capture_plans.py after q_a q_b   # only these metrics
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import BENCH_QUERIES  # noqa: E402
from pipetree_spark.queries import load_registry  # noqa: E402
from pipetree_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def explain_formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r16"
    out_dir.mkdir(parents=True, exist_ok=True)
    registry = load_registry()
    spark = get_spark("pipetree-spark-plans")
    for metric, qname in BENCH_QUERIES.items():
        if only and metric not in only and qname not in only:
            continue
        try:
            df = registry[qname].fn(spark, SF_DIR)
            text = explain_formatted(df)
        except Exception as exc:  # pragma: no cover - diagnostic tool
            text = f"ERROR: {exc}"
        (out_dir / f"{metric}_{suffix}.txt").write_text(
            f"# {metric} -> {qname} @ {SF_DIR} ({suffix})\n{text}"
        )
        print(f"wrote {metric}_{suffix}.txt")


if __name__ == "__main__":
    main()
