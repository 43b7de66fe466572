"""Attribute py4j RPCs to repo code sites (r16 diagnostic, guide §1).

Patches the gateway send_command to walk the Python stack and charge
each RPC to the innermost pipetree_spark/tools frame. Run one bench
metric and print the top sites — tells you WHERE the construction tax
is paid before you batch anything.

Usage: python tools/rpc_attrib.py q_dedup_semantic_ann
"""

from __future__ import annotations

import os
import sys
import traceback
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import BENCH_QUERIES  # noqa: E402
from pipetree_spark.queries import load_registry  # noqa: E402
from pipetree_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = str(Path(__file__).resolve().parent.parent)

sites: Counter = Counter()
enabled = False


def _attribute() -> None:
    if not enabled:
        return
    site = "<other>"
    for fr in reversed(traceback.extract_stack(limit=40)):
        if fr.filename.startswith(REPO) and "/tools/" not in fr.filename:
            site = f"{fr.filename[len(REPO) + 1:]}:{fr.lineno} {fr.name}"
            break
    sites[site] += 1


def install() -> None:
    # reuse profile_stages' process-wide send_command patch — one
    # implementation, attribution hooked through its on_rpc callback
    from tools.profile_stages import _RpcCounter

    _RpcCounter(on_rpc=_attribute).install()


def main() -> None:
    global enabled
    metric = sys.argv[1]
    qname = BENCH_QUERIES.get(metric, metric)
    registry = load_registry()
    spark = get_spark("pipetree-spark-rpc-attrib")
    fn = registry[qname].fn
    fn(spark, SF_DIR).collect()  # warm-up
    install()
    enabled = True
    df = fn(spark, SF_DIR)
    enabled = False
    n_cons = sum(sites.values())
    enabled = True
    df.collect()
    enabled = False
    print(f"\n=== {metric}: {n_cons} construction RPCs, "
          f"{sum(sites.values()) - n_cons} action RPCs; top sites:")
    for site, n in sites.most_common(30):
        print(f"  {n:6d}  {site}")


if __name__ == "__main__":
    main()
