"""Graph-analytics queries (SURVEY §2.12b extension).

Connected components certifies the dedup-clustering engine from
llm_ops; this module certifies the *iterative rank propagation* side of
ops/graph.py over a relational-derived graph. The graph: distinct
customer→supplier trade edges from orders⋈lineitem, with node ids
disambiguated arithmetically (customer c → 2c, supplier s → 2s+1 —
custkey and suppkey ranges overlap numerically, so raw keys would alias
two real entities onto one node).

Reference note: /root/reference is empty (SURVEY §0); the reference
orchestrator has no graph surface — north-star extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipetree_spark.catalog import load_table
from pipetree_spark.ops.graph import pagerank_exact
from pipetree_spark.queries import declare

_SCALE = 10**12


def _pagerank_sql(iters: int = 3, scale: int = _SCALE) -> str:
    """Unrolled DuckDB twin of ops.graph.pagerank_exact over the
    customer→supplier trade graph. All-BIGINT arithmetic; ``//`` on
    positive BIGINTs truncates exactly like Spark's ``div``."""
    ctes = [
        "e AS (SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst"
        " FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)",
        "dang AS (SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM deg))",
        f"r0 AS (SELECT node, {scale} // (SELECT n FROM nn) AS rank FROM nodes)",
    ]
    prev = "r0"
    for k in range(1, iters + 1):
        ctes.append(
            f"inf{k} AS (SELECT e.dst AS node, SUM(r.rank // d.deg) AS inflow"
            f" FROM e JOIN deg d ON e.src = d.src"
            f" JOIN {prev} r ON e.src = r.node GROUP BY e.dst)"
        )
        ctes.append(
            f"dg{k} AS (SELECT COALESCE(SUM(r.rank), 0) AS dang_mass"
            f" FROM dang JOIN {prev} r ON dang.node = r.node)"
        )
        ctes.append(
            f"r{k} AS (SELECT nd.node,"
            f" ({15 * scale} // (100 * (SELECT n FROM nn)))"
            f" + (85 * (COALESCE(i.inflow, 0)"
            f" + ((SELECT dang_mass FROM dg{k}) // (SELECT n FROM nn)))) // 100 AS rank"
            f" FROM nodes nd LEFT JOIN inf{k} i ON nd.node = i.node)"
        )
        prev = f"r{k}"
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, CAST(rank AS BIGINT) AS rank FROM {prev}"
    )


@declare("q_graph_pagerank", oracle=_pagerank_sql(), tags=("graph",))
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 integer-exact iterations, ops.graph.pagerank_exact)
    over the customer→supplier trade graph: who are the systemically
    central suppliers when order volume routes rank through the
    bipartite purchase network? Suppliers have no out-edges, so the
    dangling-mass branch is structurally live every round, and
    customers receive teleport + dangling share only — both engine
    branches are exercised, not just the happy inflow path.

    Scale shape: one |edges| shuffle per iteration (edge side
    pre-partitioned once, rank side alone moves), a broadcast one-row
    dangling total, O(iters) rounds. No floats anywhere — the driver's
    value-hash re-proves bit-exactness every round it's sampled.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    edges = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
    )
    return pagerank_exact(edges, iters=3, scale=_SCALE)
