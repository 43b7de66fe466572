"""Graph operators for dedup clustering (SURVEY §2.12 extension).

Near-duplicate pairs (shingle-Jaccard / MinHash / SimHash) are edges;
turning them into *clusters* (pick one keeper per component) needs
connected components. This is the one genuinely iterative operator in
the engine: each iteration is pure DataFrame work (join + groupBy —
fully distributed, no driver data), and only the converged?-flag comes
back to the driver, mirroring Spark GraphX/GraphFrames' own driver-side
iteration loops.

Scale notes (100 TB discipline):
- Label propagation converges in O(max component diameter) rounds;
  near-dup graphs are overwhelmingly tiny star/clique components, so
  3-5 rounds are typical regardless of corpus size.
- ``localCheckpoint`` truncates the lineage each round — without it the
  plan doubles per iteration and the driver OOMs on plan bytes long
  before data is a problem.
- Each round shuffles |edges| + |nodes| rows on node id; no
  driver-side collection of labels ever happens.

Reference note: /root/reference is empty (SURVEY §0); the reference
orchestrator has no graph surface — north-star extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    eager_check: bool = True,
) -> DataFrame:
    """Min-label connected components over an undirected edge list.

    Returns ``(node, component)`` where ``component`` is the smallest
    node id reachable from ``node`` — a deterministic canonical label.

    Every node that appears in ``edges`` is labeled (isolated nodes
    aren't known to an edge list; callers union them in if needed).

    Raises ``RuntimeError`` if ``max_iter`` rounds pass while labels are
    still changing (component diameter > max_iter): silently returning
    half-propagated labels would split one real component into several.
    With ``eager_check=False`` there is no change tracking — the caller
    accepts fixed-round semantics and must size ``max_iter`` to the
    graph's diameter.
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)

    labels = sym.select("u").distinct().withColumn("component", F.col("u"))

    converged = not eager_check
    for _ in range(max_iter):
        # candidate label for u: min over (own label, neighbors' labels)
        nbr_labels = sym.join(
            labels.withColumnRenamed("u", "v"), on="v"
        ).select("u", "component")
        new_labels = (
            labels.unionByName(nbr_labels)
            .groupBy("u")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        if eager_check:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), on="u")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                converged = True
                break
        else:
            labels = new_labels
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in max_iter={max_iter} rounds "
            "(component diameter exceeds max_iter); raise max_iter"
        )
    return labels.select(F.col("u").alias("node"), "component")
