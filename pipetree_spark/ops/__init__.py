"""Reusable operator builders — the engine's API layer.

Design stance (SURVEY §4.2): for operators Spark already has
(filter/project/join/groupBy/window/...), the DataFrame API *is* the
engine API — wrapping it 1:1 would only obscure Catalyst. This package
therefore contains only the operators Spark **lacks** or where a
scale-discipline recipe is worth encoding once:

- ``relational``: as-of join, bounded range join, top-k per group,
  skew salting helpers.
- ``text``: shingling, fingerprints, exact/near dedup, language/quality
  heuristics.
- ``vector``: cosine kNN (brute force + LSH/banded scale path),
  centroids, norms.
- ``mm``: multimodal binary-column plumbing (decode stubs, batched
  mapInPandas pipelines).
- ``streaming``: watermarked windows, stateful dedup, session recipes.
"""
