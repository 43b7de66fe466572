"""Retrieval-fusion operators (SURVEY §2.12, r13): ranked-list
construction and reciprocal-rank fusion — the standard combiner for
hybrid lexical + semantic search (RRF, Cormack/Clarke/Buettcher 2009:
``score(d) = Σ_lists 1/(k0 + rank_list(d))``, k0 = 60). A training-data
pipeline uses this to pick retrieval-quality documents: BM25 ranks the
lexical side (ops/text.py bm25_scores), cosine-over-embeddings ranks
the semantic side (ops/vector.py), and RRF fuses the two top-k lists
without any score normalization — ranks are scale-free, which is the
whole point of RRF over weighted score sums.

Determinism contract (the repo-wide rule): every rank is a row_number
over a TOTAL order (score DESC, key ASC) so float ties never
reorder; the fused score is a FIXED left-to-right two-plus-term IEEE
sum of exact 1/(k0+rank) int-derived doubles, so the DuckDB oracle
reproduces it bit-for-bit with no rounding step at all.

Scale shape: each input list is cut to top-n via orderBy().limit(n) —
Spark's TakeOrderedAndProject (per-partition heaps + driver merge of
n rows, never a full sort) — and ONLY the ≤n-row survivors see a
row_number window (bounded by construction, whitelisted in
tools/plan_audit.py like q_sort_multi). The fusion join runs over
≤ Σn rows regardless of corpus size, so the whole fuse stage is
corpus-size-independent; the corpus-sized work is entirely inside the
upstream scorers, which keep their own audited shapes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topn_ranked(
    df: DataFrame,
    score_col: str,
    key_col: str,
    n: int = 100,
    rank_col: str = "rnk",
) -> DataFrame:
    """Global top-n of a scored relation with a dense 1..n rank.

    (score DESC, key ASC) is a total order (key unique), so the cut
    and the ranks are deterministic under float score ties. The limit
    runs as TakeOrderedAndProject (no global sort, no single-reducer
    exchange); row_number then sees only the ≤n-row result — the
    bounded-window pattern the plan audit whitelists.

    Returns (key_col, score_col, rank_col) with rank_col as long.
    """
    order = [F.col(score_col).desc(), F.col(key_col).asc()]
    top = df.select(key_col, score_col).orderBy(*order).limit(n)
    w = Window.orderBy(*order)
    return top.withColumn(rank_col, F.row_number().over(w).cast("long"))


def rrf_score(rank_cols: list[Column | str], k0: int = 60) -> Column:
    """``Σ coalesce(1/(k0 + rank), 0)`` folded STRICTLY left-to-right,
    so the IEEE addition order is pinned and an oracle spelling the
    same chain matches bitwise. A NULL rank (key absent from that
    list) contributes exactly 0.0 — the standard RRF treatment of
    beyond-top-k documents."""
    ranks = [F.col(c) if isinstance(c, str) else c for c in rank_cols]
    terms = [
        F.coalesce(F.lit(1.0) / (F.lit(k0) + r), F.lit(0.0)) for r in ranks
    ]
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc


def rrf_fuse(
    rankings: list[tuple[str, DataFrame]],
    key_col: str,
    k0: int = 60,
    topk: int = 20,
    rank_col: str = "rnk",
) -> DataFrame:
    """Fuse named ranked lists by reciprocal-rank fusion.

    ``rankings`` is ``[(out_rank_name, df)]`` where each df carries
    (key_col, rank_col) — e.g. the output of :func:`topn_ranked` with
    the SAME ``rank_col`` (default "rnk"; the one name is both the
    input rank read and the fused output rank). The
    lists full-outer-join on the key (a document may appear in any
    subset of lists), the fused score folds in LIST ORDER (fixed IEEE
    sum), and the result is the global top-``topk`` by
    (rrf_score DESC, key ASC) with a fresh 1..topk rank.

    Returns (key_col, <out_rank_name>..., rrf_score, rank_col); the
    per-list rank columns stay NULL-able so "found by one side only"
    is an audited signal, never silently zero-filled.

    Scale: inputs are ≤n-row lists by construction, so the outer join
    and final window are constant-size regardless of corpus scale.
    """
    out_names = [n for n, _ in rankings]
    reserved = {"rrf_score", rank_col, key_col}
    clashes = [n for n in out_names if n in reserved]
    dups = [n for n in set(out_names) if out_names.count(n) > 1]
    if clashes or dups:
        # explicit raise, not assert: must survive python -O, and a
        # duplicate output name would otherwise surface later as an
        # opaque AMBIGUOUS_REFERENCE from the fused select
        raise ValueError(
            f"rrf_fuse: output rank names must be unique and disjoint "
            f"from rank_col/key_col/'rrf_score' (collisions: {clashes}, "
            f"duplicates: {dups})"
        )
    fused: DataFrame | None = None
    names: list[str] = []
    for name, r in rankings:
        side = r.select(F.col(key_col), F.col(rank_col).alias(name))
        names.append(name)
        fused = side if fused is None else fused.join(side, key_col, "full_outer")
    assert fused is not None, "rrf_fuse needs at least one ranking"
    scored = fused.select(
        key_col, *names, rrf_score(names, k0=k0).alias("rrf_score")
    )
    order = [F.col("rrf_score").desc(), F.col(key_col).asc()]
    top = scored.orderBy(*order).limit(topk)
    w = Window.orderBy(*order)
    return top.withColumn(rank_col, F.row_number().over(w).cast("long"))
