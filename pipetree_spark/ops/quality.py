"""Declarative data-quality expectations (mini expectation suite).

A production ingest gates every batch on a rule set: nulls, ranges,
key uniqueness, referential integrity. This module evaluates such a
suite ENGINE-SIDE and returns one violations row per rule —
``(rule, kind, n_violations)`` — never collecting data to the driver.

Execution shape (the scale design):

- all ROW-LOCAL rules (not_null / in_range / satisfies) compile into a
  SINGLE aggregate pass — one ``sum(violated::long)`` per rule riding
  one map-side-combined scan, so checking 50 row rules costs one job;
- ``unique`` is one groupBy(count>1) on the key columns;
- ``foreign_key`` is one left-anti join against the (broadcastable)
  dimension's key set;
- results union into one small frame; a gate is then
  ``violations.filter(n_violations > 0).isEmpty()``.

Reference note: the reference (pipetree/pipetree — /root/reference is
empty, SURVEY §0) has no data-quality surface; north-star extension
[SURVEY §2.0 tag E].
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    name: str
    kind: str  # not_null | in_range | satisfies | unique | foreign_key
    violated: Column | None = None  # row-local rules: TRUE where violated
    cols: tuple[str, ...] = field(default_factory=tuple)  # unique
    dim: DataFrame | None = None  # foreign_key
    dim_col: str | None = None
    col: str | None = None


def not_null(col: str, name: str | None = None) -> Rule:
    return Rule(name or f"not_null:{col}", "not_null", violated=F.col(col).isNull())


def in_range(col: str, lo, hi, name: str | None = None) -> Rule:
    c = F.col(col)
    return Rule(
        name or f"in_range:{col}:[{lo},{hi}]",
        "in_range",
        violated=c.isNull() | (c < lo) | (c > hi),
    )


def satisfies(name: str, predicate: Column) -> Rule:
    """Custom predicate that must hold per row; violated where NOT
    predicate (NULL predicate counts as violated — unknown fails)."""
    return Rule(name, "satisfies", violated=~F.coalesce(predicate, F.lit(False)))


def unique(*cols: str, name: str | None = None) -> Rule:
    return Rule(name or f"unique:{','.join(cols)}", "unique", cols=tuple(cols))


def foreign_key(col: str, dim: DataFrame, dim_col: str, name: str | None = None) -> Rule:
    return Rule(
        name or f"fk:{col}->{dim_col}", "foreign_key", col=col, dim=dim, dim_col=dim_col
    )


def evaluate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate the suite; returns (rule, kind, n_violations) — one row
    per rule, deterministic order by rule name downstream of the union.
    Row-local rules share ONE aggregate pass; set rules get their
    minimal dedicated shape each."""
    if not rules:
        raise ValueError("evaluate() needs at least one rule")
    unknown = [r.name for r in rules if r.violated is None and r.kind not in ("unique", "foreign_key")]
    if unknown:
        raise ValueError(f"rules with unrecognized kind and no predicate: {unknown}")
    parts: list[DataFrame] = []

    row_rules = [r for r in rules if r.violated is not None]
    if row_rules:
        aggs = [
            F.sum(r.violated.cast("long")).alias(f"__v{i}")
            for i, r in enumerate(row_rules)
        ]
        wide = df.agg(*aggs)
        # one aggregate row → unpivot via an inline struct array; rule
        # names ride as literal COLUMNS (never interpolated into SQL
        # text, so a quote in a name can't break or inject anything)
        triples = F.array(
            *[
                F.struct(
                    F.lit(r.name).alias("rule"),
                    F.lit(r.kind).alias("kind"),
                    F.col(f"__v{i}").alias("n_violations"),
                )
                for i, r in enumerate(row_rules)
            ]
        )
        parts.append(
            wide.select(F.explode(triples).alias("__z")).select("__z.*")
        )

    for r in rules:
        if r.kind == "unique":
            dup = (
                df.groupBy(*r.cols)
                .agg(F.count("*").alias("__n"))
                .filter(F.col("__n") > 1)
                .agg(F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias("n"))
            )
            parts.append(
                dup.select(
                    F.lit(r.name).alias("rule"),
                    F.lit(r.kind).alias("kind"),
                    F.col("n").cast("long").alias("n_violations"),
                )
            )
        elif r.kind == "foreign_key":
            orphans = df.select(F.col(r.col)).filter(F.col(r.col).isNotNull()).join(
                F.broadcast(r.dim.select(F.col(r.dim_col).alias(r.col)).distinct()),
                r.col,
                "left_anti",
            )
            parts.append(
                orphans.agg(F.count("*").alias("n")).select(
                    F.lit(r.name).alias("rule"),
                    F.lit(r.kind).alias("kind"),
                    F.col("n").cast("long").alias("n_violations"),
                )
            )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def gate(df: DataFrame, rules: list[Rule]) -> None:
    """Raise ValueError listing every violated rule (the ingest-job
    gate). One action over the small violations frame."""
    bad = [
        (r.rule, r.n_violations)
        for r in evaluate(df, rules).filter(F.col("n_violations") > 0).collect()
    ]
    if bad:
        raise ValueError(f"expectation violations: {bad}")
