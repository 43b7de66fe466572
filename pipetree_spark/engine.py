"""Engine facade — the user-facing entry object (SURVEY §3.2).

Two query entry points, both pure Catalyst paths:

- ``Engine.table(name)``: DataFrame builder API over the catalog.
- ``Engine.sql(query)``: Spark SQL against auto-registered temp views.

Plus ``explain(df)`` passthrough so users can inspect the optimized /
physical plan (predicate pushdown, join strategy, AQE re-plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pipetree_spark import catalog
from pipetree_spark.session import apply_runtime_confs, get_spark


class Engine:
    def __init__(self, spark: SparkSession | None = None, sf_dir: str | None = None):
        self.spark = apply_runtime_confs(spark) if spark is not None else get_spark()
        self.sf_dir = sf_dir or catalog.DEFAULT_SF_DIR
        self._views_registered_for: str | None = None

    # -- data access ------------------------------------------------------
    def table(self, name: str) -> DataFrame:
        return catalog.load_table(self.spark, self.sf_dir, name)

    def tables(self) -> dict[str, DataFrame]:
        return catalog.load_all(self.spark, self.sf_dir)

    def sql(self, query: str) -> DataFrame:
        if self._views_registered_for != self.sf_dir:
            catalog.register_views(self.spark, self.sf_dir)
            self._views_registered_for = self.sf_dir
        return self.spark.sql(query)

    # -- plan inspection --------------------------------------------------
    @staticmethod
    def explain(df: DataFrame, mode: str = "formatted") -> None:
        df.explain(mode)
