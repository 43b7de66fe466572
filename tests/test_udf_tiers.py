"""Python-execution tier coverage beyond the declared queries (SURVEY
§2.11): python UDTF (Spark 4 ``@udtf``) and partition-wise Arrow UDTF
(``mapInArrow``). The other tiers (row UDF, pandas scalar/agg UDF,
applyInPandas, mapInPandas) are exercised by q_udf_* / q_udtf_grouped /
the multimodal feature extractor."""

from __future__ import annotations

import pyarrow as pa

from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from pipetree_spark.catalog import load_table


def test_python_udtf_lateral_expand(spark):
    """@udtf: one input row → N output rows (the UDTF contract), used
    laterally over a DataFrame."""

    @udtf(returnType="n: int, square: int")
    class Squares:
        def eval(self, start: int, end: int):
            for n in range(start, end + 1):
                yield n, n * n

    spark.udtf.register("squares", Squares)
    out = spark.sql(
        "SELECT t.id, s.n, s.square FROM range(3) t, "
        "LATERAL squares(0, CAST(t.id AS INT)) s"
    ).collect()
    got = {(r.id, r.n, r.square) for r in out}
    want = {(i, n, n * n) for i in range(3) for n in range(i + 1)}
    assert got == want


def test_map_in_arrow_batch_shapes(spark, sf_small):
    """mapInArrow: zero-copy Arrow batches in/out; the fastest partition-
    wise tier for columnar transforms that pandas would box."""
    l = load_table(spark, sf_small, "lineitem").select("l_orderkey", "l_quantity")

    def double_qty(batches):
        for batch in batches:
            t = pa.table(
                {
                    "l_orderkey": batch.column("l_orderkey"),
                    "qty2": pa.compute.multiply(batch.column("l_quantity"), 2.0),
                }
            )
            for out in t.to_batches():
                yield out

    got = l.mapInArrow(double_qty, schema="l_orderkey long, qty2 double")
    want = l.select("l_orderkey", (F.col("l_quantity") * 2).alias("qty2"))
    assert got.count() == want.count()
    a = {(r.l_orderkey, r.qty2) for r in got.collect()}
    b = {(r.l_orderkey, r.qty2) for r in want.collect()}
    assert a == b
