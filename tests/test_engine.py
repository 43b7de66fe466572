"""Engine facade tests (SURVEY §3.2): both entry points, plan
inspection, and the runtime-conf contract on a vanilla session."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipetree_spark.engine import Engine


def test_table_builder_path(spark, sf_small):
    eng = Engine(spark, sf_dir=sf_small)
    df = eng.table("lineitem").filter(F.col("l_quantity") > 40).groupBy("l_returnflag").count()
    rows = {r["l_returnflag"]: r["count"] for r in df.collect()}
    assert set(rows) == {"A", "N", "R"} and all(v > 0 for v in rows.values())


def test_sql_entry_over_registered_views(spark, sf_small):
    eng = Engine(spark, sf_dir=sf_small)
    out = eng.sql(
        "SELECT r_name, COUNT(*) AS n FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
    ).collect()
    assert sum(r["n"] for r in out) == 25


def test_sql_reads_events_through_conversion(spark, sf_small):
    # events is the ns-timestamp table; the view must expose converted ts
    eng = Engine(spark, sf_dir=sf_small)
    row = eng.sql("SELECT MIN(ts) AS mn, MAX(ts) AS mx, COUNT(*) AS n FROM events").collect()[0]
    assert row["n"] == 1000
    assert row["mn"].year == 2024 and row["mx"].year == 2024


def test_explain_passthrough_smoke(spark, sf_small, capsys):
    eng = Engine(spark, sf_dir=sf_small)
    eng.explain(eng.table("orders").filter(F.col("o_totalprice") > 0))
    out = capsys.readouterr().out
    assert "Physical Plan" in out


def test_parse_byte_conf_unit_suffixes():
    """spark.sql.autoBroadcastJoinThreshold accepts '10MB'-style values;
    int() on those crashed q_join_3way's plan pick (r2 ADVICE). The
    parser must handle plain ints, k/m/g/t suffixes (±'b',
    case-insensitive), and fall back to -1 (broadcast disabled → the
    scale-safe aggregation-pushdown branch) on garbage."""
    from pipetree_spark.queries.joins import _parse_byte_conf

    assert _parse_byte_conf("10485760") == 10485760
    assert _parse_byte_conf("-1") == -1
    assert _parse_byte_conf("10MB") == 10 * 1024**2
    assert _parse_byte_conf("10m") == 10 * 1024**2
    assert _parse_byte_conf("512K") == 512 * 1024
    assert _parse_byte_conf("1g") == 1024**3
    assert _parse_byte_conf("2tb") == 2 * 1024**4
    assert _parse_byte_conf("  64kb ") == 64 * 1024
    assert _parse_byte_conf("nonsense") == -1
