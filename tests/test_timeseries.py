"""Planted-fixture tests for the batch time-series ops (sessionize /
rolling-z anomaly) — the oracle-parity gate proves DuckDB agreement on
real testdata; these pin the SEMANTICS on corpora with known structure."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # int64 ns — the testdata encoding
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

_T0 = 1704067200  # 2024-01-01 00:00:00 UTC, epoch seconds


def _write_events(spark, path: str, rows):
    """rows: (event_id, sec_offset, user_id, value)."""
    data = [
        (eid, (_T0 + off) * 10**9, uid, "click", val, "{}")
        for eid, off, uid, val in rows
    ]
    spark.createDataFrame(data, _EVENT_SCHEMA).coalesce(1).write.parquet(
        f"{path}/events.parquet"
    )


def test_sessionize_splits_on_gap_and_aggregates(spark, tmp_path):
    from pipetree_spark.queries.timeseries import q_ts_sessionize

    rows = [
        # user 1: two sessions — gap of 1940 s between events 2 and 3
        (1, 0, 1, 5.0),
        (2, 60, 1, 7.0),
        (3, 2000, 1, 1.0),
        (4, 2060, 1, 2.0),
        # user 2: a single-event session
        (5, 0, 2, 9.0),
        # boundary: exactly 1800 s is NOT a new session (> not >=)
        (6, 3860, 1, 4.0),
    ]
    _write_events(spark, str(tmp_path), rows)
    got = {
        (r.user_id, r.session_idx): r
        for r in q_ts_sessionize(spark, str(tmp_path)).collect()
    }
    assert set(got) == {(1, 1), (1, 2), (2, 1)}
    s1 = got[(1, 1)]
    assert (s1.n_events, s1.sum_value) == (2, 12.0)
    assert (s1.session_start_sec, s1.session_end_sec) == (_T0, _T0 + 60)
    # session 2 absorbs event 6: 2060 → 3860 is exactly 1800 s
    s2 = got[(1, 2)]
    assert (s2.n_events, s2.sum_value) == (3, 7.0)
    assert s2.session_end_sec == _T0 + 3860
    assert got[(2, 1)].n_events == 1


def test_anomaly_flags_spike_against_trailing_window(spark, tmp_path):
    from pipetree_spark.queries.timeseries import q_ts_anomaly

    # user 7: 20 alternating-baseline events (mean 11, sample var 20/19),
    # then one spike. Only the spike has a full 20-event trailing frame
    # AND a z beyond 3.
    rows = [(i, 60 * i, 7, 10.0 if i % 2 else 12.0) for i in range(20)]
    rows.append((20, 1200, 7, 100.0))
    # user 8: constant values → zero variance → never flagged
    rows += [(100 + i, 60 * i, 8, 5.0) for i in range(25)]
    _write_events(spark, str(tmp_path), rows)
    got = q_ts_anomaly(spark, str(tmp_path)).collect()
    assert [(r.event_id, r.user_id) for r in got] == [(20, 7)]
    r = got[0]
    assert r.baseline_mean == pytest.approx(11.0, abs=0)
    assert r.z == pytest.approx((100.0 - 11.0) / math.sqrt(20.0 / 19.0), rel=1e-12)


def test_ewma_hand_computed_and_negative_safe(spark, sf_small):
    """r12 EWMA: hand-checked fold (r0 = x0, r ← ⌊(3r+x)/4⌋) including
    a negative value, where floor ≠ truncate — the divergence the
    power-of-two floor formulation exists to avoid."""
    import datetime

    from pyspark.sql import functions as F
    from pipetree_spark.queries.timeseries import q_ts_ewma  # noqa: F401
    from pipetree_spark.queries import load_registry
    import os
    import tempfile

    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        (1, t0, 1, "a", 4.0, "{}"),                               # x=40000
        (1, t0 + datetime.timedelta(minutes=1), 2, "a", 0.0, "{}"),   # x=0
        (1, t0 + datetime.timedelta(minutes=2), 3, "a", 8.0, "{}"),   # x=80000
        (2, t0, 4, "a", -0.0001, "{}"),                           # x=-1
        (2, t0 + datetime.timedelta(minutes=1), 5, "a", 0.0, "{}"),   # x=0
    ]
    tmp = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string, value double, props string"
    ).select("event_id", "ts", "user_id", "event_type", "value", "props") \
        .write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
    out = {r.user_id: (r.n_events, r.last_x4, r.ewma4)
           for r in load_registry()["q_ts_ewma"].fn(spark, tmp).collect()}
    # user 1: r0=40000; r1=floor(120000/4)=30000; r2=floor(170000/4)=42500
    assert out[1] == (3, 80000, 42500)
    # user 2: r0=-1; r1=floor(-3/4)=-1 (floor, NOT truncate-to-zero 0)
    assert out[2] == (2, 0, -1)
