"""Tests for timeseries.zscore_anomalies — trailing z-score flags."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as Ty

from etl_cortex_spark.operators.timeseries import zscore_anomalies

_SCHEMA = Ty.StructType(
    [
        Ty.StructField("event_type", Ty.StringType()),
        Ty.StructField("day", Ty.DateType()),
        Ty.StructField("n", Ty.LongType()),
    ]
)


def _daily(spark, values, key="a"):
    rows = [
        (key, dt.date(2024, 1, 1) + dt.timedelta(days=i), int(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def test_spike_flagged_stable_days_not(spark):
    # 10 quiet days with mild jitter, then a 10x spike
    values = [100, 101, 99, 100, 102, 98, 100, 101, 99, 100, 1000]
    out = {r.day.day: r for r in zscore_anomalies(_daily(spark, values)).collect()}
    assert out[11].is_anomaly and out[11].z > 2
    for d in range(8, 11):  # days with enough history, pre-spike
        assert not out[d].is_anomaly


def test_insufficient_history_never_flagged(spark):
    values = [1, 100, 1, 100, 1]  # wild, but < min_history days
    rows = zscore_anomalies(_daily(spark, values)).collect()
    assert all(r.z is None and not r.is_anomaly for r in rows)


def test_zero_variance_history_not_flagged(spark):
    values = [5] * 10 + [50]
    rows = {r.day.day: r for r in zscore_anomalies(_daily(spark, values)).collect()}
    # history is constant → std = 0 → NULL z by contract, not a crash
    assert rows[11].z is None and not rows[11].is_anomaly


def test_current_day_excluded_from_window(spark):
    # if the spike day were included in its own window it would inflate
    # std and deflate its z; with exclusion z is huge
    values = [10, 10, 11, 9, 10, 10, 11, 9, 10, 10, 500]
    rows = {r.day.day: r for r in zscore_anomalies(_daily(spark, values)).collect()}
    assert rows[11].z > 100


def test_keys_are_independent(spark):
    # 'a' spikes on day 11; 'b' sits at 1000 constantly. If the window
    # leaked across keys, b's level would either mask a's spike or get
    # flagged itself.
    a = _daily(spark, [100, 101, 99, 100, 102, 98, 100, 101, 99, 100, 1000], key="a")
    b = _daily(spark, [1000] * 11, key="b")
    rows = zscore_anomalies(a.unionByName(b)).collect()
    flagged = {(r.event_type, r.day.day) for r in rows if r.is_anomaly}
    assert flagged == {("a", 11)}
