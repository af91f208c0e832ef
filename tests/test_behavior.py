"""Tests for operators/behavior.py — strict funnel ordering and the
cohort-retention matrix invariants."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as Ty

from etl_cortex_spark.operators.behavior import cohort_retention, funnel_counts

_SCHEMA = Ty.StructType(
    [
        Ty.StructField("user_id", Ty.LongType()),
        Ty.StructField("event_type", Ty.StringType()),
        Ty.StructField("ts", Ty.TimestampType()),
    ]
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, dt.datetime(2024, 1, d, h)) for u, t, d, h in rows], _SCHEMA
    )


def test_funnel_requires_order(spark):
    """A user whose click precedes their signup must NOT reach step 2."""
    df = _ev(
        spark,
        [
            # user 1: proper order — counts at every step
            (1, "signup", 1, 0),
            (1, "click", 1, 1),
            (1, "purchase", 1, 2),
            # user 2: click BEFORE signup, purchase after — stops at step 1
            (2, "click", 1, 0),
            (2, "signup", 1, 1),
            (2, "purchase", 1, 2),
            # user 3: signup only
            (3, "signup", 1, 0),
        ],
    )
    out = {r.step: r.n_users for r in funnel_counts(df, ["signup", "click", "purchase"]).collect()}
    assert out == {"signup": 3, "click": 1, "purchase": 1}


def test_funnel_uses_first_qualifying_event(spark):
    """A later re-click after signup counts even when an earlier
    pre-signup click exists."""
    df = _ev(
        spark,
        [
            (1, "click", 1, 0),
            (1, "signup", 1, 1),
            (1, "click", 1, 2),  # qualifies
        ],
    )
    out = {r.step: r.n_users for r in funnel_counts(df, ["signup", "click"]).collect()}
    assert out == {"signup": 1, "click": 1}


def test_funnel_conv_is_vs_first_step(spark):
    df = _ev(
        spark,
        [(u, "signup", 1, 0) for u in range(4)] + [(0, "click", 1, 1), (1, "click", 1, 1)],
    )
    rows = {r.step: r for r in funnel_counts(df, ["signup", "click"]).collect()}
    assert rows["signup"].conv == 1.0
    assert rows["click"].conv == 0.5


def test_cohort_offset_zero_equals_cohort_size(spark):
    """Every user is active in their own first week, so offset 0 has
    n_active == cohort_size."""
    df = _ev(
        spark,
        [
            (1, "view", 1, 0),
            (2, "view", 1, 5),
            (1, "view", 8, 0),  # next week: only user 1 returns
            (3, "view", 8, 0),  # new cohort
        ],
    )
    rows = cohort_retention(df).collect()
    for r in rows:
        if r.week_offset == 0:
            assert r.n_active == r.cohort_size
    by_key = {(r.cohort_week, r.week_offset): r for r in rows}
    wk1 = dt.date(2024, 1, 1)
    assert by_key[(wk1, 0)].cohort_size == 2
    assert by_key[(wk1, 1)].n_active == 1
    assert by_key[(dt.date(2024, 1, 8), 0)].cohort_size == 1


def test_cohort_counts_distinct_users_not_events(spark):
    df = _ev(spark, [(1, "view", 1, h) for h in range(5)])
    rows = cohort_retention(df).collect()
    assert len(rows) == 1 and rows[0].n_active == 1 and rows[0].cohort_size == 1
