"""Time-series resampling: dense calendar + gap-fill (LOCF).

The reference's only time-series surface is a daily aggregate chart
feed (README "time-series analysis", covered by B13). Real pipelines
need the next step: a DENSE series — every (key, bucket) present even
when no rows landed in it — with gaps filled by the last observation
(LOCF). This is the hypertable-rollup shape: one aggregate, one
generated calendar, one window.

Scale design: the calendar is ``sequence(min_day, max_day)`` exploded
from ONE aggregated row — O(days) rows, broadcast-joined against the
distinct key set (O(keys)); the dense frame is a broadcast-hash left
join of calendar×keys against the daily aggregate (shuffles only the
aggregate, which is already small); LOCF is a single window pass per
key ordered by day with ``last(..., ignoreNulls=True)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_daily_locf(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    val_col: str,
    agg: str = "sum",
) -> DataFrame:
    """Daily resample of ``val_col`` per ``key_col`` over the full
    [min(ts), max(ts)] calendar, missing days carried forward (LOCF;
    leading gaps before a key's first observation stay NULL).

    Returns (day date, key_col, n bigint, val double, val_filled
    double): ``n``/``val`` are the day's own rows (0/NULL on gap days),
    ``val_filled`` is LOCF.

    Contract (round 16 broadcast audit): ``key_col`` must be
    BOUNDED-CARDINALITY (series labels — event types, metrics) — the
    dense |days|×|keys| grid both broadcasts are sized by is only
    meaningful for dashboard-class key sets; a data-sized key column
    would make the grid itself the blow-up, not just the broadcast.
    """
    day = F.to_date(F.col(ts_col)).alias("day")
    daily = (
        df.select(day, F.col(key_col), F.col(val_col))
        .groupBy("day", key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(getattr(F, agg)(val_col), 2).alias("val"),
        )
    )
    bounds = df.select(
        F.min(F.to_date(F.col(ts_col))).alias("lo"),
        F.max(F.to_date(F.col(ts_col))).alias("hi"),
    )
    calendar = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    keys = df.select(F.col(key_col)).distinct()
    dense = F.broadcast(calendar).crossJoin(F.broadcast(keys))
    joined = dense.join(daily, ["day", key_col], "left").select(
        "day",
        key_col,
        F.coalesce("n", F.lit(0)).alias("n"),
        "val",
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.withColumn(
        "val_filled", F.last("val", ignorenulls=True).over(w)
    )


def zscore_anomalies(
    daily: DataFrame,
    *,
    key_col: str = "event_type",
    day_col: str = "day",
    value_col: str = "n",
    lookback: int = 14,
    min_history: int = 7,
    threshold: float = 2.0,
) -> DataFrame:
    """Trailing-window z-score anomaly detection over a daily series.

    For each (key, day): mean/stddev of the PRECEDING ``lookback``
    days (current day excluded, so the anomaly can't mask itself),
    z = (x - mean) / std, flagged when |z| > ``threshold``. Rows with
    fewer than ``min_history`` prior days or zero variance get a NULL
    z and are never flagged.

    Integer daily counts make the inputs engine-exact; stddev_samp is
    the cross-engine definition. One window over the key partitioning
    — at scale this is a single keyed shuffle of (key, day, value).
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(-lookback, -1)
    )
    x = F.col(value_col).cast("double")
    mean = F.avg(x).over(w)
    std = F.stddev_samp(x).over(w)
    hist = F.count(x).over(w)
    z = F.when(
        (hist >= min_history) & (std > 0), (x - mean) / std
    )
    return daily.select(
        key_col,
        day_col,
        value_col,
        F.round(z, 4).alias("z"),
        F.coalesce(F.abs(z) > threshold, F.lit(False)).alias("is_anomaly"),
    )


def interpolate_gaps(
    dense: DataFrame,
    *,
    key_col: str = "event_type",
    day_col: str = "day",
    val_col: str = "val",
) -> DataFrame:
    """Linear interpolation over a dense daily series: NULL values are
    filled on the line between the nearest preceding and following
    observations; leading gaps backfill from the first observation,
    trailing gaps carry the last forward (so the output has no NULLs
    for any key with ≥1 observation).

    Two symmetric window passes per key (preceding last / following
    first, with their day ordinals) — the same single keyed shuffle as
    LOCF, reused by all four windows. Output adds ``val_interp``
    rounded to 4 decimals.
    """
    dayn = F.datediff(F.col(day_col), F.lit("1970-01-01"))
    wb = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col(val_col)
    obs_day = F.when(v.isNotNull(), dayn)
    prev_v = F.last(v, ignorenulls=True).over(wb)
    prev_d = F.last(obs_day, ignorenulls=True).over(wb)
    next_v = F.first(v, ignorenulls=True).over(wf)
    next_d = F.first(obs_day, ignorenulls=True).over(wf)
    interp = (
        F.when(v.isNotNull(), v)
        .when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v + (next_v - prev_v) * (dayn - prev_d) / (next_d - prev_d),
        )
        .when(prev_v.isNotNull(), prev_v)
        .otherwise(next_v)
    )
    return dense.withColumn("val_interp", F.round(interp, 4))


def twap(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
) -> DataFrame:
    """Time-weighted average over IRREGULAR samples (the TWAP/VWAP
    family): each observation is weighted by the microseconds until
    the key's next observation (the standard step-function/LOCF
    integral; the last observation has no forward interval and drops
    out). Emits per key: twap (rounded 2), total_us (exact BIGINT —
    the denominator is pure integer arithmetic), n_intervals.

    One window shuffle keyed on ``key_col`` and the final aggregate
    reuses the same partitioning — the plan Spark produces is a
    single exchange. ``order_tiebreak`` (a unique column) makes the
    lead() order total, so the weights are deterministic under ties.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    # NTZ-safe: unix_micros wants TIMESTAMP; under the engine's fixed
    # UTC session the NTZ cast is an identity relabel, not a shift
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    dur = F.lead(us).over(w) - us
    d = df.select(
        key_col, F.col(value_col).alias("__v"), dur.alias("__dur")
    ).filter(F.col("__dur").isNotNull())
    return d.groupBy(key_col).agg(
        F.round(F.sum(F.col("__v") * F.col("__dur")) / F.sum("__dur"), 2).alias(
            "twap"
        ),
        F.sum("__dur").alias("total_us"),
        F.count(F.lit(1)).alias("n_intervals"),
    )
