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
