"""Distributed EXACT quantiles without the per-partition value map.

Spark's exact ``percentile`` / ``percentile_disc`` / ``median`` are
TypedImperativeAggregates: every partition builds an OpenHashMap of
EVERY DISTINCT VALUE it sees, the maps are serialized into the partial
buffers, merged, then sorted on the final task. On a near-unique
column (e.g. prices: 583k distinct of 600k rows at sf0.1) the buffer
IS the column — per extra fraction expressed as its own aggregate the
whole map is built, shipped and merged AGAIN (measured: one
``percentile_disc`` 1.2 s, three 3.5 s at sf0.1, while an
``approx_percentile`` sketch of all three is 0.2 s). At 100 TB the
same shape is an executor-memory cliff, not just CPU: partial-buffer
size scales with per-partition distinct count, unbounded.

This module replaces that with two-level distributed SELECTION
(guide §1.2-1 — fix the distributed algorithm first):

1. one scan: per group ``count / min / max``;
2. one scan: histogram of ``buckets`` equal-width bins over
   ``[min, max]`` — a codegen hash aggregate whose state is O(buckets)
   per group, never O(distinct);
3. the ≤``buckets``-row histogram is folded (a bounded ``aggregate``
   HOF over the collected, sorted bucket array — no global window) to
   locate, for each requested rank, the bucket holding it and the
   rank offset inside that bucket. Single-valued buckets
   (``min == max`` — the heavy-duplicates case, e.g. a 50-distinct
   quantity column) resolve immediately;
4. one more scan joins the remaining (group, bucket, offset) probes —
   broadcast, they are ≤ |ranks| rows per group — back to the rows of
   exactly those buckets (~n/buckets rows each) and picks the
   offset-th smallest with a partitioned ``row_number`` window.

Three scans total, all state bounded by ``buckets`` — the classic
histogram-refinement selection. Exactness: bucket assignment uses one
deterministic expression shared by steps 2 and 4, so the located rank
is the true order statistic; duplicates of the same value are
interchangeable for a value-only order statistic, so the window's
tie order is irrelevant.

``exact_percentile_disc`` matches ``percentile_disc(p) WITHIN GROUP
(ORDER BY v)``: the smallest v whose cumulative frequency
``cum/n >= p``, i.e. the rank-``ceil(p·n)`` value (NULLs ignored).
``exact_percentile_cont`` matches the exact continuous ``percentile``
/ ``median``: position ``p·(n-1)`` (0-based), and Spark's own
interpolation expression ``(higher - pos) * v_lo + (pos - lower) *
v_hi`` is replicated operation-for-operation so results are
BIT-equal, not just close (pinned in tests/test_quantiles.py).

Groups whose value column is entirely NULL are absent from the output
(the native aggregate would keep them with a NULL quantile) — callers
on NOT NULL columns are unaffected. ``group_cols`` cardinality must
be broadcast-bounded (the per-group stats row rides a broadcast join
onto the scan) — the same contract every grouped-percentile report
already implies.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _check(fractions: Sequence[float], out_names, low_ok: float) -> list[str]:
    if not fractions:
        raise ValueError("exact quantiles: fractions must be non-empty")
    for p in fractions:
        if not low_ok <= p <= 1.0:
            raise ValueError(f"exact quantiles: fraction {p!r} out of range")
    names = list(out_names) if out_names else [
        f"q{i}" for i in range(len(fractions))
    ]
    if len(names) != len(fractions):
        raise ValueError("exact quantiles: out_names/fractions length")
    return names


def _prep(df: DataFrame, value_col: str, group_cols: Sequence[str]):
    """(group cols, dummy?, non-null value frame, per-group stats)."""
    g = list(group_cols)
    dummy = not g
    if dummy:
        df = df.withColumn("__qg", F.lit(0))
        g = ["__qg"]
    vals = df.select(
        *g, F.col(value_col).cast("double").alias("__v")
    ).filter(F.col("__v").isNotNull())
    stats = vals.groupBy(*g).agg(
        F.count("__v").alias("__n"),
        F.min("__v").alias("__mn"),
        F.max("__v").alias("__mx"),
    )
    return g, dummy, vals, stats


def _values_at_ranks(
    vals: DataFrame,
    stats: DataFrame,
    g: list[str],
    targets: DataFrame,
    buckets: int,
) -> DataFrame:
    """Order statistics: ``targets`` is (g…, __ti, __k) with __k a
    1-indexed rank into the group's sorted values; returns
    (g…, __ti, __q)."""
    v = F.col("__v")
    # one shared, deterministic bucket expression (histogram AND
    # refinement): equal-width bins over [mn, mx], top edge clamped
    bucket_expr = (
        F.when(F.col("__mx") == F.col("__mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (v - F.col("__mn"))
                    / (F.col("__mx") - F.col("__mn"))
                    * F.lit(buckets)
                ),
                F.lit(buckets - 1),
            )
        )
        .cast("int")
    )
    bucketed = vals.join(F.broadcast(stats), g).withColumn("__b", bucket_expr)
    hist = (
        bucketed.groupBy(*g, "__b")
        .agg(
            F.count("__v").alias("__c"),
            F.min("__v").alias("__bmn"),
            F.max("__v").alias("__bmx"),
        )
        .groupBy(*g)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("__b", "__c", "__bmn", "__bmx"))
            ).alias("__hist")
        )
    )
    # bounded fold over the sorted bucket array: locate the bucket
    # where the cumulative count first reaches rank k. Accumulator:
    # (cum so far, located bucket or -1, offset in bucket, bucket
    # min, bucket max).
    zero = F.struct(
        F.lit(0).cast("long").alias("cum"),
        F.lit(-1).cast("int").alias("b"),
        F.lit(0).cast("long").alias("off"),
        F.lit(0.0).alias("bmn"),
        F.lit(0.0).alias("bmx"),
    )

    def step(acc, x):
        hit = F.struct(
            acc["cum"].alias("cum"),
            x["__b"].alias("b"),
            (F.col("__k") - acc["cum"]).alias("off"),
            x["__bmn"].alias("bmn"),
            x["__bmx"].alias("bmx"),
        )
        miss = F.struct(
            (acc["cum"] + x["__c"]).alias("cum"),
            F.lit(-1).cast("int").alias("b"),
            F.lit(0).cast("long").alias("off"),
            F.lit(0.0).alias("bmn"),
            F.lit(0.0).alias("bmx"),
        )
        return F.when(acc["b"] >= 0, acc).otherwise(
            F.when(acc["cum"] + x["__c"] >= F.col("__k"), hit).otherwise(miss)
        )

    located = targets.join(hist, g).select(
        *g, "__ti", F.aggregate("__hist", zero, step).alias("__loc")
    ).select(
        *g,
        "__ti",
        F.col("__loc.b").alias("__b"),
        F.col("__loc.off").alias("__off"),
        # single-valued bucket: the order statistic IS that value
        F.when(
            F.col("__loc.bmn") == F.col("__loc.bmx"), F.col("__loc.bmn")
        ).alias("__direct"),
    )
    direct = located.filter(F.col("__direct").isNotNull()).select(
        *g, "__ti", F.col("__direct").alias("__q")
    )
    need = located.filter(F.col("__direct").isNull()).select(
        *g, "__ti", "__b", "__off"
    )
    w = Window.partitionBy(*g, "__ti").orderBy("__v")
    refined = (
        bucketed.join(F.broadcast(need), [*g, "__b"])
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == F.col("__off"))
        .select(*g, "__ti", F.col("__v").alias("__q"))
    )
    return direct.unionByName(refined)


def exact_percentile_disc(
    df: DataFrame,
    value_col: str,
    fractions: Sequence[float],
    group_cols: Sequence[str] = (),
    buckets: int = 2048,
    out_names: Sequence[str] | None = None,
) -> DataFrame:
    """Exact ``percentile_disc`` per group: one output row per group
    with one DOUBLE column per fraction (``out_names`` or ``q0..``)."""
    names = _check(fractions, out_names, low_ok=1e-12)
    g, dummy, vals, stats = _prep(df, value_col, group_cols)
    frac_structs = F.array(
        *[
            F.struct(F.lit(i).alias("__ti"), F.lit(float(p)).alias("__p"))
            for i, p in enumerate(fractions)
        ]
    )
    targets = stats.select(
        *g, F.explode(frac_structs).alias("__f"), F.col("__n")
    ).select(
        *g,
        F.col("__f.__ti").alias("__ti"),
        # percentile_disc rank: smallest v with cum/n >= p, i.e. the
        # ceil(p*n)-th value (1-indexed); p > 0 => rank >= 1
        F.ceil(F.col("__f.__p") * F.col("__n")).cast("long").alias("__k"),
    )
    picked = _values_at_ranks(vals, stats, g, targets, buckets)
    out = picked.groupBy(*g).agg(
        *[
            F.max(F.when(F.col("__ti") == i, F.col("__q"))).alias(names[i])
            for i in range(len(fractions))
        ]
    )
    return out.drop("__qg") if dummy else out


def exact_percentile_cont(
    df: DataFrame,
    value_col: str,
    fractions: Sequence[float],
    group_cols: Sequence[str] = (),
    buckets: int = 2048,
    out_names: Sequence[str] | None = None,
) -> DataFrame:
    """Exact continuous ``percentile`` per group, BIT-equal to Spark's
    aggregate: position ``p·(n-1)``, interpolation
    ``(higher - pos) * v_lo + (pos - lower) * v_hi`` — the aggregate's
    own expression, replicated operation-for-operation."""
    names = _check(fractions, out_names, low_ok=0.0)
    g, dummy, vals, stats = _prep(df, value_col, group_cols)
    # two rank targets per fraction: the floor and ceil neighbors of
    # the continuous position (0-based) — ranks are 1-indexed here
    structs = []
    for i, p in enumerate(fractions):
        pos = F.lit(float(p)) * (F.col("__n") - F.lit(1))
        structs.append(
            F.struct(
                F.lit(2 * i).alias("__ti"),
                (F.floor(pos) + F.lit(1)).cast("long").alias("__k"),
            )
        )
        structs.append(
            F.struct(
                F.lit(2 * i + 1).alias("__ti"),
                (F.ceil(pos) + F.lit(1)).cast("long").alias("__k"),
            )
        )
    targets = stats.select(
        *g, F.explode(F.array(*structs)).alias("__f")
    ).select(
        *g, F.col("__f.__ti").alias("__ti"), F.col("__f.__k").alias("__k")
    )
    picked = _values_at_ranks(vals, stats, g, targets, buckets)
    pivoted = picked.groupBy(*g).agg(
        *[
            F.max(F.when(F.col("__ti") == t, F.col("__q"))).alias(f"__r{t}")
            for t in range(2 * len(fractions))
        ]
    )
    assembled = pivoted.join(stats.select(*g, "__n"), g)
    outs = []
    for i, p in enumerate(fractions):
        pos = F.lit(float(p)) * (F.col("__n") - F.lit(1))
        lower = F.floor(pos)
        higher = F.ceil(pos)
        v_lo = F.col(f"__r{2 * i}")
        v_hi = F.col(f"__r{2 * i + 1}")
        outs.append(
            F.when(higher == lower, v_lo)
            .otherwise((higher - pos) * v_lo + (pos - lower) * v_hi)
            .alias(names[i])
        )
    out = assembled.select(*g, *outs)
    return out.drop("__qg") if dummy else out
