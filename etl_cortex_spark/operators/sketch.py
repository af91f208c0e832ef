"""Count-Min Sketch as plain DataFrame aggregation (frequency twin of
the HLL distinct-count sketches in `scale_hll_sketch_rollup`).

PySpark 4 exposes no count-min API (the old ``df.stat.countMinSketch``
is gone and SQL's ``count_min_sketch`` emits an opaque binary with no
query function), so the sketch is stood up from first principles as a
DataFrame — which is the better 100 TB shape anyway:

- **Build**: every input row contributes +1 to ``depth`` counters, one
  per hash row ``i``: ``bucket_i = xxhash64(key, i) % width``. The
  sketch IS a DataFrame of at most ``depth*width`` rows
  ``(i, bucket, cnt)`` — one explode + one partial-combined groupBy,
  and the result is tiny regardless of input size.
- **Merge**: union + re-aggregate (counters add) — sketches built per
  partition/day/source roll up without re-scanning base data, the same
  property that makes the HLL rollup the distinct-count answer.
- **Estimate**: probe keys re-derive their ``depth`` buckets, join the
  (broadcast) sketch on ``(i, bucket)``, and take the min counter —
  missing buckets count 0.

Guarantees (standard CMS, Cormode & Muthukrishnan): estimates never
undercount (counters only add), and overcount by at most ``eps*N``
with probability ``1-delta`` for ``width=ceil(e/eps)``,
``depth=ceil(ln(1/delta))`` — pinned by the epsilon-oracle entry
`scale_cms_frequency` and by collision/merge pytests.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_params(eps: float, delta: float) -> tuple[int, int]:
    """(width, depth) for an eps*N overestimate bound holding with
    probability 1-delta."""
    return math.ceil(math.e / eps), math.ceil(math.log(1.0 / delta))


def _bucketed(df: DataFrame, key_col: str, width: int, depth: int) -> DataFrame:
    """One row per (input row, depth): the counter coordinates."""
    return df.select(
        F.col(key_col).alias("__k"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("i"),
    ).select(
        "__k",
        "i",
        F.pmod(F.xxhash64("__k", "i"), F.lit(width)).alias("bucket"),
    )


def cms_build(df: DataFrame, key_col: str, width: int, depth: int) -> DataFrame:
    """Sketch frame ``(i, bucket, cnt)`` — ≤ depth*width rows. The
    explode multiplies rows depth× BEFORE the aggregation, but the
    map-side partial combine collapses them to ≤ depth*width per input
    partition, so the shuffle carries sketch-sized data, not data-sized
    data."""
    return (
        _bucketed(df, key_col, width, depth)
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (width, depth): counters add."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("i", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, key_col: str, width: int, depth: int
) -> DataFrame:
    """Point-query estimates for each distinct probe key: min over the
    key's depth counters. Returns ``(key_col, est)``. The sketch is
    broadcast — it is bounded by depth*width rows by construction."""
    pd = _bucketed(probes.select(key_col).distinct(), key_col, width, depth)
    joined = pd.join(F.broadcast(sketch), ["i", "bucket"], "left")
    return (
        joined.groupBy("__k")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
        .withColumnRenamed("__k", key_col)
    )
