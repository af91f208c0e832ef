"""Binned range join — the scale pattern for BIG-to-BIG non-equi joins.

``c14_theta_range_join`` covers the small-side case (broadcast
nested-loop against a constant bucket table). When BOTH sides are
large — points joined into intervals with no equi key — BNLJ is
O(points × intervals) and a 100 TB input never finishes. The standard
fix (Databricks' range-join optimization, DataFusion/DuckDB IEJoin
literature) is binning:

- each point lands in exactly ONE bin: ``floor(p / w)``;
- each interval explodes to EVERY bin it overlaps:
  ``sequence(floor(lo/w), floor(hi/w))``;
- the join becomes an EQUI-join on the bin key (shuffle- or
  broadcast-hash, Catalyst's choice) refined by the exact range
  predicate.

Cost: interval fan-out of ``(hi-lo)/w + 1`` rows — pick ``w`` near the
typical interval length so fan-out is O(1) — against a hash join
instead of a cartesian probe. No duplicates by construction: a
(point, interval) match meets in exactly the point's own bin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join ``points`` to ``intervals`` on
    ``lo_col <= point_col <= hi_col`` via bin equi-join.

    ``point_col``/``lo_col``/``hi_col`` must be integral (cast dates to
    day numbers first — e.g. ``F.datediff(col, F.lit("1970-01-01"))``).
    Output columns: all of ``points`` then all of ``intervals``
    (names must not collide; prefix beforehand if they do).

    ``how`` is restricted to inner/left/left_semi/left_anti: the
    no-duplicates argument relies on every match meeting in the
    point's single bin — an UNMATCHED exploded interval row would
    surface once per overlapped bin on right/full sides.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "semi",
                   "left_semi", "leftsemi", "anti", "left_anti", "leftanti"):
        raise ValueError(
            f"how={how!r} unsupported: right/full outer would emit one "
            f"null-padded row per exploded interval bin, not per interval"
        )
    p = points.withColumn("__bin", F.floor(F.col(point_col) / bin_width))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width),
                F.floor(F.col(hi_col) / bin_width),
            )
        ),
    )
    joined = p.join(
        iv,
        (p["__bin"] == iv["__bin"])
        & (F.col(point_col) >= F.col(lo_col))
        & (F.col(point_col) <= F.col(hi_col)),
        how,
    )
    return joined.drop("__bin")
