"""ASOF join — SURVEY §2 C16, the one SQL feature the reference's
declared DuckDB surface has (DuckDB ≥1.0 ``ASOF JOIN``) that Spark
lacks natively.

Spark-first design: the classic *union + ordered window* rewrite, not a
range join —

1. tag left rows side=1, right rows side=0;
2. union on (keys, ts, side, packed right payload);
3. one window per key ordered by (ts, side): ``last(payload,
   ignorenulls=True)`` over UNBOUNDED PRECEDING..CURRENT ROW carries
   the most recent right payload forward onto each left row;
4. keep side=1 rows.

Cost model: ONE shuffle on the join keys + an in-partition sort —
identical to the shuffle a sort-merge join would do, with no
range-explosion. At 100 TB this scales like any keyed window (AQE
handles skewed keys); a broadcast-range-join alternative would blow up
on dense right sides.

The right payload is packed into a single struct before the window so
all payload columns come from the SAME matched row (per-column
``last(ignorenulls)`` could mix rows when payloads contain nulls).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = (),
    suffix: str = "_asof",
) -> DataFrame:
    """Backward ASOF LEFT join: for each left row, attach the right row
    with the greatest ``on`` value ≤ the left's ``on`` within the same
    ``by`` group (ties on ``on``: the right row matches).

    Right payload columns are appended, renamed with ``suffix`` when
    they collide with a left column name.
    """
    by = list(by)
    payload_cols = [c for c in right.columns if c != on and c not in by]

    def out_name(c: str) -> str:
        return c + suffix if c in left.columns else c

    packed = F.struct(*[F.col(c).alias(c) for c in payload_cols])
    r = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("__side"),
        packed.alias("__payload"),
    )
    l = left.select(
        *left.columns,
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    result = matched.filter(F.col("__side") == 1).select(
        *left.columns,
        *[F.col(f"__match.{c}").alias(out_name(c)) for c in payload_cols],
    )
    return result
