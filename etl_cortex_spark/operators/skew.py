"""Skew-mitigation helpers (SURVEY §4.3 / the 100 TB contract).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
our session factory) handles most skew at runtime; these helpers cover
the two cases AQE cannot:

- **salted_agg**: a groupBy whose hottest key overwhelms one reducer.
  Two-phase: salt the key with ``n_salts`` shards → partial aggregate
  per (key, salt) → final aggregate per key. Only algebraic aggregates
  (sum/count/min/max, and avg via sum+count) can be re-aggregated —
  enforced by construction: callers pass (col, fn) pairs from the
  supported set.
- **salted_broadcast_left**: a join where the BUILD side is small but
  the probe side's key distribution is pathological AND the join must
  not broadcast (e.g. the small side exceeds the broadcast cap). The
  left's rows get a random-but-deterministic salt (hash of a unique
  column), the right is exploded ``n_salts`` times — the classic
  replicate-the-small-side salt join. Bytes cost: right × n_salts.

Both keep everything in builtin expressions — no UDFs, no RDDs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: aggregate fns that can be split into partial + final safely.
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    n_salts: int = 16,
    salt_src: Column | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` is (input_col, fn, output_name) with fn in
    {sum, count, min, max}. The salt is derived from a hash of the
    whole row (or ``salt_src``) so it is deterministic and needs no RNG.

    Equivalent to ``df.groupBy(keys).agg(...)`` for these algebraic
    fns; the first shuffle fans the hot key across ``n_salts``
    reducers, the second is one row per (key, salt).
    """
    bad = [fn for _, fn, _ in aggs if fn not in _ALGEBRAIC]
    if bad:
        raise ValueError(f"non-algebraic aggregate(s) {bad}; supported: {sorted(_ALGEBRAIC)}")

    salt = F.pmod(
        salt_src if salt_src is not None else F.xxhash64(*[F.col(c) for c in df.columns]),
        F.lit(n_salts),
    ).alias("__salt")

    partial = (
        df.select("*", salt)
        .groupBy(*keys, "__salt")
        .agg(
            *[
                _ALGEBRAIC[fn][0](F.col(c)).alias(f"__p_{out}")
                for c, fn, out in aggs
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[fn][1](F.col(f"__p_{out}")).alias(out)
            for _, fn, out in aggs
        ]
    )


def salted_broadcast_left(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (large, skewed) left; replicate the
    (small) right across every salt via a literal-range explode. The
    joined output equals ``left.join(right, on, how)`` for inner/left
    joins on equi-keys.
    """
    on = list(on)
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l = left.withColumn("__salt", lsalt)
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = l.join(r, on + ["__salt"], how)
    return joined.drop("__salt")
