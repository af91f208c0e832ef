"""operators/quantiles: distributed exact selection vs Spark's native
TypedImperativeAggregate percentiles.

The contract is BIT-equality (string-rendered doubles compared
exactly, not approximately) against ``percentile_disc`` /
``percentile`` on the same frame — the operator replaces the native
aggregates inside b29 (and is available for any grouped report), so
any drift would change declared-query hashes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_cortex_spark.operators.quantiles import (
    exact_percentile_cont,
    exact_percentile_disc,
)

FRACS = [0.25, 0.5, 0.75, 0.9]


def _native_disc(df, col, fracs, group_cols=()):
    aggs = [
        F.expr(
            f"percentile_disc({p}) WITHIN GROUP (ORDER BY {col})"
        ).alias(f"q{i}")
        for i, p in enumerate(fracs)
    ]
    return df.groupBy(*group_cols).agg(*aggs) if group_cols else df.agg(*aggs)


def _native_cont(df, col, fracs, group_cols=()):
    aggs = [
        F.percentile(F.col(col).cast("double"), p).alias(f"q{i}")
        for i, p in enumerate(fracs)
    ]
    return df.groupBy(*group_cols).agg(*aggs) if group_cols else df.agg(*aggs)


def _rows(df, keys):
    out = {}
    for r in df.collect():
        d = r.asDict()
        out[tuple(d[k] for k in keys)] = {
            k: v for k, v in d.items() if k not in keys
        }
    return out


def _assert_bit_equal(got_df, want_df, keys=()):
    got, want = _rows(got_df, keys), _rows(want_df, keys)
    assert set(got) == set(want)
    for k in want:
        for c, wv in want[k].items():
            gv = got[k][c]
            assert repr(gv) == repr(wv), (k, c, gv, wv)


CASES = [
    # near-unique heavy-tail values (the b29 price shape)
    ("unique", [(i, float(i) * 1.37 + 0.001 * (i % 7)) for i in range(997)]),
    # heavy duplicates: 50 distinct values (single-valued buckets path)
    ("dups", [(i, float(i % 50)) for i in range(1000)]),
    # all-equal column (mn == mx degenerate bucket)
    ("const", [(i, 42.5) for i in range(100)]),
    # tiny groups incl. n=1 and n=2
    ("tiny", [(0, 3.0), (1, 1.0), (2, 2.0)]),
    ("one", [(0, 7.25)]),
    # negatives + zeros + clustered values
    ("negs", [(i, -5.0 + 0.01 * (i % 3)) for i in range(500)]),
]


@pytest.mark.parametrize("name,rows", CASES, ids=[c[0] for c in CASES])
def test_disc_ungrouped_bit_equal(spark, name, rows):
    df = spark.createDataFrame(rows, "id bigint, v double")
    got = exact_percentile_disc(df, "v", FRACS, buckets=16)
    _assert_bit_equal(got, _native_disc(df, "v", FRACS))


@pytest.mark.parametrize("name,rows", CASES, ids=[c[0] for c in CASES])
def test_cont_ungrouped_bit_equal(spark, name, rows):
    df = spark.createDataFrame(rows, "id bigint, v double")
    got = exact_percentile_cont(df, "v", FRACS, buckets=16)
    _assert_bit_equal(got, _native_cont(df, "v", FRACS))


def test_grouped_bit_equal_with_nulls(spark):
    rows = []
    for gi, g in enumerate(["a", "b", "c"]):
        for i in range(200 + 37 * gi):
            rows.append((g, float(i * (gi + 1)) % 91.5))
        rows.append((g, None))  # NULLs ignored by both paths
    df = spark.createDataFrame(rows, "g string, v double")
    got = exact_percentile_disc(df, "v", FRACS, group_cols=["g"], buckets=8)
    _assert_bit_equal(got, _native_disc(df, "v", FRACS, ["g"]), keys=("g",))
    gotc = exact_percentile_cont(df, "v", FRACS, group_cols=["g"], buckets=8)
    _assert_bit_equal(gotc, _native_cont(df, "v", FRACS, ["g"]), keys=("g",))


def test_extreme_fractions(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(101)], "id bigint, v double"
    )
    fr = [0.001, 0.999, 1.0]
    got = exact_percentile_disc(df, "v", fr, buckets=4)
    _assert_bit_equal(got, _native_disc(df, "v", fr))
    frc = [0.0] + fr
    gotc = exact_percentile_cont(df, "v", frc, buckets=4)
    _assert_bit_equal(gotc, _native_cont(df, "v", frc))


def test_lineitem_prices_match_native(spark, sf_dir):
    from etl_cortex_spark.queries import T

    li = T(spark, sf_dir, "lineitem").select("l_extendedprice")
    got = exact_percentile_disc(li, "l_extendedprice", [0.25, 0.5, 0.75])
    _assert_bit_equal(got, _native_disc(li, "l_extendedprice", [0.25, 0.5, 0.75]))
    gotc = exact_percentile_cont(li, "l_extendedprice", [0.5, 0.9])
    _assert_bit_equal(gotc, _native_cont(li, "l_extendedprice", [0.5, 0.9]))


def test_bad_args(spark):
    df = spark.createDataFrame([(1, 1.0)], "id bigint, v double")
    with pytest.raises(ValueError):
        exact_percentile_disc(df, "v", [])
    with pytest.raises(ValueError):
        exact_percentile_disc(df, "v", [0.0])  # disc needs p > 0
    with pytest.raises(ValueError):
        exact_percentile_cont(df, "v", [1.5])
    with pytest.raises(ValueError):
        exact_percentile_disc(df, "v", [0.5], out_names=["a", "b"])
