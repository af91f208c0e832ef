"""Property tests (SURVEY §5.2 item 4): algebraic invariants of the
gold transforms over adversarial generated data — duplicate keys with
distinct timestamps spread across many partitions, NULL keys, ties.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_cortex_spark.operators.gold import dedup_latest, union_all, value_counts


@pytest.fixture(scope="module")
def messy(spark):
    """200 rows over 23 keys (incl. NULL), duplicated timestamps, 16
    partitions — the layout where a nondeterministic dedup shows up."""
    df = (
        spark.range(200)
        .repartition(16)
        .select(
            F.when(F.col("id") % 23 == 0, None)
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 23).cast("string")))
            .alias("endpoint_name"),
            F.lit("alias").alias("endpoint_alias"),
            F.expr("timestamp_micros(cast(id as bigint) % 7 * 1000000)").alias(
                "last_seen"
            ),
            (F.col("id") % 13).alias("payload"),
        )
    )
    return df.cache()


def test_dedup_idempotent(messy):
    once = dedup_latest(messy)
    twice = dedup_latest(once)
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0


def test_dedup_deterministic_across_partitionings(messy):
    a = dedup_latest(messy.repartition(3)).orderBy("endpoint_name").collect()
    b = dedup_latest(messy.repartition(29)).orderBy("endpoint_name").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_dedup_keeps_max_timestamp_per_key(messy):
    out = dedup_latest(messy)
    expected_max = messy.groupBy("endpoint_name", "endpoint_alias").agg(
        F.max("last_seen").alias("last_seen")
    )
    # every surviving row carries its group's max timestamp
    assert (
        out.select("endpoint_name", "endpoint_alias", "last_seen")
        .exceptAll(expected_max)
        .count()
        == 0
    )


def test_union_count_conservation(messy, spark):
    other = spark.range(57).select(
        F.lit("x").alias("endpoint_name"),
        F.col("id").cast("string").alias("new_col"),
    )
    u = union_all([messy, other])
    assert u.count() == messy.count() + 57
    # missing columns null-fill on both sides
    assert u.columns == messy.columns + ["new_col"]


def test_value_counts_sum_to_total_and_keep_nulls(messy):
    vc = value_counts(messy, "endpoint_name")
    rows = vc.collect()
    assert sum(r["qtd"] for r in rows) == messy.count()
    assert any(r["endpoint_name"] is None for r in rows)  # dropna=False semantics
    qtds = [r["qtd"] for r in rows]
    assert qtds == sorted(qtds, reverse=True)