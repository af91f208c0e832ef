"""Skew helpers: salted rewrites must be exactly semantics-preserving."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_cortex_spark.operators.skew import salted_agg, salted_broadcast_left


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows, 90% on one key — the pathological distribution
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
        F.col("id"),
    )


def test_salted_agg_equals_plain(spark, skewed):
    plain = (
        skewed.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .orderBy("k")
        .collect()
    )
    salted = (
        salted_agg(
            skewed,
            keys=["k"],
            aggs=[("v", "sum", "s"), ("v", "count", "n"), ("v", "min", "lo"), ("v", "max", "hi")],
            n_salts=8,
        )
        .orderBy("k")
        .collect()
    )
    assert [r.asDict() for r in plain] == [r.asDict() for r in salted]


def test_salted_agg_rejects_nonalgebraic(skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, keys=["k"], aggs=[("v", "avg", "a")])


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", 1), ("cold", 2), ("absent", 3)], "k string, tag int"
    )
    plain = skewed.join(dim, "k").groupBy("k", "tag").count().orderBy("k").collect()
    salted = (
        salted_broadcast_left(skewed, dim, on=["k"], n_salts=4)
        .groupBy("k", "tag")
        .count()
        .orderBy("k")
        .collect()
    )
    assert [r.asDict() for r in plain] == [r.asDict() for r in salted]


def test_salted_join_left_outer(spark, skewed):
    dim = spark.createDataFrame([("hot", 1)], "k string, tag int")
    plain = skewed.join(dim, "k", "left").filter(F.col("tag").isNull()).count()
    salted = (
        salted_broadcast_left(skewed, dim, on=["k"], n_salts=4, how="left")
        .filter(F.col("tag").isNull())
        .count()
    )
    assert plain == salted == 1000