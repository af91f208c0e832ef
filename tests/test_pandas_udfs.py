"""Pandas-UDF escape hatch: each UDF must agree with its builtin twin."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_cortex_spark.functions.pandas_udfs import (
    geometric_mean,
    normalize_vec,
    normalize_vec_builtin,
)
from etl_cortex_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_normalize_vec_matches_builtin(spark):
    emb = load_table(spark, SF, "embeddings").limit(200)
    both = emb.select(
        normalize_vec(F.col("embedding").cast("array<double>")).alias("udf"),
        normalize_vec_builtin("embedding").alias("builtin"),
    ).collect()
    for r in both:
        assert len(r.udf) == len(r.builtin)
        assert all(abs(a - b) < 1e-12 for a, b in zip(r.udf, r.builtin))
        norm = math.sqrt(sum(x * x for x in r.udf))
        assert abs(norm - 1.0) < 1e-9


def test_grouped_geomean_matches_expression(spark):
    li = load_table(spark, SF, "lineitem").limit(5000)
    udf_side = (
        li.groupBy("l_returnflag")
        .agg(F.round(geometric_mean("l_quantity"), 6).alias("g"))
        .orderBy("l_returnflag")
        .collect()
    )
    expr_side = (
        li.filter(F.col("l_quantity") > 0)
        .groupBy("l_returnflag")
        .agg(F.round(F.exp(F.avg(F.log("l_quantity"))), 6).alias("g"))
        .orderBy("l_returnflag")
        .collect()
    )
    assert [(r.l_returnflag, r.g) for r in udf_side] == [
        (r.l_returnflag, r.g) for r in expr_side
    ]


def test_udf_plans_are_arrow_not_batch_python(spark):
    """The escape hatch must take the Arrow path (vectorized), never
    row-pickling BatchEvalPython."""
    emb = load_table(spark, SF, "embeddings").limit(10)
    q = emb.select(normalize_vec(F.col("embedding").cast("array<double>")))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan

def test_grouped_geomean_null_parity_on_nonpositive_groups(spark):
    df = spark.createDataFrame(
        [("a", 2.0), ("a", 8.0), ("b", -1.0), ("b", 0.0)], "k string, v double"
    )
    udf_side = {
        r.k: r.g
        for r in df.groupBy("k").agg(geometric_mean("v").alias("g")).collect()
    }
    expr_side = {
        r.k: r.g
        for r in df.groupBy("k")
        .agg(F.exp(F.avg(F.log(F.when(F.col("v") > 0, F.col("v"))))).alias("g"))
        .collect()
    }
    assert abs(udf_side["a"] - 4.0) < 1e-12 and abs(expr_side["a"] - 4.0) < 1e-12
    assert udf_side["b"] is None and expr_side["b"] is None


def test_map_in_arrow_matches_builtin_twin(spark):
    """mapInArrow surface: the RecordBatch kernel's (n_tokens,
    n_chars) must equal the builtin projection d04 runs in
    production, and the plan must be the Arrow map node (never
    row-pickling BatchEvalPython)."""
    from etl_cortex_spark.functions.pandas_udfs import token_stats_arrow

    docs = load_table(spark, SF, "documents").limit(200)
    got = {
        r.doc_id: (r.n_tokens, r.n_chars)
        for r in token_stats_arrow(docs).collect()
    }
    want = {
        r.doc_id: (r.n_tokens, r.n_chars)
        for r in docs.select(
            "doc_id",
            F.size(F.split(F.col("text"), r"\s+")).cast("long").alias("n_tokens"),
            F.length("text").cast("long").alias("n_chars"),
        ).collect()
    }
    assert got == want
    plan = token_stats_arrow(docs)._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan
    assert "BatchEvalPython" not in plan
