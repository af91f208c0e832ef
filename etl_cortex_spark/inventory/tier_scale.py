"""Scale-pattern queries: skew-safe aggregation and join (SURVEY §4.3).

Each must produce EXACTLY the same result as its naive form — the
oracle is the naive SQL, so the hash match proves the salted rewrite
is semantics-preserving, not just plausible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cortex_spark.operators.skew import salted_agg, salted_broadcast_left
from etl_cortex_spark.queries import T, query


@query(
    "scale_salted_agg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def scale_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l_returnflag has only 3 values → maximal key skew: the exact
    shape where a single-phase groupBy funnels 600k rows into 3
    reducers. The salted two-phase spreads each key over 16."""
    li = T(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        aggs=[
            ("l_quantity", "sum", "sum_qty_raw"),
            ("l_quantity", "count", "n"),
            ("l_extendedprice", "min", "min_price_raw"),
            ("l_extendedprice", "max", "max_price_raw"),
        ],
        n_salts=16,
    )
    return out.select(
        "l_returnflag",
        F.round("sum_qty_raw", 2).alias("sum_qty"),
        "n",
        F.round("min_price_raw", 2).alias("min_price"),
        F.round("max_price_raw", 2).alias("max_price"),
    ).orderBy("l_returnflag")


@query(
    "scale_salted_join",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_nationkey
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey <= 20000
    """,
)
def scale_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join vs the naive join as oracle: result-identical,
    but the probe side's hot keys are spread across 8 shards."""
    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 20000)
        .select("o_orderkey", F.col("o_custkey").alias("c_custkey"))
    )
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    joined = salted_broadcast_left(o, c, on=["c_custkey"], n_salts=8)
    return joined.select(
        "o_orderkey",
        F.col("c_custkey").alias("o_custkey"),
        "c_name",
        "c_nationkey",
    )
