"""Bucketed co-located joins (SURVEY §4.3 / the 100 TB join strategy).

Writing both sides bucketed+sorted on the join key lets a sort-merge
join run with ZERO exchanges — the canonical way to amortize one
shuffle across every future join on that key. At 100 TB this is the
difference between re-shuffling 100 TB per join and reading
pre-colocated buckets.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from etl_cortex_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("buckets")
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    (
        orders.write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", str(d / "orders"))
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        customer.write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", str(d / "customer"))
        .mode("overwrite")
        .saveAsTable("b_customer")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_runs_without_exchange(bucketed):
    spark = bucketed
    # force the sort-merge path so the exchange count is meaningful
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        body = plan.split("== Physical Plan ==")[1]
        assert len(re.findall(r"\(\d+\) Exchange", body)) == 0, body
        assert "SortMergeJoin" in body
        # and the join is still correct
        n = j.count()
        plain = (
            spark.table("b_orders")
            .join(
                spark.table("b_customer").hint("broadcast"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .count()
        )
        assert n == plain > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucket_pruning_single_key_lookup(bucketed):
    """Point lookups on the bucket key read one bucket, not eight —
    visible as a Filter over the scan with bucket pruning noted."""
    spark = bucketed
    # the auto-bucketed-scan heuristic turns bucketing off for plans
    # with no exchange to elide; force it on to observe the pruning
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        q = spark.table("b_orders").filter(F.col("o_custkey") == 37)
        plan = q._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "Bucketed: true" in plan
        assert "SelectedBucketsCount: 1 out of 8" in plan
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
        )