"""Test-data table registry.

The reference's only "catalog" is three DuckDB relation names
(bronze/silver/gold, ``/root/reference/README.md:40``). Here the
catalog is Spark temp views over the driver-provided parquet tables
(TESTDATA.md): a parquet scan per table, so Catalyst gets predicate
pushdown, column pruning, and (on partitioned layouts) partition
pruning for free.

At 100 TB these would be external tables over partitioned/bucketed
parquet; the API is identical — only the paths change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: dimension tables small enough to broadcast at any realistic scale —
#: used by query builders to hint the join strategy explicitly.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one table. No action is triggered."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL surface, SURVEY B11/C).

    Returns the DataFrames so callers can also use the DataFrame API.
    """
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
