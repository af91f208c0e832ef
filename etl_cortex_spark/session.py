"""SparkSession factory.

The reference executes everything eagerly in a single pandas process
(``/root/reference/app.py:313-374``); here the session is the engine:
lazy plans, Catalyst optimization, AQE runtime re-planning.

Defaults are sized for the local[N] test harness but every knob is the
one you would also set on a real cluster:

- AQE on (coalesce partitions, skew-join handling) — at 100 TB the
  static shuffle-partition count is always wrong for some stage; AQE
  fixes it at runtime.
- ``spark.sql.shuffle.partitions`` seeded to ~cores locally; on a
  1000-executor cluster AQE's coalescing makes the initial number a
  ceiling, not a constant.
- Arrow on for every pandas interchange (toPandas, pandas_udf,
  applyInPandas) — the only sanctioned Python boundary.
- Session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle and are cluster-invariant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "etl_cortex_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the singleton SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` for the test
    harness; pass an explicit master (or set one in spark-submit) for
    cluster runs — the conf below is cluster-safe.
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    cpus = int(DEFAULT_CPUS) if DEFAULT_CPUS.isdigit() else 32
    shuffle_partitions = shuffle_partitions or max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # respect the advisory partition size when coalescing instead of
        # maximizing parallelism: small shuffles collapse to few tasks
        # (the Spark docs' own recommendation; measured −12% on the
        # sf0.1 headline bench, and at cluster scale 64 MB advisory
        # partitions are what you want anyway)
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # parquet TIMESTAMP(NANOS) is otherwise illegal in Spark; read as
        # long and convert at the source wrapper (sources.tables).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Spark's default 10MB, on purpose: a bigger auto-threshold lets
        # the static estimator broadcast mis-estimated JOIN INTERMEDIATES
        # (measured: a 64MB threshold broadcast a multi-million-row
        # cust⋈orders build at 10× bench scale — seconds of driver-side
        # hash-building). True dimensions are broadcast EXPLICITLY via
        # F.broadcast hints in the query builders; AQE upgrades the rest
        # at runtime from observed, not estimated, sizes.
        .config("spark.sql.autoBroadcastJoinThreshold", "10MB")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
