"""Structured Streaming over the events table (SURVEY §2 D6-D8).

The reference has no streaming story at all (SURVEY §2 "Streaming");
these are the mandated tier-D extensions, defined Spark-first:

- file-source replay of the events parquet as a stream,
- event-time watermarks (D6),
- tumbling / sliding / session windows (D7),
- ``dropDuplicatesWithinWatermark`` stateful dedup (D8).

Tests drive them with ``trigger(availableNow=True)`` +
``processAllAvailable`` so a bounded replay completes synchronously
and can be compared 1:1 against the equivalent batch plan (and the
DuckDB oracle). At scale the same code takes a Kafka source and a real
sink; only the ``format`` changes.

The events parquet stores TIMESTAMP(NANOS) → the stream schema reads
``ts`` as long (nanosAsLong) and converts, same as sources/tables.
"""

from __future__ import annotations

import os
from itertools import count

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_QUERY_SEQ = count()


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream replaying the events parquet."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # FileStreamSource wants a directory: stream the sf dir, glob down
    # to the one table file.
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def run_to_memory(agg: DataFrame, mode: str = "complete") -> DataFrame:
    """Drive a bounded streaming query to completion into a memory
    sink; returns the result as a (batch) DataFrame."""
    name = f"stream_out_{next(_QUERY_SEQ)}"
    q = (
        agg.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = agg.sparkSession
    return spark.table(name)


def tumbling_counts(spark: SparkSession, sf_dir: str, window: str = "1 day") -> DataFrame:
    """D6+D7: watermarked tumbling-window counts per event_type."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    out = run_to_memory(agg, "complete")
    return out.select(
        F.col("window.start").alias("win_start"),
        "event_type",
        "n",
        "total_value",
    )


def sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7: sliding window (1 day, slide 12h) event counts."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day", "12 hours"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = run_to_memory(agg, "complete")
    return out.select(F.col("window.start").alias("win_start"), "n")


def session_windows(spark: SparkSession, sf_dir: str, gap: str = "30 minutes") -> DataFrame:
    """D7: per-user session windows with a 30-minute inactivity gap."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = run_to_memory(agg, "complete")
    return out.select(
        F.col("session_window.start").alias("sess_start"),
        "user_id",
        "n_events",
    )


def dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8: stateful duplicate drop keyed on event_id within the
    watermark, then a per-type count — equals batch DISTINCT when the
    replay is bounded."""
    ev = read_events_stream(spark, sf_dir)
    # replay the source twice to create real duplicates in the stream
    doubled = ev.union(ev)
    deduped = doubled.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return run_to_memory(agg, "complete")
