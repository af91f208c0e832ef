#!/usr/bin/env python
"""Round-16 probes (BASELINE.md methodology, best-of-3 per leg):

1. **d111 skew probe** — the round-15 verdict's done-criterion for the
   grouped_ntile fix: `ccnet_perplexity_buckets` on a 90%-ONE-LANGUAGE
   corpus (the shape the balanced sf fixtures can't exercise, and the
   one that single-tasked the old `ntile OVER (PARTITION BY lang)`
   form) at sf0.1 and the replicated sf1, balanced vs skewed, plus the
   LEGACY windowed-ntile form on the skewed sf1 leg as the contrast.
2. **New-operator slope probe** — scale_snapshot_partition_evolution
   and stream_snapshot_wap, entire lifecycle (fixture build + commits +
   verification read), sf0.1 → sf1.

Usage: python tools/probe_r16.py → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_cortex_spark.queries import QUERIES  # noqa: E402
from etl_cortex_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SPARK_GRAFT_SLOPE_DIR", "/tmp/spark_graft_sf1")


def best_of(n, fn):
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return round(min(times), 3)


def docs_frame(spark, sf_dir, skew: bool):
    from etl_cortex_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    if skew:
        # 90% of documents forced into one language — the crawl shape
        docs = docs.withColumn(
            "lang",
            F.when(F.col("doc_id") % 10 < 9, F.lit("en")).otherwise(
                F.col("lang")
            ),
        )
    return docs


def ccnet_legacy_ntile(docs, lm_top_k=256):
    """The PRE-FIX form (windowed ntile) — the probe's contrast arm."""
    from pyspark.sql import Window

    tg = docs.select(
        F.col("doc_id").alias("__id"),
        F.col("lang").alias("__lang"),
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(lower(text)) - 2, 1)),"
                " i -> substring(lower(text), i, 3))"
            )
        ).alias("__tg"),
    ).filter(F.length("__tg") == 3)
    counts = tg.groupBy("__lang", "__tg").agg(F.count(F.lit(1)).alias("__n"))
    w_lm = Window.partitionBy("__lang").orderBy(F.desc("__n"), "__tg")
    lm = (
        counts.withColumn("__rk", F.row_number().over(w_lm))
        .filter(F.col("__rk") <= lm_top_k)
        .select(
            "__lang", "__tg",
            F.floor(F.log("__n") * 1_000_000).cast("bigint").alias("__lp_u"),
        )
    )
    ds = (
        tg.join(F.broadcast(lm), ["__lang", "__tg"])
        .groupBy("__lang", "__id")
        .agg(F.sum("__lp_u").alias("__s"), F.count(F.lit(1)).alias("__m"))
    )
    w = Window.partitionBy("__lang").orderBy(
        (F.col("__s").cast("double") / F.col("__m")).desc(), F.col("__id")
    )
    name = F.when(F.col("__b") == 1, F.lit("head")).otherwise(
        F.when(F.col("__b") == 2, F.lit("middle")).otherwise(F.lit("tail"))
    )
    return (
        ds.withColumn("__b", F.ntile(3).over(w))
        .groupBy(F.col("__lang").alias("lang"), name.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("__s").alias("s"))
    )


def main():
    from etl_cortex_spark.operators import llmprep as LP

    if not os.path.isdir(os.path.join(SF1, "documents.parquet")):
        from bench_slope import generate_sf1

        generate_sf1()
    spark = get_spark(app_name="probe_r16")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"skew_probe": {}, "slope_probe": {}}

    for sf_name, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        for mode in ("balanced", "skew90"):
            docs = docs_frame(spark, sf_dir, mode == "skew90")
            t = best_of(
                3,
                lambda d=docs: LP.ccnet_perplexity_buckets(d).collect(),
            )
            out["skew_probe"][f"{sf_name}_{mode}"] = t
    # contrast arm: legacy windowed ntile on the worst leg (sf1 skew90)
    docs = docs_frame(spark, SF1, True)
    out["skew_probe"]["sf1_skew90_legacy_ntile"] = best_of(
        3, lambda: ccnet_legacy_ntile(docs).collect()
    )

    for entry in ("scale_snapshot_partition_evolution", "stream_snapshot_wap"):
        fn = QUERIES[entry]
        out["slope_probe"][entry] = {
            "sf0.1": best_of(3, lambda: fn(spark, SF01).collect()),
            "sf1": best_of(3, lambda: fn(spark, SF1).collect()),
        }
        legs = out["slope_probe"][entry]
        legs["slope"] = round(legs["sf1"] / legs["sf0.1"], 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
