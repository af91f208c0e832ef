#!/usr/bin/env python
"""Third slope decade (round 9): the three bucketed-layout queries at
~sf10 (100 key-offset copies of the sf0.1 tables, ~60 M lineitem rows)
— big enough that Spark's per-job floor is amortized and the plans
themselves carry the time, which is the regime a cluster actually runs
in. Spark runs cluster defaults (AQE on) + the SF-sized bloom gate,
same stance as bench_slope's sf1 leg; DuckDB runs the paired oracles
on the same files, same thread count, best-of-3 both sides (the data
is 10x sf1, so 3 runs keep the probe's wall clock sane).

Prints one JSON line; the committed summary lives in BENCH_SLOPE.json
("sf10_probe") and BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SLOPE_DIR", "/tmp/spark_graft_sf10")
os.environ.setdefault("SPARK_GRAFT_SLOPE_COPIES", "100")

import bench_slope  # noqa: E402  (reads the env knobs above at import)
from bench import build_layouts, cache_dimensions, warm_up  # noqa: E402
from etl_cortex_spark.queries import QUERIES  # noqa: E402
from etl_cortex_spark.session import get_spark  # noqa: E402

#: default: the three bucketed-layout queries; override with
#: SPARK_GRAFT_PROBE_NAMES=a,b,c to take a third-decade record of any
#: other headline (round 10 used this for the replanned d03/d02/d19).
NAMES = os.environ.get(
    "SPARK_GRAFT_PROBE_NAMES",
    "tpch_q3_shipping_priority,tpch_q5_local_supplier_volume,c10_join_inner_agg",
).split(",")
RUNS = 3


def main() -> None:
    sf10 = bench_slope.SF1_DIR
    if not os.path.isdir(sf10):
        t0 = time.perf_counter()
        bench_slope.generate_sf1()
        print(f"generated {sf10} in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    spark = get_spark(
        app_name="sf10_probe",
        extra_conf={
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "100MB",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "500MB",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm_up(spark)
    cache_dimensions(spark, sf10)
    ingest = build_layouts(spark, sf10)
    sp = {}
    for name in NAMES:
        best = float("inf")
        for _ in range(RUNS):
            df = QUERIES[name](spark, sf10)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        sp[name] = round(best, 4)
    du = bench_slope.duck_times(sf10, NAMES, runs=RUNS)
    from etl_cortex_spark.operators.caching import release_all

    release_all()
    spark.stop()
    out = {
        "sf": "~10 (100x sf0.1 copies)",
        "spark": sp,
        "duckdb": du,
        "ratio_per_query": {n: round(sp[n] / du[n], 2) for n in du if du[n] > 0},
        "ingest_bucketed_layout_secs": ingest,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
