#!/usr/bin/env python
"""Round-17 probes (BASELINE.md methodology, best-of-3 per leg):

1. **New-operator slope probe** — `scale_snapshot_delete_pos` (entire
   lifecycle: 2 appends + pos delete + eq delete + re-append + full
   compact + 4 version reads) and `d113_lang_id` (train + classify +
   confusion matrix), sf0.1 → the replicated sf1.
2. **Segment-consolidation probe** — build a 60-commit table at each
   SF, measure `snapshot_rewrite_segments` wall time and the head
   manifest bytes before/after (the metadata job must stay
   driver-JSON-cheap and SF-independent).

Usage: python tools/probe_r17.py → one JSON line.
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


def consolidation_probe(spark, sf_dir: str) -> dict:
    import glob
    import shutil
    import tempfile

    from etl_cortex_spark.operators.layout import (
        snapshot_append,
        snapshot_meta,
        snapshot_rewrite_segments,
    )
    from etl_cortex_spark.sources.tables import load_table

    path = os.path.join(tempfile.gettempdir(), "r17_consol")
    shutil.rmtree(path, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    for i in range(60):
        snapshot_append(
            spark,
            orders.filter(F.col("o_orderkey") % 60 == i).coalesce(1),
            path,
            stats_col="o_orderkey",
        )
    head = sorted(
        glob.glob(os.path.join(path, "v*.manifest.json")),
        key=lambda m: int(os.path.basename(m).split(".")[0][1:]),
    )[-1]
    before = os.path.getsize(head)
    t0 = time.perf_counter()
    v = snapshot_rewrite_segments(path)
    secs = round(time.perf_counter() - t0, 3)
    after = os.path.getsize(os.path.join(path, f"v{v}.manifest.json"))
    n = snapshot_meta(path)["files"]
    shutil.rmtree(path, ignore_errors=True)
    return {
        "manifest_bytes_before": before,
        "manifest_bytes_after": after,
        "consolidate_secs": secs,
        "n_files": len(n),
    }


def main():
    if not os.path.isdir(os.path.join(SF1, "documents.parquet")):
        from bench_slope import generate_sf1

        generate_sf1()
    spark = get_spark(app_name="probe_r17")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"slope_probe": {}, "consolidation": {}}
    for sf_name, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        for entry in ("scale_snapshot_delete_pos", "d113_lang_id"):
            t = best_of(3, lambda e=entry, d=sf_dir: QUERIES[e](spark, d).collect())
            out["slope_probe"].setdefault(entry, {})[sf_name] = t
        out["consolidation"][sf_name] = consolidation_probe(spark, sf_dir)
    for entry, legs in out["slope_probe"].items():
        legs["slope"] = round(legs["sf1"] / legs["sf0.1"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
