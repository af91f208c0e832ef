#!/usr/bin/env python
"""Round-11 paired A/Bs, re-runnable: (a) the d02_prefix_probe_pairs
trailing-sort variants (global orderBy vs repartition(1)+
sortWithinPartitions vs coalesce(1)+sortWithinPartitions), and (b) the
caching.track plan-dedupe effect on rep stability — both interleaved
run-by-run in ONE session so all legs share the JVM, page cache, and
host-load window (the only measurement this repo trusts; BASELINE.md).

VERDICT (run 2026-08-15, adopted in round 11):
- repartition(1)+sortWithinPartitions wins — best 0.451 s vs orderBy
  0.804 s, every interleaved rep faster. One hash exchange of ~280
  final rows replaces the range exchange plus its sampling job.
- coalesce(1) is WORSE than both (1.28 s): with no shuffle boundary it
  absorbs the verify join into a single task. The "avoid orderBy on
  tiny outputs" rule needs the repartition form whenever work sits
  between the last exchange and the sort.
- Pre-dedupe, BOTH legs degraded run-over-run (0.95 → ~1.5 s): every
  rebuild double-registered the same persisted plan in the track FIFO
  and aging duplicates unpersisted the ONE shared CacheManager entry.
  With the round-11 sameResult dedupe the traces are flat-to-falling;
  this tool prints ALL runs so the degradation shape (not just
  best-of) is visible on any re-run.

Prints one JSON line; the committed summary lives in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_CONF, cache_dimensions, relayout, warm_up  # noqa: E402
from etl_cortex_spark.operators import dedup as DD  # noqa: E402
from etl_cortex_spark.session import get_spark  # noqa: E402
from etl_cortex_spark.sources.tables import load_table  # noqa: E402

RUNS = 8

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build(spark, sf_dir: str, sort_mode: str):
    from pyspark.sql import functions as F  # noqa: N812

    docs = load_table(spark, sf_dir, "documents")
    existing = docs.select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.concat(F.lit("mutated "), F.col("text")).alias("text"),
    )
    out = DD.prefix_filter_probe(existing, new, threshold=0.5)
    if sort_mode == "orderBy":
        return out.orderBy("new_id", "existing_id")
    if sort_mode == "coalesce":
        return out.coalesce(1).sortWithinPartitions("new_id", "existing_id")
    return out.repartition(1).sortWithinPartitions("new_id", "existing_id")


def main() -> None:
    sf_dir = relayout(SF_DIR)
    spark = get_spark(app_name="ab_round11_sort", extra_conf=BENCH_CONF)
    spark.sparkContext.setLogLevel("ERROR")
    warm_up(spark)
    cache_dimensions(spark, sf_dir)
    modes = ("orderBy", "repart", "coalesce")
    rows_ref = None
    for m in modes:  # warm + value-parity check across legs
        rows = sorted(map(tuple, build(spark, sf_dir, m).collect()))
        if rows_ref is None:
            rows_ref = rows
        assert rows == rows_ref, f"leg {m} returned different rows"
    runs: dict[str, list[float]] = {m: [] for m in modes}
    for i in range(RUNS):
        order = modes if i % 2 == 0 else modes[::-1]
        for m in order:
            df = build(spark, sf_dir, m)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs[m].append(round(time.perf_counter() - t0, 4))
    spark.stop()
    print(
        json.dumps(
            {
                "query": "d02_prefix_probe_pairs trailing sort",
                "sf_dir": SF_DIR,
                "runs": runs,
                "best": {m: min(r) for m, r in runs.items()},
                "note": "interleaved, one JVM; identical rows asserted; "
                "flat traces require the round-11 track() plan-dedupe",
            }
        )
    )


if __name__ == "__main__":
    main()
