#!/usr/bin/env python
"""Round-13 A/B: explain d56_hybrid_rrf's +40% (0.154 → 0.216 s,
BENCH_r11→r12) with NO code change in operators/search.py. Hypotheses
(round-12 verdict, What's wrong #1):

  (a) the round-12 reorder of build_layouts BEFORE cache_dimensions in
      bench.main() changed cache/eviction interleaving;
  (b) host noise (the r12 window measured scheduler floors 1.7× the
      r11 window's).

Design: ONE process per setup-order variant, alternated A/B/A/B across
processes (each process pays its own JVM + setup, then times d56 and a
d03_cosine_topk CONTROL back-to-back, interleaved rep-by-rep). If (a),
d56 splits by variant while the control holds. If (b), both variants
move together and the control moves with them.

Usage: python tools/ab_round13.py [r12|r11]   # one variant per process
       python tools/ab_round13.py             # orchestrate 2×2 procs
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 6


def one_process(order: str) -> None:
    from bench import BENCH_CONF, build_layouts, cache_dimensions, relayout, warm_up
    from etl_cortex_spark.queries import QUERIES
    from etl_cortex_spark.session import get_spark

    sf_dir = relayout(SF_DIR)
    spark = get_spark(app_name=f"ab13_{order}", extra_conf=BENCH_CONF)
    spark.sparkContext.setLogLevel("ERROR")
    warm_up(spark)
    if order == "r12":
        build_layouts(spark, sf_dir)
        cache_dimensions(spark, sf_dir)
    else:  # r11 ordering
        cache_dimensions(spark, sf_dir)
        build_layouts(spark, sf_dir)

    def timed(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        return time.perf_counter() - t0

    # one warm rep each (plan compile + code-gen), then timed reps
    timed("d56_hybrid_rrf")
    timed("d03_cosine_topk")
    d56, ctrl = [], []
    for _ in range(REPS):
        d56.append(round(timed("d56_hybrid_rrf"), 4))
        ctrl.append(round(timed("d03_cosine_topk"), 4))
    print(json.dumps({"order": order, "d56": d56, "ctrl": ctrl}))


def main() -> None:
    if len(sys.argv) > 1:
        one_process(sys.argv[1])
        return
    results = []
    for order in ["r12", "r11", "r12", "r11"]:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), order],
            capture_output=True,
            text=True,
            check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
        print(line, flush=True)
    agg: dict[str, dict[str, list[float]]] = {}
    for r in results:
        a = agg.setdefault(r["order"], {"d56": [], "ctrl": []})
        a["d56"] += r["d56"]
        a["ctrl"] += r["ctrl"]
    summary = {
        o: {
            "d56_best": min(v["d56"]),
            "d56_med": sorted(v["d56"])[len(v["d56"]) // 2],
            "ctrl_best": min(v["ctrl"]),
            "ctrl_med": sorted(v["ctrl"])[len(v["ctrl"]) // 2],
        }
        for o, v in agg.items()
    }
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
