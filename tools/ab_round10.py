#!/usr/bin/env python
"""Round-10 paired A/B the round-9 verdict assigned (item #1): the
d03_cosine_topk literal-vector codegen UNROLL vs the HOF-fold it
replaced, interleaved run-by-run in ONE session per scale factor so
both legs share the JVM, page cache, and host-load window. d03 was
the one round-9 headline whose official number doubled (0.074 s →
0.157 s at sf0.1) in the same round its plan changed; the sf1 slope
window showed the unroll WINNING (0.24 → 0.15 s), so the open
question is whether the sf0.1 regression is window drift or a real
constant (plan/codegen) cost that only toy scale exposes.

Legs differ ONLY through ``SPARK_GRAFT_UNROLL`` (similarity.py's
measurement escape hatch; as of round 10 the FOLD is the default and
the unroll is the opt-in leg — this A/B is why); values are
bit-identical (both are left-to-right IEEE folds), asserted per pair.
ALL runs are reported, not just best-of: a one-time codegen cost
shows up as run[0] >> run[1:] on the unroll leg only.

VERDICT (run 2026-08-15, this tool + the three-way variant): fold
wins everywhere — sf0.1 fold 0.066 s vs unroll 0.132 s (0.184 s with
the dim guard); sf1 fold 0.082 s vs 0.121 s (0.717 s guarded). The
round-9 "unroll wins at sf1" was window drift. Full numbers in
BASELINE.md.

Prints one JSON line; the committed summary lives in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_CONF, cache_dimensions, relayout, warm_up  # noqa: E402
from etl_cortex_spark.queries import QUERIES  # noqa: E402
from etl_cortex_spark.session import get_spark  # noqa: E402
from tools.ab_round9 import _rows_equal  # noqa: E402

NAME = "d03_cosine_topk"
RUNS = 7  # a couple more than bench's 5: the first-run delta IS the signal


def _timed(spark, sf_dir: str) -> tuple[float, list[tuple]]:
    df = QUERIES[NAME](spark, sf_dir)
    t0 = time.perf_counter()
    rows = df.collect()  # k=10 rows — compare the legs' values
    return time.perf_counter() - t0, sorted(map(tuple, rows))


def ab_unroll(spark, sf_dir: str) -> dict:
    unrolled, fold = [], []
    for _ in range(RUNS):
        os.environ["SPARK_GRAFT_UNROLL"] = "1"
        ta, ha = _timed(spark, sf_dir)
        os.environ.pop("SPARK_GRAFT_UNROLL", None)
        tb, hb = _timed(spark, sf_dir)
        assert _rows_equal(ha, hb), "d03: unrolled and fold rows differ"
        unrolled.append(ta)
        fold.append(tb)
    os.environ.pop("SPARK_GRAFT_UNROLL", None)
    return {
        "unrolled_best": round(min(unrolled), 4),
        "fold_best": round(min(fold), 4),
        "unrolled_runs": [round(x, 4) for x in unrolled],
        "fold_runs": [round(x, 4) for x in fold],
        "speedup_best_unroll_over_fold": round(min(fold) / min(unrolled), 2),
    }


def main() -> None:
    from bench_slope import SF1_DIR, generate_sf1

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    result = {}

    # --- sf0.1 leg: bench.py's exact conf -------------------------------------
    sf01 = relayout(src)
    spark = get_spark(app_name="ab_round10_sf01", extra_conf=BENCH_CONF)
    spark.sparkContext.setLogLevel("ERROR")
    warm_up(spark)
    cache_dimensions(spark, sf01)
    result["sf0.1"] = {"d03_unroll_vs_fold": ab_unroll(spark, sf01)}
    spark.stop()

    # --- sf1 leg: bench_slope's cluster-default conf --------------------------
    if not os.path.isdir(SF1_DIR):
        generate_sf1()
    spark = get_spark(
        app_name="ab_round10_sf1",
        extra_conf={
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "10MB",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "50MB",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm_up(spark)
    cache_dimensions(spark, SF1_DIR)
    result["sf1"] = {"d03_unroll_vs_fold": ab_unroll(spark, SF1_DIR)}
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
