#!/usr/bin/env python
"""Round-9 paired A/Bs the round-7/8 verdicts assigned (one session per
scale factor, legs interleaved run-by-run so both share the same JVM,
page cache, and host-load window):

1. bucketed-vs-plain fact layout for tpch_q3 / tpch_q5 / c10 at sf0.1
   AND sf1 — leg B flips ``SPARK_GRAFT_NO_BUCKET`` so `bucketed_fact`
   serves the identical rows from the plain parquet scan (plan shape is
   the ONLY difference; results asserted equal per pair, with last-cent
   float tolerance — see ``_rows_equal``).
2. d56_hybrid_rrf with the bm25 posting persist registered in
   ``caching.track`` (the round-7 regression suspect) vs the same
   persist WITHOUT the FIFO (track patched to identity).

Prints one JSON line; the committed summary lives in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    BENCH_CONF,
    RUNS,
    build_layouts,
    cache_dimensions,
    relayout,
    warm_up,
)
from etl_cortex_spark.queries import QUERIES  # noqa: E402
from etl_cortex_spark.session import get_spark  # noqa: E402

AB_QUERIES = ["tpch_q3_shipping_priority", "tpch_q5_local_supplier_volume", "c10_join_inner_agg"]


def _timed(spark, name: str, sf_dir: str) -> tuple[float, list[tuple]]:
    df = QUERIES[name](spark, sf_dir)
    t0 = time.perf_counter()
    rows = df.collect()  # tiny results (<=25 rows); collect so we can compare
    dt = time.perf_counter() - t0
    return dt, sorted(map(tuple, rows))


def _rows_equal(a: list[tuple], b: list[tuple]) -> bool:
    """Per-pair result check with LAST-CENT tolerance on floats: a 2dp
    round of an ~1e8-magnitude money sum is plan-shape sensitive at the
    final ULP (measured at sf1: q5 NATION_12 71626750.04 vs .05 between
    the bucketed and plain aggregation orders — IEEE association, not a
    bug; the driver's sf0.01 oracle gate is unaffected). Keys and ints
    must match exactly."""
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if va is None or vb is None:
                # nullable aggregate columns: both-NULL is equal, a
                # NULL/float pair is a rows-differ verdict — not a
                # TypeError out of abs() (round-9 ADVICE)
                if not (va is None and vb is None):
                    return False
            elif isinstance(va, float) or isinstance(vb, float):
                if abs(va - vb) > 0.011:
                    return False
            elif va != vb:
                return False
    return True


def ab_bucketed(spark, sf_dir: str) -> dict:
    out = {}
    for name in AB_QUERIES:
        a, b = [], []
        for _ in range(RUNS):
            os.environ.pop("SPARK_GRAFT_NO_BUCKET", None)
            ta, ha = _timed(spark, name, sf_dir)
            os.environ["SPARK_GRAFT_NO_BUCKET"] = "1"
            tb, hb = _timed(spark, name, sf_dir)
            assert _rows_equal(ha, hb), f"{name}: bucketed and plain rows differ"
            a.append(ta)
            b.append(tb)
        os.environ.pop("SPARK_GRAFT_NO_BUCKET", None)
        out[name] = {
            "bucketed_best": round(min(a), 4),
            "plain_best": round(min(b), 4),
            "bucketed_runs": [round(x, 4) for x in a],
            "plain_runs": [round(x, 4) for x in b],
            "speedup_best": round(min(b) / min(a), 2),
        }
    return out


def ab_d56_track(spark, sf_dir: str) -> dict:
    from etl_cortex_spark.operators import caching, search

    name = "d56_hybrid_rrf"
    tracked, plain = [], []
    real_track = caching.track
    for _ in range(RUNS):
        search.track = real_track
        ta, ha = _timed(spark, name, sf_dir)
        search.track = lambda df: df  # persist stays, FIFO bypassed
        tb, hb = _timed(spark, name, sf_dir)
        assert _rows_equal(ha, hb), "d56: tracked and untracked rows differ"
        tracked.append(ta)
        plain.append(tb)
    search.track = real_track
    caching.release_all()
    return {
        "tracked_best": round(min(tracked), 4),
        "untracked_best": round(min(plain), 4),
        "tracked_runs": [round(x, 4) for x in tracked],
        "untracked_runs": [round(x, 4) for x in plain],
    }


def main() -> None:
    from bench_slope import SF1_DIR, generate_sf1

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    result = {}

    # --- sf0.1 leg: bench.py's exact conf -------------------------------------
    sf01 = relayout(src)
    spark = get_spark(app_name="ab_round9_sf01", extra_conf=BENCH_CONF)
    spark.sparkContext.setLogLevel("ERROR")
    warm_up(spark)
    cache_dimensions(spark, sf01)
    build_layouts(spark, sf01)
    result["sf0.1"] = {
        "bucketed_vs_plain": ab_bucketed(spark, sf01),
        "d56_track_vs_plain_persist": ab_d56_track(spark, sf01),
    }
    from etl_cortex_spark.operators.caching import release_all

    release_all()
    spark.stop()

    # --- sf1 leg: bench_slope's cluster-default conf --------------------------
    if not os.path.isdir(SF1_DIR):
        generate_sf1()
    spark = get_spark(
        app_name="ab_round9_sf1",
        extra_conf={
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "10MB",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "50MB",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm_up(spark)
    cache_dimensions(spark, SF1_DIR)
    build_layouts(spark, SF1_DIR)
    result["sf1"] = {"bucketed_vs_plain": ab_bucketed(spark, SF1_DIR)}
    release_all()
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
