"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual inventory lives in ``etl_cortex_spark.queries`` — one
(Spark builder, DuckDB oracle SQL) pair per SURVEY.md §2 row.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_cortex_spark.queries import ORACLE, QUERIES  # noqa: E402

# The driver samples the first N registry entries per round, so the
# registry is served in a rotation (VERDICT.md round-1 next-round #1,
# continued every round):
#
#   1. entries with NO official CORRECTNESS record yet (streaming ones
#      first — they are the environment-sensitive tier),
#   2. entries whose implementation changed since their last record
#      (_REVERIFY_NOW, maintained by hand per round),
#   3. recorded entries, least-recently-verified first (round-3 ADVICE:
#      never pin recorded entries to the tail permanently, or a
#      regression in an old query would stay invisible forever).
#
# The record rounds are read from the committed CORRECTNESS_r*.json
# files at import, so this ordering updates itself every round with no
# hand-kept name lists.

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))

# Entries fixed/changed since their last green record → re-verify ASAP,
# mapped to the round the fix landed. The boost expires by itself once a
# CORRECTNESS file from that round (or later) records the entry again.
# Round 5: flagship/a13 swapped to the max_by-aggregate dedup, d36 runs
# degree-ordered orientation, d24 assignment got the NULL-vector
# contract, and the foreachBatch upsert moved to the version-pointer
# commit protocol.
_REVERIFY_NOW: dict[str, int] = {
    "flagship_events_medallion": 5,
    "a13_dedup_keep_latest": 5,
    "d36_triangle_count": 5,
    "d24_centroid_assign": 5,
    "stream_foreach_batch_upsert": 5,
    # second round-5 session: exact_dedup became a min-struct aggregate
    # (keep= payload narrowing), and q1/q5/c10/d04 final ORDER BY
    # became single-partition local sorts over bounded domains.
    "d01_exact_dedup": 5,
    "c17_tpch_q1": 5,
    "tpch_q3_shipping_priority": 5,
    "tpch_q5_local_supplier_volume": 5,
    "c10_join_inner_agg": 5,
    "d04_token_stats": 5,
    "d10_training_prep_pipeline": 5,
    # fourth round-5 session: the attribution join was refactored onto
    # the shared attribution_join core (inner semantics unchanged).
    "stream_stream_join": 5,
    # Round 6: c19's only record (r01) predates its epsilon oracle —
    # the oracle-paired form has never been officially recorded
    # (VERDICT r5 "What's missing" #3).
    "c19_approx_count_distinct": 6,
    # Round-6 fixes: c69 swapped its global window for agg+broadcast
    # crossJoin; d67 now excludes zero-token docs from ranking and
    # guards the integer weights against BIGINT overflow; d79 filters
    # degenerate (≤0-dim) assets; scale_incremental_join dropped the
    # forced broadcast hint on the delta key set (AQE decides).
    "c69_variant_semistructured": 6,
    "d67_dsir_select": 6,
    "d79_image_tile_plan": 6,
    "scale_incremental_join": 6,
    # bm25_topk's posting frame became a persisted inverted index
    # (plan-only change; both consumers re-verified at sf0.01).
    "d19_bm25_topk": 6,
    "d56_hybrid_rrf": 6,
    # b26's three ntile windows were data-sized global windows (the
    # c69 class, found by the round-6 repo-wide plan audit); swapped
    # to skew.global_ntile — hash-identical at all 3 SFs.
    "b26_rfm_segments": 6,
}


def _last_recorded_round() -> dict[str, int]:
    """name → highest round with an official CORRECTNESS row for it."""
    import glob
    import json
    import re

    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                names = json.load(f)
        except Exception:
            continue
        for n in names:
            last[n] = max(last.get(n, 0), rnd)
    return last


def _rotated(d: dict) -> dict:
    last = _last_recorded_round()
    names = list(d)

    def prio(idx_name):
        idx, name = idx_name
        if name not in last:  # never recorded: streams first, then registry order
            return (0, 0 if name.startswith("stream_") else 1, idx)
        if last[name] < _REVERIFY_NOW.get(name, 0):
            return (1, 0, idx)  # fixed after its last record → re-verify
        return (2, last[name], idx)  # least-recently-verified first

    ordered = sorted(enumerate(names), key=prio)
    return {name: d[name] for _, name in ordered}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_events_medallion"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _rotated(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; omitted keys get rows-only checks."""
    return _rotated(ORACLE)
