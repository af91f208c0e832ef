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
# The round-5/6 backlog was fully consumed by CORRECTNESS_r06 (r6
# verdict #2), so the dict was emptied and re-seeded with round-7
# changes only — the rotation below is otherwise purely
# least-recently-verified.
_REVERIFY_NOW: dict[str, int] = {
    # (The round-10 backlog — the 17 fold-reversal / plan-change
    # entries — was fully consumed by CORRECTNESS_r10: every seeded
    # name has an r10 record, so the boosts expired and were removed.
    # Round-10 verdict #4: keep this dict MINIMAL so the rotation's
    # least-recently-verified tail — the 41-entry r5 cohort — gets the
    # round's remaining sample slots.)
    #
    # (The round-11 seeds — d02_group_rep_pairs, d02_prefix_probe_pairs
    # — both have green r11 records, so their boosts expired.)
    #
    # Round-11 verdict #3: the 10 entries whose latest driver record
    # still dates to r5 — six rounds of plan drift ago. No code change;
    # seeded so CORRECTNESS_r12 refreshes every one and no entry's
    # latest record predates r6.
    "d81_exact_stratified_split": 12,
    "pyds_synthetic_docs_scan": 12,
    "pyds_stream_synthetic_docs": 12,
    "scale_cms_frequency": 12,
    "scale_file_skipping": 12,
    "scale_heavy_hitters_two_scan": 12,
    "scale_sample_quantile_rollup": 12,
    "sink_parquet_schema_evolution": 12,
    "tpch_q11_important_stock": 12,
    "tpch_q16_parts_supplier_relationship": 12,
    # Round 12: weighted_priority_sample's conv() now carries an
    # explicit cast-to-bigint (ADVICE #4) — identical value, new
    # expression; re-verify its entry on the new plan.
    "d52b_weighted_priority_sample": 12,
    # Round 12: q5 reads the conformed supplier_geo dim (one broadcast
    # instead of three) — identical rows, new plan shape.
    "tpch_q5_local_supplier_volume": 12,
    # Round-12 verdict #6: the 3 entries whose latest driver record
    # still dates to r6 (now the oldest cohort). No code change; seeded
    # so CORRECTNESS_r13 refreshes them and no record predates r8.
    "scale_dynamic_partition_pruning": 13,
    "scale_incremental_join": 13,
    "tpch_q20_potential_promotion": 13,
    # Round 13: unigram piece costs clamped at 0 (ADVICE #4) —
    # identical values at test scale, new expression in plan+oracle.
    "d58_unigram_em": 13,
    # Round 14: d101's entry now pins n_planes=6 explicitly (the
    # operator default self-sizes), d106's oracle LEFT JOINs the
    # encoded side (ADVICE #5) — both re-verified this session, seeded
    # for an official record. Kept minimal on purpose: the rotation's
    # natural next sample is the 27-entry r7 cohort (round-13 verdict
    # #3) and it must not be crowded out.
    "d101_bitext_margin": 14,
    "d106_encode_to_ids": 14,
    # Round 15: the ADVICE-fix + merge-on-read wave through
    # operators/layout.py touched every snapshot read/maintenance path
    # (newest-file schema resolution, legacy-stats scoping, Bloom
    # NULL/type contract, orphan sweep + batch ledger, MOR delete
    # resolution on all read paths). All re-verified green against the
    # full sf0.01 oracle this session; seeded for official records on
    # the new plans.
    "scale_snapshot_time_travel": 15,
    "scale_snapshot_cow_delete": 15,
    "scale_snapshot_pruned_scan": 15,
    "scale_snapshot_scan_multi": 15,
    "scale_snapshot_bloom_lookup": 15,
    "scale_snapshot_changes": 15,
    "scale_snapshot_rollback": 15,
    "scale_snapshot_expire": 15,
    "scale_snapshot_merge": 15,
    "scale_snapshot_compact": 15,
    "scale_snapshot_schema_evolution": 15,
    "scale_changes_downstream_agg": 15,
    "stream_snapshot_ingest": 15,
    "stream_postings_ingest": 15,
    "stream_ivf_ingest": 15,
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
