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
    # (Every round-18 seed was recorded green in CORRECTNESS_r18, so
    # every prior boost expired and was removed. Round-10 verdict #4
    # standing rule: keep this dict MINIMAL.)
    #
    # Round 19 NEW entries (unrecorded — tier 0 of the rotation
    # regardless; listed for the audit trail): tail across compaction
    # boundaries, the tail as a registered streaming DataSource, and
    # the IVF semantic-dedup probe + its ε-recall audit. All four
    # verified green against their DuckDB oracles at sf0.001 AND
    # sf0.01 this session.
    "stream_snapshot_tail_across": 19,
    "pyds_stream_snapshot_tail": 19,
    "d25_semantic_dedup_probe": 19,
    "d25_semantic_probe_recall": 19,
    "scale_snapshot_cdf_rollback": 19,
    "pyds_stream_snapshot_tail_dist": 19,
    "pyds_batch_snapshot_pruned": 19,
    "scale_snapshot_clone": 19,
    "scale_snapshot_rename": 19,
    "scale_snapshot_drop_column": 19,
    "scale_snapshot_constraints": 19,
    "scale_snapshot_analyze": 19,
    # snapshot_changes_cdf gained the file-drop retraction branch — its
    # direct oracle entry re-verifies the edited function end-to-end.
    "scale_snapshot_changes_cdf": 19,
    # Round 19 MODIFIED write/read paths: tiered AUTO segment
    # consolidation runs inside snapshot_append / snapshot_merge_mor /
    # snapshot_publish (tail planning gained the file-level fallback
    # for consolidated name lists), snapshot_compact stamps
    # `operation: compact`, the recent_batches migration now
    # BACKFILLS pre-18 stamps (floor 0), and apply_cdf_to_rollup
    # validates _change_type. These exercise the edited functions
    # end-to-end — seeded for official records on the new code.
    "stream_snapshot_tail": 19,
    "stream_snapshot_tail_mv": 19,
    "scale_snapshot_cdf_mv": 19,
    "stream_snapshot_ingest": 19,
    "stream_snapshot_upsert": 19,
    "stream_snapshot_wap": 19,
    "scale_snapshot_compact": 19,
    "scale_snapshot_zorder_compact": 19,
    "scale_snapshot_compact_small_files": 19,
    # Round 19 guard-state change (bounded applied.json replacing
    # one-file-per-batch): every apply_merge_commit-protocol sink.
    "stream_foreach_batch_upsert": 19,
    "stream_cms_sketch": 19,
    "stream_bloom_membership": 19,
    "stream_hll_distinct": 19,
    "stream_kmv_quantile": 19,
    # Round 19 OPTIMIZATION pass: gram repetition signals rewritten
    # sort+run-length (textops.top_ngram_frac / dup_ngram_frac, exact
    # equality pinned old-vs-new) — re-verify the one entry built on
    # them end-to-end.
    "d04_repetition_signals": 19,
    # Round 19 OPTIMIZATION pass: c19 split into two aggregates (the
    # acd+countDistinct Expand pathology), fuzzy_join refine-before-
    # distinct + probe-spread repartition.
    "c19_approx_count_distinct": 19,
    "d26_fuzzy_entity_match": 19,
    "d31_entity_clusters": 19,
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
