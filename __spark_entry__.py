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
    # (Every earlier seed — through the round-15 snapshot-protocol
    # backlog — has a CORRECTNESS record at or after its seed round,
    # so all prior boosts expired and were removed. Round-10 verdict
    # #4 standing rule: keep this dict MINIMAL; the round-16 sample's
    # natural target is the r8-era least-recently-verified cohort
    # (round-15 verdict #3) and it must not be crowded out.)
    #
    # Round 16: d111's SEMANTICS changed — the trigram LM is capped to
    # the top-256 trigrams per language (bounded broadcast; the cap
    # binds at every test SF and the oracle reproduces it) and the
    # tercile is assigned by skew.grouped_ntile's two-phase census
    # instead of ntile OVER (PARTITION BY lang). Verified green
    # against the full sf0.01 oracle this session; seeded for an
    # official record on the new plan.
    "d111_ccnet_buckets": 16,
    # Round 16: d85's per-stratum rank moved from the windowed
    # row_number (single-tasks the dominant stratum — found by this
    # round's latent-skew sweep) to skew.grouped_rank's two-phase
    # census; values identical (exact rank), rank_in_stratum widened
    # to BIGINT in plan+oracle. Verified green against the sf0.01
    # oracle this session; seeded for an official record on the new
    # plan.
    "d85_curriculum_order": 16,
    # (The four round-16 seeds — d111/d85/d103/d17 — all have green
    # CORRECTNESS_r16 records, so those boosts expired and were
    # removed.)
    #
    # Round 17: the snapshot protocol's ON-DISK METADATA changed —
    # commits now write immutable per-batch SEGMENT files referenced
    # by a small manifest list (O(batch) commit metadata, the round-16
    # weak flag), with pre-17 inline manifests still readable and
    # migrated on their next commit. Values identical everywhere, but
    # every entry that commits or resolves manifests runs on the new
    # grammar; all re-verified green against the full sf0.01 oracle
    # this session, seeded for official records on the new format.
    # Seed list sized so the round-15 verdict-#3 drain of the r9
    # least-recently-verified cohort (23 entries) still fits the
    # 50-sample rotation beside it: 21 seeds + 6 UNRECORDED new
    # round-17 entries (tier 0 of the rotation regardless) + 23 r9
    # = 50 (d02_containment_pairs, the 7th new entry, lands in the
    # same tier-0 pool; one r9 entry rolls to the next round's head —
    # acceptable). The WRITE-path entries (commit grammar changed) are
    # seeded; READ-only consumers of the resolved meta (postings/IVF
    # lookups, pruned scans, scan_multi, tags, rollback, history,
    # time travel) ride the normal rotation — they run against the
    # same resolver the seeded entries prove, and the full 355-entry
    # registry verified green against the sf0.01 oracle this session
    # anyway.
    "scale_snapshot_cow_delete": 17,
    "scale_snapshot_compact": 17,
    "scale_snapshot_compact_small_files": 17,
    "scale_snapshot_zorder_compact": 17,
    "scale_snapshot_merge": 17,
    "scale_snapshot_merge_mor": 17,
    "scale_snapshot_mor_delete": 17,
    "scale_snapshot_changes": 17,
    "scale_snapshot_changes_cdf": 17,
    "scale_snapshot_expire": 17,
    "scale_snapshot_schema_evolution": 17,
    "scale_snapshot_bloom_lookup": 17,
    "scale_snapshot_wap": 17,
    "scale_snapshot_partition_evolution": 17,
    "scale_snapshot_hidden_partitioning": 17,
    "scale_snapshot_row_lineage": 17,
    "stream_snapshot_ingest": 17,
    "stream_snapshot_wap": 17,
    "pyds_stream_snapshot_changes": 17,
    "stream_postings_ingest": 17,
    "stream_ivf_ingest": 17,
    # Round 17 NEW entries: position deletes (Iceberg v2's second MOR
    # delete form, keyless tables) and hash-trigram language ID (the
    # CCNet-chain completion). Both verified green against their full
    # sf0.01 oracles this session.
    "scale_snapshot_delete_pos": 17,
    "d113_lang_id": 17,
    "scale_snapshot_bucket_layout": 17,
    "stream_snapshot_upsert": 17,
    "d113_ccnet_chain": 17,
    "scale_snapshot_cdf_pos": 17,
    "d02_containment_pairs": 17,
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
