"""Round-19 protocol pins: tiered auto segment consolidation, tail
across compaction boundaries, the bounded foreachBatch guard state,
the recent_batches migration backfill, and the round-18 ADVICE soft
edges (loud cursor errors, CDF tag validation, seed re-target guard,
empty-version schema guard)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

import etl_cortex_spark.operators.layout as L


def _head_raw(path: str) -> dict:
    return L._load_raw(L._manifests(path)[-1])


def _row_df(spark, i: int):
    # spark.range, not createDataFrame: a LocalTableScan+coalesce(1)
    # write costs ~5 s/job in this environment (measured round 19);
    # the JVM-side range is ~0.3 s and keeps the 200-append pin cheap
    return spark.range(i, i + 1).selectExpr("id as k", "id * 10 as v")


@pytest.mark.slow
def test_auto_consolidation_bounds_segments_and_commit_bytes(spark, tmp_path):
    """The r18 verdict's lead item, pinned: across 200 one-file
    appends the head's segment-NAME list stays tiered-bounded (never
    ~200), the manifest stays KB-sized (commit bytes flat, not
    O(commits)), reads and time travel stay exact, and a tail
    consumer pulling through consolidation commits drains every row
    exactly once."""
    path = str(tmp_path / "tbl")
    state = str(tmp_path / "cursor.json")
    n = 200
    max_segs = 0
    max_manifest_bytes = 0
    drained = 0
    for i in range(n):
        L.snapshot_append(spark, _row_df(spark, i), path)
        raw = _head_raw(path)
        max_segs = max(max_segs, len(raw["segments"]))
        max_manifest_bytes = max(
            max_manifest_bytes, os.path.getsize(L._manifests(path)[-1])
        )
        if i % 23 == 11:
            # the pull window spans consolidation commits — the
            # file-level fallback must deliver, not refuse
            df, lo, hi, ack = L.snapshot_tail(spark, path, state)
            drained += df.count()
            ack()
    df, lo, hi, ack = L.snapshot_tail(spark, path, state)
    drained += df.count()
    ack()
    assert drained == n, "tail through consolidation lost or doubled rows"
    # tiered bound: fanout + a logarithmic number of tiers, NOT O(n).
    # For 200 one-file batches at fanout 8 the observed peak is ~11;
    # 2*fanout is the generous structural ceiling.
    assert max_segs <= 2 * L._SEG_AUTO_FANOUT, max_segs
    assert max_manifest_bytes < 8192, max_manifest_bytes
    # correctness end-to-end: every appended row is live exactly once
    got = L.snapshot_read(spark, path)
    assert got.count() == n
    assert got.agg(F.sum("k")).first()[0] == n * (n - 1) // 2
    # time travel to a mid version still resolves (old segments remain
    # on disk for the manifests that reference them)
    assert L.snapshot_read(spark, path, version=97).count() == 97
    # the maintenance collapse still composes on top
    v = L.snapshot_rewrite_segments(path)
    assert len(_head_raw(path)["segments"]) == 1
    assert L.snapshot_read(spark, path, version=v).count() == n


def test_auto_consolidation_keeps_stats_blooms_and_mor_deletes(spark, tmp_path):
    """Consolidation must merge zone maps and Blooms losslessly and
    leave pending MOR delete coverage intact: after enough stats+bloom
    appends to trigger merges, point lookups still prune and a
    pre-consolidation equality delete still hides its rows."""
    path = str(tmp_path / "tbl")
    for i in range(9):
        df = spark.range(i * 10, i * 10 + 5).selectExpr(
            "id as k", f"'u{i}' as u"
        ).coalesce(1)
        L.snapshot_append(spark, df, path, stats_col="k", bloom_col="u")
    raw = _head_raw(path)
    assert len(raw["segments"]) < 9, "expected at least one auto-merge"
    meta = L.snapshot_meta(path)
    # stats/Blooms survived the merge for every file
    assert len(meta["stats"]) == len(meta["files"])
    assert len(meta["blooms"]["u"]) == len(meta["files"])
    # zone-map pruning still plans from the merged segment: [42, 43]
    # lives in batch 4's file only — one input file, two rows
    out = L.snapshot_scan(spark, path, "k", 42, 43)
    assert sorted(r["k"] for r in out.collect()) == [42, 43]
    assert len(out.inputFiles()) == 1
    # a MOR delete whose applies_to_segments names PRE-consolidation
    # segments keeps retracting after further consolidating appends
    assert L.snapshot_delete_mor(spark, path, F.col("k") < 3, "k") > 0
    for i in range(9, 18):
        df = spark.range(i * 10, i * 10 + 5).selectExpr(
            "id as k", f"'u{i}' as u"
        ).coalesce(1)
        L.snapshot_append(spark, df, path, stats_col="k", bloom_col="u")
    live = L.snapshot_read(spark, path)
    assert live.filter(F.col("k") < 3).count() == 0
    assert live.count() == 18 * 5 - 3


def test_tail_across_compaction_pytest_windows(spark, tmp_path):
    """The across_compaction crossing, against the refusal matrix:
    (a) drains pre-compact backlog + post-compact appends exactly
    once, (b) max_files still cuts inside an append window, (c) a
    compaction that APPLIED pending MOR deletes refuses loudly."""
    path = str(tmp_path / "tbl")
    state = str(tmp_path / "cur.json")
    for i in range(3):
        L.snapshot_append(spark, _row_df(spark, i), path)
    df, _, hi, ack = L.snapshot_tail(spark, path, state)
    assert df.count() == 3
    ack()
    L.snapshot_append(spark, _row_df(spark, 3), path)
    L.snapshot_compact(spark, path)
    L.snapshot_append(spark, _row_df(spark, 4), path)
    L.snapshot_append(spark, _row_df(spark, 5), path)
    # (b) rate limit: first across-pull cuts inside the pre-compact
    # window (1 file), cursor lands on a version boundary
    df1, lo1, hi1, ack1 = L.snapshot_tail(
        spark, path, state, across_compaction=True, max_files=1
    )
    assert df1.count() == 1 and df1.first()["k"] == 3
    ack1()
    # (a) next across-pull crosses the boundary and drains the rest
    df2, lo2, hi2, ack2 = L.snapshot_tail(
        spark, path, state, across_compaction=True
    )
    assert sorted(r["k"] for r in df2.collect()) == [4, 5]
    ack2()
    # cursor is at head: empty pull
    df3, lo3, hi3, _ = L.snapshot_tail(
        spark, path, state, across_compaction=True
    )
    assert df3.count() == 0 and lo3 == hi3
    # (c) delete-set changes INSIDE a window still refuse (the
    # added-files feed cannot represent a retraction) — but a compact
    # that merely APPLIES deletes pending since before the cursor is
    # crossed safely: the sequence rule scopes those entries to
    # pre-cursor files, so no undrained row is touched.
    path2 = str(tmp_path / "tbl2")
    state2 = str(tmp_path / "cur2.json")
    for i in range(2):
        L.snapshot_append(spark, _row_df(spark, i), path2)
    dv = L.snapshot_delete_mor(spark, path2, F.col("k") == 0, "k")
    L.snapshot_compact(spark, path2)  # applies + clears the delete
    L.snapshot_append(spark, _row_df(spark, 9), path2)
    # a window containing the MOR-delete step refuses on the delete
    L.snapshot_tail_seed(path2, state2, dv - 1)
    with pytest.raises(ValueError, match="merge-on-read delete set"):
        L.snapshot_tail(spark, path2, state2, across_compaction=True)
    # a consumer seeded AT the delete version crosses the applying
    # compact and receives exactly the post-compact append
    L.snapshot_tail_seed(path2, state2, dv)
    dfp, lop, hip, ackp = L.snapshot_tail(
        spark, path2, state2, across_compaction=True
    )
    assert sorted(r["k"] for r in dfp.collect()) == [9]
    ackp()


def test_tail_changes_across_compaction_mv_parity(spark, tmp_path):
    """CDF tail across a compaction: a continuously maintained rollup
    folded through the boundary equals the from-scratch aggregate —
    the compact step contributes zero delta."""
    from etl_cortex_spark.operators.mv import apply_cdf_to_rollup, build_rollup

    path = str(tmp_path / "tbl")
    state = str(tmp_path / "cur.json")
    rows = spark.range(30).selectExpr(
        "id as k", "id % 3 as g", "id * 2 as x"
    )
    L.snapshot_append(spark, rows.filter(F.col("k") < 10), path)
    seed, _, _, ack = L.snapshot_tail_changes(spark, path, state)
    mv = apply_cdf_to_rollup(
        build_rollup(seed.drop("_change_type").limit(0), ["g"], ["x"]),
        seed, ["g"], ["x"],
    )
    ack()
    # the adversarial schedule: append + MOR delete + a compact that
    # APPLIES the pending delete + another append — ONE across-pull
    # spans all of it; the delete's retractions arrive at the delete
    # step and the applying compact is a zero-delta crossing
    L.snapshot_append(
        spark, rows.filter((F.col("k") >= 10) & (F.col("k") < 20)), path
    )
    L.snapshot_delete_mor(spark, path, F.col("k") % 5 == 0, "k")
    L.snapshot_compact(spark, path)
    L.snapshot_append(spark, rows.filter(F.col("k") >= 20), path)
    pull, _, _, ack2 = L.snapshot_tail_changes(
        spark, path, state, across_compaction=True
    )
    mv = apply_cdf_to_rollup(mv, pull, ["g"], ["x"])
    ack2()
    got = {r["g"]: (r["__n"], r["__sum_x"]) for r in mv.collect()}
    # survivors: the delete named k%5==0 but covers only files present
    # at ITS commit (k < 20); the later k >= 20 multiples keep rows
    want = {
        r["g"]: (r["n"], r["s"])
        for r in rows.filter(~((F.col("k") % 5 == 0) & (F.col("k") < 20)))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
        .collect()
    }
    assert got == want


def test_mv_unknown_change_type_raises(spark):
    """r18 ADVICE #3: a foreign CDF tag must fail the fold loudly,
    never sign as +1."""
    from etl_cortex_spark.operators.mv import apply_cdf_to_rollup, build_rollup

    base = spark.createDataFrame([(1, 10)], "g int, x int")
    mv = build_rollup(base, ["g"], ["x"])
    bad = spark.createDataFrame(
        [(1, 5, "update_preimage")], "g int, x int, _change_type string"
    )
    with pytest.raises(Exception, match="unexpected _change_type"):
        apply_cdf_to_rollup(mv, bad, ["g"], ["x"]).collect()


def test_cursor_soft_edges(spark, tmp_path):
    """r18 review items: malformed cursor state raises a contract
    ValueError (not KeyError); re-seeding a cursor that belongs to a
    different table refuses without force=True; an empty version's
    schema resolve raises the clear contract error."""
    path = str(tmp_path / "tbl")
    other = str(tmp_path / "other")
    L.snapshot_append(spark, _row_df(spark, 1), path)
    L.snapshot_append(spark, _row_df(spark, 2), other)
    state = str(tmp_path / "cur.json")
    with open(state, "w") as f:
        json.dump({"table": os.path.abspath(path)}, f)  # no version key
    with pytest.raises(ValueError, match="malformed"):
        L.snapshot_tail(spark, path, state)
    # live cursor for `path`; seeding it with `other` must refuse
    L.snapshot_tail_seed(path, state, 1)
    with pytest.raises(ValueError, match="force=True"):
        L.snapshot_tail_seed(other, state, 1)
    L.snapshot_tail_seed(other, state, 1, force=True)  # deliberate
    assert L._read_cursor(state, other, "t") == 1
    # empty-files schema guard (the bare-IndexError class)
    with pytest.raises(ValueError, match="no data files"):
        L._version_schema(spark, [])


def test_recent_batches_migration_backfill(spark, tmp_path):
    """r18 ADVICE #4: the FIRST commit on a pre-18 table (manifests
    without recent_batches) backfills every surviving batch stamp into
    the map with floor 0 — misses conclude O(1) from then on, and an
    old batch replay still resolves to its original version."""
    path = str(tmp_path / "tbl")
    os.makedirs(path)
    # hand-build a pre-18 INLINE history with batch stamps
    staged = str(tmp_path / "d")
    _row_df(spark, 0).write.parquet(staged)
    f = [os.path.join(staged, n) for n in os.listdir(staged) if n.endswith(".parquet")]
    for v, bid in ((1, 100), (2, 101), (3, None)):
        meta = {"version": v, "files": f}
        if bid is not None:
            meta["batch_id"] = bid
        with open(os.path.join(path, f"v{v}.manifest.json"), "w") as fh:
            json.dump(meta, fh)
    # the migration commit
    L.snapshot_append(spark, _row_df(spark, 9), path, batch_id=200)
    head = _head_raw(path)
    assert head["recent_batches"] == {"100": 1, "101": 2, "200": 4}
    assert head.get("recent_batches_floor", 0) == 0
    # a replay of a pre-migration batch is a ledger no-op at its
    # original version; an unknown id concludes absent without a walk
    assert L.snapshot_batch_version(path, 101) == 2
    assert L.snapshot_batch_version(path, 999) is None
    assert L.snapshot_append(spark, _row_df(spark, 1), path, batch_id=100) == 1


@pytest.mark.slow
def test_guard_state_bounded_and_replay_noop(spark, tmp_path):
    """The r18 verdict's guard_dir item, pinned: across 100 committed
    micro-batches the guard directory holds ONE state file (constant
    inodes, never one per batch), replay of any recent id is a no-op,
    floor-evicted ids still read as applied, and legacy per-batch
    guard files migrate in and are removed."""
    from etl_cortex_spark.streaming.ingest import (
        apply_merge_commit,
        arm_guard,
        disarm_guard,
        guard_applied,
    )

    table_dir = str(tmp_path / "table")
    guard_dir = str(tmp_path / "guards")
    os.makedirs(table_dir)
    os.makedirs(guard_dir)

    def merge(prev, batch):
        return prev.unionByName(batch) if prev is not None else batch

    df = spark.range(1).selectExpr("id as k")
    n = 100
    for i in range(n):
        apply_merge_commit(spark, df, i, table_dir, guard_dir, merge)
    assert os.listdir(guard_dir) == ["applied.json"], "one inode, ever"
    assert spark.read.parquet(
        os.path.join(table_dir, f"v{n - 1:020d}")
    ).count() == n
    # replay of a recent id: no-op (count unchanged)
    apply_merge_commit(spark, df, n - 1, table_dir, guard_dir, merge)
    assert spark.read.parquet(
        os.path.join(table_dir, f"v{n - 1:020d}")
    ).count() == n
    # ids evicted past the cap are floor-covered: still applied
    state = json.load(open(os.path.join(guard_dir, "applied.json")))
    assert len(state["batches"]) <= 64
    assert state["floor"] >= 0
    assert guard_applied(guard_dir, 0) and guard_applied(guard_dir, state["floor"])
    assert not guard_applied(guard_dir, n + 7)
    # disarm/re-arm round-trip (the crash-window test hook)
    disarm_guard(guard_dir, n - 1)
    assert not guard_applied(guard_dir, n - 1)
    arm_guard(guard_dir, n - 1)
    assert guard_applied(guard_dir, n - 1)
    # legacy per-batch files (a pre-19 checkpoint) migrate on the next
    # arm and the inodes disappear
    legacy_dir = str(tmp_path / "legacy_guards")
    os.makedirs(legacy_dir)
    for i in (3, 4, 5):
        open(os.path.join(legacy_dir, str(i)), "w").close()
    assert guard_applied(legacy_dir, 4)  # readable before migration
    arm_guard(legacy_dir, 6)
    assert os.listdir(legacy_dir) == ["applied.json"]
    for i in (3, 4, 5, 6):
        assert guard_applied(legacy_dir, i)


def test_upsert_full_state_size_warns(spark, tmp_path, monkeypatch):
    """The sink-choice guardrail: once the keep-latest snapshot
    exceeds the documented threshold, the next merge warns once,
    pointing at the O(batch) MOR sink."""
    import etl_cortex_spark.streaming.ingest as ING

    monkeypatch.setattr(ING, "_FULL_STATE_WARN_BYTES", 1)
    monkeypatch.setattr(ING, "_WARNED_TABLES", set())
    table_dir = str(tmp_path / "table")
    guard_dir = str(tmp_path / "guards")
    os.makedirs(table_dir)
    os.makedirs(guard_dir)
    df = spark.range(1).selectExpr(
        "id as user_id", "id as seq", "cast(id as double) as v"
    )
    ING.apply_upsert_batch(spark, df, 0, table_dir, guard_dir, ["user_id"], ["seq"])
    with pytest.warns(UserWarning, match="foreach_batch_merge_mor"):
        ING.apply_upsert_batch(
            spark, df, 1, table_dir, guard_dir, ["user_id"], ["seq"]
        )


def test_ivf_probe_reads_only_touched_cells(spark, tmp_path):
    """Plan pin for `similarity.ivf_probe_near_dups` (round 19): the
    index side of the probe scans ONLY the batch's cell directories —
    the __bucket isin literal must reach the parquet scan as a
    partition filter, pruning untouched cells."""
    from etl_cortex_spark.operators import similarity as SIM

    emb = spark.createDataFrame(
        [(i, [float(i % 7) - 3.0, float(i % 5) - 2.0, 1.0, -1.0]) for i in range(40)],
        "vec_id bigint, embedding array<double>",
    )
    path = str(tmp_path / "ivf")
    SIM.write_ivf_index(emb, path, n_planes=4, seed=7)
    batch = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100).alias("vec_id"), "embedding"
    )
    out = SIM.ivf_probe_near_dups(
        spark, path, batch, threshold=0.99, n_planes=4, seed=7
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__bucket" in plan
    # the scan must carry a partition filter on __bucket (values from
    # the batch's cells), not read the full index
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "__bucket" in seg and seg.strip() != ""
    # and the probe flags exactly the self-duplicates
    flagged = sorted(r["vec_id"] for r in out.collect())
    assert flagged == [100, 110, 120, 130]


def test_cdf_file_drop_rollback_retraction(spark, tmp_path):
    """Round-19 file-drop CDF branch: a rollback of appends delivers
    the dropped files' rows as deletes (exactly once, alongside later
    inserts); a rollback PAST a rewrite still refuses."""
    path = str(tmp_path / "tbl")
    L.snapshot_append(spark, spark.range(0, 5).selectExpr("id as k"), path)
    L.snapshot_append(spark, spark.range(5, 8).selectExpr("id as k"), path)
    L.snapshot_rollback(spark, path, to_version=1)          # v3
    L.snapshot_append(spark, spark.range(8, 10).selectExpr("id as k"), path)
    got = [
        (r["k"], r["_change_type"])
        for r in L.snapshot_changes_cdf(spark, path, 2, 4).collect()
    ]
    assert sorted(k for k, t in got if t == "delete") == [5, 6, 7]
    assert sorted(k for k, t in got if t == "insert") == [8, 9]
    assert len(got) == 5  # exactly-once
    # rollback past a COMPACT rewrites the file set in both directions
    # (drops the compacted file, restores originals) — refuses
    L.snapshot_compact(spark, path)                          # v5
    L.snapshot_rollback(spark, path, to_version=4)           # v6
    with pytest.raises(ValueError, match="rewrites data files"):
        L.snapshot_changes_cdf(spark, path, 4, 6).collect()


def test_consolidation_migrates_pre19_segment_backlog(spark, tmp_path):
    """A table that accumulated one segment per commit before the
    auto-tiering existed (the pre-19 shape) collapses on its FIRST
    post-upgrade growing commit: the greedy suffix swallows the whole
    equal-sized backlog in one merge."""
    path = str(tmp_path / "tbl")
    orig = L._SEG_AUTO_FANOUT
    L._SEG_AUTO_FANOUT = 10 ** 9  # build the legacy shape: no merging
    try:
        for i in range(30):
            L.snapshot_append(spark, _row_df(spark, i), path)
    finally:
        L._SEG_AUTO_FANOUT = orig
    assert len(_head_raw(path)["segments"]) == 30
    L.snapshot_append(spark, _row_df(spark, 30), path)
    assert len(_head_raw(path)["segments"]) == 1
    got = L.snapshot_read(spark, path)
    assert got.count() == 31
    assert got.agg(F.sum("k")).first()[0] == 31 * 30 // 2


def test_consolidation_lost_race_drops_merged_segment(spark, tmp_path, monkeypatch):
    """No-orphan convention for the consolidation tier: an append that
    writes a merged segment and then loses the commit race must not
    strand it — the retry (or abandon) removes the never-referenced
    file, and the winning retry's own merge is referenced."""
    path = str(tmp_path / "tbl")
    for i in range(L._SEG_AUTO_FANOUT - 1):
        L.snapshot_append(spark, _row_df(spark, i), path)
    # the next append triggers a merge; make its FIRST commit attempt
    # lose a simulated race (a concurrent writer takes the version
    # with ITS OWN state — a metadata-only commit carrying the head)
    head_segments = list(_head_raw(path)["segments"])
    real_commit = L._commit_manifest
    state = {"failed": False}

    def racy(path_, version, meta):
        if not state["failed"]:
            state["failed"] = True
            real_commit(
                path_, version, {"version": version, "segments": head_segments}
            )
            raise L.SnapshotCommitConflict("simulated lost race")
        return real_commit(path_, version, meta)

    monkeypatch.setattr(L, "_commit_manifest", racy)
    L.snapshot_append(spark, _row_df(spark, 99), path)
    # every segment file on disk is referenced by SOME manifest
    # (no orphaned merge tiers), and the head resolves correctly
    referenced = set()
    for m in L._manifests(path):
        referenced |= set(L._load_raw(m).get("segments") or [])
    on_disk = {n for n in os.listdir(path) if n.startswith("seg-")}
    assert on_disk <= referenced, on_disk - referenced
    # fanout-1 seed appends + the racing one
    assert L.snapshot_read(spark, path).count() == L._SEG_AUTO_FANOUT


def test_expire_sweeps_superseded_consolidation_tiers(spark, tmp_path):
    """Auto-consolidation supersedes segments (older manifests still
    reference them); once retention drops those manifests,
    snapshot_expire must GC the dead tiers — consolidation garbage is
    bounded by retention, not accumulated forever."""
    path = str(tmp_path / "tbl")
    for i in range(20):
        L.snapshot_append(spark, _row_df(spark, i), path)
    n_before = len([n for n in os.listdir(path) if n.startswith("seg-")])
    L.snapshot_expire(spark, path, keep_last=1, orphan_grace_secs=0.0)
    live = set(_head_raw(path)["segments"])
    on_disk = {n for n in os.listdir(path) if n.startswith("seg-")}
    assert on_disk == live, "dead consolidation tiers must be GC'd"
    assert len(on_disk) < n_before
    got = L.snapshot_read(spark, path)
    assert got.count() == 20
    assert got.agg(F.sum("k")).first()[0] == 20 * 19 // 2


def test_snapshot_tail_dist_reader_plans_one_partition_per_file(spark, tmp_path):
    """The partition-parallel tail source's planner contract: one
    InputPartition per file added in the offset window (the
    executor-parallel scan unit), validated append-only; read() of a
    partition yields exactly its file's rows."""
    from etl_cortex_spark.sources.pyds import (
        make_snapshot_tail_stream_dist_source,
    )

    path = str(tmp_path / "tbl")
    for i in range(3):
        L.snapshot_append(spark, _row_df(spark, i), path)
    # instantiate the source directly (no engine): options + reader
    cls = make_snapshot_tail_stream_dist_source()
    inst = cls.__new__(cls)
    inst.options = {"path": path}
    reader = inst.streamReader(None)
    assert reader.initialOffset() == {"version": 0}
    head = reader.latestOffset()
    assert head == {"version": 3}
    parts = reader.partitions({"version": 0}, head)
    meta = L.snapshot_meta(path)
    assert len(parts) == len(meta["files"])
    # round 19: read() yields ARROW BATCHES (columnar boundary), not
    # per-row tuples — assert the contract and the row content
    import pyarrow as pa

    batches = [b for p in parts for b in reader.read(p)]
    assert all(isinstance(b, pa.RecordBatch) for b in batches)
    rows = [r for b in batches for r in b.to_pylist()]
    assert sorted(r["k"] for r in rows) == [0, 1, 2]
    # the incremental window plans only the delta's files
    L.snapshot_append(spark, _row_df(spark, 9), path)
    parts2 = reader.partitions({"version": 3}, reader.latestOffset())
    rows2 = [
        r for p in parts2 for b in reader.read(p) for r in b.to_pylist()
    ]
    assert [r["k"] for r in rows2] == [9]
    # a rewrite inside the window refuses
    L.snapshot_compact(spark, path)
    with pytest.raises(ValueError, match="not a pure append"):
        reader.partitions({"version": 4}, reader.latestOffset())


def test_snapshot_tail_dist_reader_aligns_drifted_schema(spark, tmp_path):
    """Round-19 Arrow-path pin: the executor-side batch build aligns
    BY NAME to the declared schema — a file missing a declared column
    (additive evolution: stream declared against the widened head)
    surfaces typed nulls, a file with a narrower physical type casts
    to the declared type, and extra physical columns are ignored.
    This is exactly the tuple path's rec.get(c) semantics, now pinned
    on the columnar path."""
    import pyarrow as pa

    from etl_cortex_spark.sources.pyds import (
        make_snapshot_tail_stream_dist_source,
    )

    path = str(tmp_path / "tbl")
    # v1: (k, v) — missing the later column w
    L.snapshot_append(
        spark, spark.range(0, 2).selectExpr("id as k", "id * 10 as v"), path
    )
    # v2: (k, v, w) — widened (additive evolution)
    L.snapshot_append(
        spark,
        spark.range(2, 3).selectExpr(
            "id as k", "id * 10 as v", "id * 100 as w"
        ),
        path,
    )
    cls = make_snapshot_tail_stream_dist_source()
    inst = cls.__new__(cls)
    inst.options = {"path": path}
    reader = inst.streamReader(None)  # declared = head schema (k, v, w)
    parts = reader.partitions({"version": 0}, reader.latestOffset())
    rows = sorted(
        (r for p in parts for b in reader.read(p) for r in b.to_pylist()),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in rows] == [0, 1, 2]
    assert [r["v"] for r in rows] == [0, 10, 20]
    # the pre-evolution rows carry NULL w; the new row carries its value
    assert [r["w"] for r in rows] == [None, None, 200]
    # every batch's arrow schema matches the declared column order/types
    for p in parts:
        for b in reader.read(p):
            assert b.schema.names == ["k", "v", "w"]
            assert b.schema.types == [pa.int64(), pa.int64(), pa.int64()]


def test_snapshot_batch_source_prunes_by_stats_and_blooms(spark, tmp_path):
    """The batch DataSource's pruning contract: pushFilters records
    conjuncts but returns every filter to Spark (prune-only, never
    claims evaluation); partitions() drops files the manifest zone
    maps / Blooms provably exclude; version option time-travels; MOR
    delete entries refuse the raw-file scan."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, In

    from etl_cortex_spark.sources.pyds import make_snapshot_batch_source

    path = str(tmp_path / "tbl")
    for lo in (0, 10, 20, 30):
        df = spark.range(lo, lo + 10, 2).selectExpr(
            "id as k", "cast(id * 2 as double) as v"
        )
        L.snapshot_append(
            spark, df.coalesce(1), path, stats_col=["k"], bloom_col="k"
        )
    cls = make_snapshot_batch_source()
    inst = cls.__new__(cls)
    inst.options = {"path": path}

    reader = inst.reader(None)
    flts = [EqualTo(("k",), 12)]
    assert list(reader.pushFilters(flts)) == flts  # all returned to Spark
    parts = reader.partitions()
    assert len(parts) == 1 and parts[0].path is not None
    rows = [r for p in parts for b in reader.read(p) for r in b.to_pylist()]
    assert rows == [{"k": 12, "v": 24.0}]

    # k=13 sits inside file 2's [10, 18] zone map but was never
    # committed (even keys only): the Bloom prunes where the range
    # cannot, leaving the zero-row sentinel partition
    r2 = inst.reader(None)
    r2.pushFilters([EqualTo(("k",), 13)])
    p2 = r2.partitions()
    assert len(p2) == 1 and p2[0].path is None

    r3 = inst.reader(None)
    r3.pushFilters([GreaterThan(("k",), 28)])
    assert len(r3.partitions()) == 1  # hi=28 file excluded, last kept

    r4 = inst.reader(None)
    r4.pushFilters([In(("k",), (4, 36))])
    assert len(r4.partitions()) == 2

    # time travel: version 2's manifest sees only the first two slices
    inst2 = cls.__new__(cls)
    inst2.options = {"path": path, "version": "2"}
    r5 = inst2.reader(None)
    r5.pushFilters([])
    assert len(r5.partitions()) == 2

    # MOR delete entries refuse — a raw file scan would resurrect rows
    L.snapshot_delete_mor(spark, path, F.col("k") == 12, ["k"])
    r6 = inst.reader(None)
    with pytest.raises(ValueError, match="merge-on-read"):
        r6.partitions()


def test_snapshot_clone_shallow_deep_and_retention(spark, tmp_path):
    """The clone family's contracts: shallow = zero-copy (no files
    under the clone's data dir; manifest references source files),
    histories diverge independently, deep = self-contained with
    re-pointed stats, source-side expire breaks shallow but not deep
    (the documented VACUUM hazard), MOR sources refuse shallow and
    materialize deep, and clone targets must be fresh."""
    src = str(tmp_path / "src")
    for lo in (0, 10):
        df = spark.range(lo, lo + 10).selectExpr("id as k")
        L.snapshot_append(spark, df.coalesce(1), src, stats_col=["k"])

    shallow = str(tmp_path / "shallow")
    assert L.snapshot_clone(spark, src, shallow) == 1
    assert not os.path.exists(os.path.join(shallow, "data"))
    meta = L.snapshot_meta(shallow)
    assert all(f.startswith(os.path.join(str(tmp_path), "src")) for f in meta["files"])
    assert meta["cloned_from"]["version"] == 2
    assert {r["k"] for r in L.snapshot_read(spark, shallow).collect()} == set(range(20))
    # stats carried: a pruned scan on the clone sees the zone maps
    assert set(meta["stats"]) == set(meta["files"])

    # divergence: clone-side append invisible to the source
    L.snapshot_append(spark, spark.range(20, 25).selectExpr("id as k"), shallow)
    assert L.snapshot_read(spark, shallow).count() == 25
    assert L.snapshot_read(spark, src).count() == 20

    deep = str(tmp_path / "deep")
    L.snapshot_clone(spark, src, deep, deep=True)
    dmeta = L.snapshot_meta(deep)
    assert all(f.startswith(os.path.join(str(tmp_path), "deep")) for f in dmeta["files"])
    assert set(dmeta["stats"]) == set(dmeta["files"])  # re-pointed
    assert L.snapshot_read(spark, deep).count() == 20

    # existing-table target refuses
    with pytest.raises(ValueError, match="fresh paths"):
        L.snapshot_clone(spark, src, shallow)

    # MOR source: shallow refuses, deep materializes live rows
    L.snapshot_delete_mor(spark, src, F.col("k") == 5, ["k"])
    with pytest.raises(ValueError, match="merge-on-read"):
        L.snapshot_clone(spark, src, str(tmp_path / "x"))
    mor_deep = str(tmp_path / "mor_deep")
    L.snapshot_clone(spark, src, mor_deep, deep=True)
    assert {r["k"] for r in L.snapshot_read(spark, mor_deep).collect()} == set(range(20)) - {5}

    # retention hazard: source rollback + expire drops the second
    # slice's file → the shallow clone (which references it) breaks,
    # the deep clone keeps reading
    src2 = str(tmp_path / "src2")
    for lo in (0, 10):
        L.snapshot_append(
            spark, spark.range(lo, lo + 10).selectExpr("id as k").coalesce(1), src2
        )
    sh2 = str(tmp_path / "sh2")
    dp2 = str(tmp_path / "dp2")
    L.snapshot_clone(spark, src2, sh2)
    L.snapshot_clone(spark, src2, dp2, deep=True)
    L.snapshot_rollback(spark, src2, to_version=1)
    L.snapshot_expire(spark, src2, keep_last=1, orphan_grace_secs=0)
    assert L.snapshot_read(spark, dp2).count() == 20
    with pytest.raises(Exception):
        L.snapshot_read(spark, sh2).count()


def test_rename_column_metadata_only_read_and_append(spark, tmp_path):
    """Core rename contract: one manifest write, zero data IO; reads
    resolve the logical view across generations; appends after the
    rename write the new name physically; chained renames compose;
    rollback across the rename restores the old logical schema."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "tbl")
    L.snapshot_append(
        spark, spark.range(0, 10).selectExpr("id as a", "id * 2 as v").coalesce(1), path
    )
    n_data_files = len(L.snapshot_meta(path)["files"])
    assert L.snapshot_rename_column(path, "a", "b") == 2
    meta = L.snapshot_meta(path)
    assert len(meta["files"]) == n_data_files  # zero data IO
    got = L.snapshot_read(spark, path)
    assert got.columns == ["b", "v"]
    assert got.agg(F.sum("b")).first()[0] == 45
    # the old file physically keeps 'a'
    assert [f.name for f in pq.read_schema(meta["files"][0])][0] == "a"

    # post-rename append writes 'b' physically; mixed read unions
    L.snapshot_append(
        spark, spark.range(10, 20).selectExpr("id as b", "id * 2 as v").coalesce(1), path
    )
    newest = L.snapshot_meta(path)["files"][-1]
    assert [f.name for f in pq.read_schema(newest)][0] == "b"
    got = L.snapshot_read(spark, path)
    assert got.columns == ["b", "v"]
    assert got.count() == 20 and got.agg(F.sum("b")).first()[0] == 190

    # chained rename over the mixed generations
    L.snapshot_rename_column(path, "b", "c")
    got = L.snapshot_read(spark, path)
    assert got.columns == ["c", "v"]
    assert got.agg(F.sum("c")).first()[0] == 190

    # collision / missing-column / MOR refusals
    with pytest.raises(ValueError, match="already exists"):
        L.snapshot_rename_column(path, "v", "c")
    with pytest.raises(ValueError, match="no column"):
        L.snapshot_rename_column(path, "zz", "y")

    # rollback to the pre-rename version restores the old names
    L.snapshot_rollback(spark, path, to_version=1)
    assert L.snapshot_read(spark, path).columns == ["a", "v"]


def test_rename_guards_refuse_physical_paths(spark, tmp_path):
    """Every physical-name-coupled path refuses loudly on active
    rename events and points at the materialize rewrite."""
    path = str(tmp_path / "tbl")
    L.snapshot_append(
        spark,
        spark.range(0, 10).selectExpr("id as a", "id * 2 as v").coalesce(1),
        path,
        stats_col=["a"],
        bloom_col="a",
    )
    L.snapshot_rename_column(path, "a", "b")
    for op, call in {
        "snapshot_delete_mor": lambda: L.snapshot_delete_mor(
            spark, path, F.col("b") == 1, ["b"]
        ),
        "snapshot_delete": lambda: L.snapshot_delete(
            spark, path, F.col("b") == 1
        ),
        "snapshot_merge": lambda: L.snapshot_merge(
            spark, spark.range(1).selectExpr("id as b", "id as v"), path, ["b"]
        ),
        "snapshot_compact": lambda: L.snapshot_compact(spark, path),
        "snapshot_scan": lambda: L.snapshot_scan(spark, path, "b", 1, 3),
        "snapshot_point_lookup": lambda: L.snapshot_point_lookup(
            spark, path, "b", 1
        ),
        "snapshot_read_lineage": lambda: L.snapshot_read_lineage(spark, path),
        "snapshot_changes_cdf": lambda: L.snapshot_changes_cdf(
            spark, path, 1, 2
        ),
        "snapshot_clone": lambda: L.snapshot_clone(
            spark, path, str(tmp_path / "cl")
        ),
    }.items():
        with pytest.raises(ValueError, match="rename"):
            call()
    # a rename on a MOR table refuses symmetrically
    path2 = str(tmp_path / "mor")
    L.snapshot_append(
        spark, spark.range(0, 10).selectExpr("id as a", "id as v"), path2
    )
    L.snapshot_delete_mor(spark, path2, F.col("a") == 1, ["a"])
    with pytest.raises(ValueError, match="merge-on-read"):
        L.snapshot_rename_column(path2, "a", "b")
    # deep clone materializes the logical rows instead
    dc = str(tmp_path / "dc")
    L.snapshot_clone(spark, path, dc, deep=True)
    got = L.snapshot_read(spark, dc)
    assert got.columns == ["b", "v"] and got.count() == 10


def test_rename_materialize_restores_full_surface(spark, tmp_path):
    """The explicit O(table) rewrite folds events into the files:
    physical names become logical, the event list clears, and the
    guarded ops work again; a no-op materialize returns the head."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "tbl")
    L.snapshot_append(
        spark, spark.range(0, 10).selectExpr("id as a", "id * 2 as v").coalesce(1), path
    )
    L.snapshot_rename_column(path, "a", "b")
    v = L.snapshot_materialize_renames(spark, path)
    assert v == 3
    meta = L.snapshot_meta(path)
    assert not meta.get("renames")
    assert [f.name for f in pq.read_schema(meta["files"][-1])][0] == "b"
    got = L.snapshot_read(spark, path)
    assert got.columns == ["b", "v"] and got.agg(F.sum("b")).first()[0] == 45
    L.snapshot_compact(spark, path)  # guarded op works again
    assert L.snapshot_read(spark, path).count() == 10
    assert L.snapshot_materialize_renames(spark, path) == 4  # no-op


def test_rename_tail_and_expire_contracts(spark, tmp_path):
    """Streaming/tail semantics around a rename: a rename step inside
    the window refuses; a window entirely AFTER the rename delivers
    (added files carry logical names); the raw first pull refuses on
    a renamed head; an empty pull's schema resolves the LOGICAL name
    even when no append followed the rename; expire keeps the
    event's cover segments resolvable."""
    path = str(tmp_path / "tbl")
    state = str(tmp_path / "cursor.json")
    L.snapshot_append(
        spark, spark.range(0, 5).selectExpr("id as a").coalesce(1), path
    )
    df, _, _, ack = L.snapshot_tail(spark, path, state)
    assert df.count() == 5
    ack()
    L.snapshot_rename_column(path, "a", "b")
    with pytest.raises(ValueError, match="renames a column"):
        L.snapshot_tail(spark, path, state)
    # re-seed past the rename: empty pull resolves the LOGICAL schema
    L.snapshot_tail_seed(path, state, 2)
    df2, _, _, ack2 = L.snapshot_tail(spark, path, state)
    assert df2.columns == ["b"] and df2.count() == 0
    ack2()
    # post-rename appends deliver normally under constant events
    L.snapshot_append(
        spark, spark.range(5, 9).selectExpr("id as b").coalesce(1), path
    )
    df3, _, _, ack3 = L.snapshot_tail(spark, path, state)
    assert df3.columns == ["b"]
    assert sorted(r["b"] for r in df3.collect()) == [5, 6, 7, 8]
    ack3()
    # raw first pull refuses on a renamed head
    with pytest.raises(ValueError, match="renames"):
        L.snapshot_tail(spark, path, str(tmp_path / "fresh.json"))
    # retention: expire to the head only — the rename event's cover
    # segments stay resolvable (liveness walk) and reads still work
    L.snapshot_expire(spark, path, keep_last=1, orphan_grace_secs=0)
    got = L.snapshot_read(spark, path)
    assert got.columns == ["b"] and got.count() == 9


def test_drop_column_metadata_only(spark, tmp_path):
    """Drop contract: one manifest write; readers exclude the column
    while covered files keep the bytes; post-drop appends never write
    it; re-adding the name creates a logically NEW column (pre-drop
    generations read NULL — Delta's drop-then-re-add semantics);
    rename and drop events chain; materialize folds the drop into a
    fresh generation."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "tbl")
    L.snapshot_append(
        spark,
        spark.range(0, 10)
        .selectExpr("id as a", "id * 2 as v", "id * 3 as w")
        .coalesce(1),
        path,
    )
    assert L.snapshot_drop_column(path, "v") == 2
    meta = L.snapshot_meta(path)
    got = L.snapshot_read(spark, path)
    assert got.columns == ["a", "w"]
    assert got.agg(F.sum("w")).first()[0] == 135
    # physical bytes remain in the covered file (the erasure caveat)
    assert "v" in [f.name for f in pq.read_schema(meta["files"][0])]

    # post-drop append without the column
    L.snapshot_append(
        spark,
        spark.range(10, 15).selectExpr("id as a", "id * 3 as w").coalesce(1),
        path,
    )
    assert L.snapshot_read(spark, path).count() == 15

    # re-add the name: logically NEW column, old generations read NULL
    L.snapshot_append(
        spark,
        spark.range(15, 20)
        .selectExpr("id as a", "id * 3 as w", "id * 10 as v")
        .coalesce(1),
        path,
    )
    got = L.snapshot_read(spark, path, merge_schema=True)
    assert set(got.columns) == {"a", "w", "v"}
    assert got.filter(F.col("v").isNull()).count() == 15
    assert got.agg(F.sum("v")).first()[0] == sum(i * 10 for i in range(15, 20))

    # rename chains over an active drop; guards still refuse
    L.snapshot_rename_column(path, "a", "k")
    assert set(L.snapshot_read(spark, path, merge_schema=True).columns) == {"k", "w", "v"}
    with pytest.raises(ValueError, match="rename"):
        L.snapshot_compact(spark, path)

    # refusals
    with pytest.raises(ValueError, match="no column"):
        L.snapshot_drop_column(path, "zz")
    solo = str(tmp_path / "solo")
    L.snapshot_append(spark, spark.range(3).selectExpr("id as x"), solo)
    with pytest.raises(ValueError, match="only"):
        L.snapshot_drop_column(solo, "x")

    # materialize folds drop + rename into a fresh physical generation
    L.snapshot_materialize_renames(spark, path)
    meta = L.snapshot_meta(path)
    assert not meta.get("renames")
    got = L.snapshot_read(spark, path)
    assert set(got.columns) == {"k", "w", "v"} and got.count() == 20
    L.snapshot_compact(spark, path)
    assert L.snapshot_read(spark, path).count() == 20


def test_check_constraints_enforced_on_every_write_path(spark, tmp_path):
    """CHECK constraint contracts: add-time validation scans existing
    rows; append/merge/merge_mor/stage refuse violating batches
    BEFORE staging (no orphan files); NULL passes (SQL semantics);
    the constraint rides rewrites, compaction and rollback; clones
    inherit it; drop removes it."""
    import glob

    path = str(tmp_path / "tbl")
    L.snapshot_append(
        spark,
        spark.range(1, 11).selectExpr("id as k", "id * 2 as v").coalesce(1),
        path,
    )
    # add-time validation refuses when existing rows violate
    with pytest.raises(ValueError, match="violation"):
        L.snapshot_set_constraint(spark, path, "big_k", "k > 5")
    assert L.snapshot_set_constraint(spark, path, "pos_k", "k > 0") == 2
    with pytest.raises(ValueError, match="already exists"):
        L.snapshot_set_constraint(spark, path, "pos_k", "k > 0")

    # append of a violating batch refuses and stages NOTHING
    files_before = set(glob.glob(f"{path}/data/*/*.parquet"))
    with pytest.raises(ValueError, match="pos_k"):
        L.snapshot_append(
            spark, spark.range(-3, 3).selectExpr("id as k", "id as v"), path
        )
    assert set(glob.glob(f"{path}/data/*/*.parquet")) == files_before

    # NULL passes (SQL CHECK semantics)
    L.snapshot_append(
        spark,
        spark.range(1).selectExpr("CAST(NULL AS BIGINT) as k", "id as v"),
        path,
    )
    assert L.snapshot_read(spark, path).count() == 11

    # merge / merge_mor / stage all refuse violating frames
    bad = spark.range(-1, 0).selectExpr("id as k", "id as v")
    with pytest.raises(ValueError, match="pos_k"):
        L.snapshot_merge(spark, bad, path, ["k"])
    with pytest.raises(ValueError, match="pos_k"):
        L.snapshot_merge_mor(spark, bad, path, ["k"])
    with pytest.raises(ValueError, match="pos_k"):
        L.snapshot_stage(spark, bad, path, "audit")

    # the contract rides rewrites: COW delete, compact, rollback
    L.snapshot_delete(spark, path, F.col("v") == 4)
    L.snapshot_compact(spark, path)
    L.snapshot_rollback(spark, path, to_version=L.snapshot_meta(path)["version"])
    assert L.snapshot_meta(path)["constraints"] == {"pos_k": "k > 0"}
    with pytest.raises(ValueError, match="pos_k"):
        L.snapshot_append(spark, bad, path)

    # clones inherit the contract
    cl = str(tmp_path / "cl")
    L.snapshot_clone(spark, path, cl)
    with pytest.raises(ValueError, match="pos_k"):
        L.snapshot_append(spark, bad, cl)

    # drop removes enforcement
    L.snapshot_drop_constraint(path, "pos_k")
    with pytest.raises(ValueError, match="no constraint"):
        L.snapshot_drop_constraint(path, "pos_k")
    L.snapshot_append(spark, bad.coalesce(1), path)
    assert "constraints" not in L.snapshot_meta(path) or not L.snapshot_meta(path)["constraints"]


def test_rewrite_segments_carries_rename_events(spark, tmp_path):
    """A segment-collapse maintenance commit on a renamed table must
    carry the rename events (dropping them would silently revert
    reads to physical names) and keep the covers resolvable."""
    path = str(tmp_path / "tbl")
    for lo in (0, 5, 10):
        L.snapshot_append(
            spark, spark.range(lo, lo + 5).selectExpr("id as a").coalesce(1), path
        )
    L.snapshot_rename_column(path, "a", "b")
    L.snapshot_append(
        spark, spark.range(15, 20).selectExpr("id as b").coalesce(1), path
    )
    L.snapshot_rewrite_segments(path)
    meta = L.snapshot_meta(path)
    assert meta["renames"] and meta["renames"][0]["new"] == "b"
    got = L.snapshot_read(spark, path)
    assert got.columns == ["b"]
    assert got.agg(F.sum("b")).first()[0] == 190


def test_snapshot_analyze_backfills_missing_stats(spark, tmp_path):
    """ANALYZE contract: only files missing the requested zone maps
    are scanned and only their segments are replaced; scans prune
    the legacy generation afterwards; a fully-statted table no-ops."""
    path = str(tmp_path / "tbl")
    # two legacy (stat-less) slices + one already-statted slice
    for lo in (0, 10):
        L.snapshot_append(
            spark, spark.range(lo, lo + 10).selectExpr("id as k").coalesce(1), path
        )
    L.snapshot_append(
        spark,
        spark.range(20, 30).selectExpr("id as k").coalesce(1),
        path,
        stats_col=["k"],
    )
    segs_before = L._load_raw(
        L._manifests(path)[-1]
    )["segments"]
    v = L.snapshot_analyze(spark, path, ["k"])
    assert v == 4
    segs_after = L._load_raw(L._manifests(path)[-1])["segments"]
    # the already-statted segment carries BY NAME; the two legacy ones
    # were replaced
    assert segs_before[2] == segs_after[2]
    assert segs_before[0] != segs_after[0] and segs_before[1] != segs_after[1]
    meta = L.snapshot_meta(path)
    assert all("k" in meta["stats"].get(f, {}) for f in meta["files"])
    # scans now prune: the [0,9] file alone covers the probe range
    kept = [
        f for f in meta["files"]
        if meta["stats"][f]["k"][0] <= 5 and meta["stats"][f]["k"][1] >= 3
    ]
    assert len(kept) == 1
    got = L.snapshot_scan(spark, path, "k", 3, 5)
    assert sorted(r["k"] for r in got.collect()) == [3, 4, 5]
    # idempotent: nothing missing -> no-op at the head version
    assert L.snapshot_analyze(spark, path, ["k"]) == 4
