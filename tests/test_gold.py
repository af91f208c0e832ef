"""Gold transform tests incl. the A13 dedup-determinism trap (SURVEY §5.2)."""

from __future__ import annotations

import datetime as dt

from etl_cortex_spark.operators import gold as G

SCHEMA = (
    "endpoint_name string, endpoint_alias string, endpoint_status string, "
    "operating_system string, last_seen timestamp, last_upgrade_status_time timestamp, "
    "last_upgrade_status string"
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _fixture(spark):
    rows = [
        # ep1: three versions, keep 2024-03-01 (latest last_seen)
        ("ep1", "a", "Connected", "Windows", _ts("2024-01-01"), None, "Success"),
        ("ep1", "a", "Lost", "Windows", _ts("2024-03-01"), None, "Failed"),
        ("ep1", "a", "Connected", "Windows", _ts("2024-02-01"), None, "Success"),
        # ep2: last_seen ties, tiebreak on last_upgrade_status_time
        ("ep2", None, "Connected", "Linux", _ts("2024-01-01"), _ts("2024-01-05"), "Success"),
        ("ep2", None, "Disconnected", "Linux", _ts("2024-01-01"), _ts("2024-01-09"), "Timed Out"),
        # ep3: single row, null OS (kept as a NULL group in Resumo_OS)
        ("ep3", "c", "Lost", None, _ts("2024-05-01"), None, "error: boom"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_dedup_latest_keeps_most_recent(spark):
    out = G.dedup_latest(_fixture(spark)).collect()
    by_name = {r.endpoint_name: r for r in out}
    assert len(out) == 3
    assert by_name["ep1"].last_seen == _ts("2024-03-01")
    assert by_name["ep2"].last_upgrade_status_time == _ts("2024-01-09")


def test_dedup_latest_deterministic_across_partitions(spark):
    """Adversarial: same data, different partitionings → same survivor set."""
    df = _fixture(spark)
    a = sorted(map(tuple, G.dedup_latest(df.repartition(16)).collect()))
    b = sorted(map(tuple, G.dedup_latest(df.coalesce(1)).collect()))
    c = sorted(map(tuple, G.dedup_latest(df.repartition(3, "endpoint_status")).collect()))
    assert a == b == c


def test_dedup_falls_back_to_distinct_when_keys_absent(spark):
    df = spark.createDataFrame([(1, "x"), (1, "x"), (2, "y")], "a long, b string")
    assert G.dedup_latest(df).count() == 2


def test_value_counts_keeps_null_groups_desc(spark):
    base = G.dedup_latest(_fixture(spark))
    rows = G.value_counts(base, "operating_system").collect()
    assert [(r.operating_system, r.qtd) for r in rows] == [
        ("Linux", 1),
        ("Windows", 1),
        (None, 1),
    ]


def test_unify_sheets(spark):
    sheets = G.unify(_fixture(spark))
    assert set(sheets) == {"Base_Limpa", "Resumo_Status", "Resumo_OS", "Falhas_Upgrade"}
    assert sheets["Base_Limpa"].count() == 3
    fails = sheets["Falhas_Upgrade"].collect()
    # ep1 survivor has "Failed", ep2 survivor "Timed Out", ep3 "error: boom"
    assert sorted(r.endpoint_name for r in fails) == ["ep1", "ep2", "ep3"]


def test_union_all_missing_columns(spark):
    a = spark.createDataFrame([("e1", "10.0.0.1")], "endpoint_name string, ip string")
    b = spark.createDataFrame([("e2",)], "endpoint_name string")
    out = G.union_all([a, b])
    assert set(out.columns) == {"endpoint_name", "ip"}
    assert out.count() == 2
    assert out.filter("ip is null").count() == 1


def test_dedup_idempotent(spark):
    """Property: gold(gold(x)) == gold(x) (SURVEY §5.2(4))."""
    df = _fixture(spark)
    once = G.dedup_latest(df)
    twice = G.dedup_latest(once)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_scd2_collapses_runs_and_chains_validity(spark):
    from etl_cortex_spark.operators.gold import scd2_from_snapshots

    snaps = spark.createDataFrame(
        [
            (1, "a", 10, 100),
            (1, "a", 20, 101),   # same state -> same run
            (1, "b", 30, 102),   # change
            (1, "a", 40, 103),   # change back -> NEW run (type-2, not distinct)
            (2, None, 10, 104),  # NULL state run
            (2, None, 20, 105),
            (2, "x", 30, 106),
        ],
        "k long, state string, ts long, oid long",
    )
    out = scd2_from_snapshots(
        snaps, key_cols=["k"], attr_cols=["state"], ts_col="ts",
        tiebreak_cols=["oid"],
    ).orderBy("k", "valid_from").collect()
    rows = [(r.k, r.state, r.valid_from, r.valid_to, r.is_current) for r in out]
    assert rows == [
        (1, "a", 10, 30, False),
        (1, "b", 30, 40, False),
        (1, "a", 40, None, True),
        (2, None, 10, 30, False),
        (2, "x", 30, None, True),
    ]


def test_dedup_latest_agg_matches_window_variant_with_nulls(spark):
    """The max_by-aggregate dedup must pick the same survivor as the
    window row_number variant, including NULL recency values (struct
    comparison ranks NULL lowest == desc_nulls_last)."""
    from etl_cortex_spark.operators.gold import dedup_latest, dedup_latest_agg

    rows = [
        # key (k), recency (r), payload (p)
        (1, 10, "a"),
        (1, 20, "b"),     # survivor for key 1
        (2, None, "c"),
        (2, 5, "d"),      # survivor for key 2: non-null beats NULL
        (3, None, "e"),   # all-null recency: tiebreak on payload desc
        (3, None, "f"),   # survivor for key 3 ("f" > "e")
        (4, 7, "g"),
        (4, 7, "h"),      # equal recency: payload desc tiebreak → "h"
    ]
    df = spark.createDataFrame(rows, "k long, r long, p string")
    w = {
        tuple(x)
        for x in dedup_latest(df, keys=["k"], recency_cols=["r"]).collect()
    }
    a = {
        tuple(x)
        for x in dedup_latest_agg(df, keys=["k"], recency_cols=["r"]).collect()
    }
    assert a == w
    assert {x[0] for x in a} == {1, 2, 3, 4}
    assert (1, 20, "b") in a and (2, 5, "d") in a
    assert (3, None, "f") in a and (4, 7, "h") in a


def test_incremental_join_merge_upsert_contract(spark):
    """The Δ-propagation rule row by row: a delta key replaces its old
    view row (re-joined against the current right side), untouched
    keys survive byte-identical, brand-new keys appear, and a delta
    row whose join key misses the right side contributes nothing
    (inner-join view semantics are preserved)."""
    view = spark.createDataFrame(
        [(1, 10, 100.0, "alice"), (2, 20, 200.0, "bob")],
        "k bigint, fk bigint, v double, name string",
    )
    right = spark.createDataFrame(
        [(10, "alice"), (20, "bob"), (30, "carol")], "fk bigint, name string"
    )
    delta = spark.createDataFrame(
        [
            (1, 30, 111.0),   # update: re-points row 1 at carol
            (3, 20, 300.0),   # insert: new key joining bob
            (4, 99, 400.0),   # insert with dangling fk -> must vanish
        ],
        "k bigint, fk bigint, v double",
    )
    out = sorted(
        tuple(r)
        for r in G.incremental_join_merge(view, delta, right, ["k"], "fk").collect()
    )
    assert out == [
        (1, 30, 111.0, "carol"),
        (2, 20, 200.0, "bob"),
        (3, 20, 300.0, "bob"),
    ]


def test_point_in_time_join_no_leakage_and_unique_match(spark):
    """The PIT contract on a hand-built history: a fact at a
    state-change instant gets the NEW state (from-inclusive), a fact
    between changes gets the state valid THEN (never a later one —
    the leakage case), facts before the first state keep NULL, and
    every fact matches at most one history row."""
    from etl_cortex_spark.operators.gold import point_in_time_join

    hist = spark.createDataFrame(
        [
            (1, "bronze", 10, 20),
            (1, "silver", 20, 40),
            (1, "gold", 40, None),
        ],
        "user_id long, state string, valid_from long, valid_to long",
    )
    facts = spark.createDataFrame(
        [(1, 100, 5), (1, 101, 10), (1, 102, 25), (1, 103, 40), (1, 104, 99)],
        "user_id long, event_id long, ts long",
    )
    out = {
        r.event_id: r.state
        for r in point_in_time_join(facts, hist, keys=["user_id"]).collect()
    }
    assert out == {
        100: None,       # predates history — visible, not dropped
        101: "bronze",   # from-inclusive
        102: "silver",   # the state valid THEN, not today's 'gold'
        103: "gold",     # change instant takes the NEW state
        104: "gold",     # open current row
    }
    # uniqueness: row count equals fact count (no fan-out)
    assert point_in_time_join(facts, hist, keys=["user_id"]).count() == 5


def test_apply_changelog_resolves_races_and_is_idempotent(spark):
    """Out-of-order changelog apply: the highest sequence wins per key
    (tombstones included — a delete out-sequencing an update removes
    the key, a losing delete doesn't), untouched keys keep their base
    row, and replaying duplicate events changes nothing."""
    from pyspark.sql import functions as F

    from etl_cortex_spark.operators.gold import apply_changelog

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k int, v string"
    )
    changes = spark.createDataFrame(
        [
            # k=1: update(seq 2) then delete(seq 5) -> gone
            (1, "a2", 2, "U"), (1, None, 5, "D"),
            # k=2: delete(seq 1) loses to update(seq 3) -> updated
            (2, None, 1, "D"), (2, "b3", 3, "U"),
            # k=3: two updates out of order -> seq 7 wins
            (3, "c7", 7, "U"), (3, "c4", 4, "U"),
            # k=5: insert of a new key
            (5, "e", 1, "U"),
        ],
        "k int, v string, seq long, op string",
    )
    got = {
        (r.k, r.v)
        for r in apply_changelog(base, changes, ["k"], "seq", "op").collect()
    }
    assert got == {(2, "b3"), (3, "c7"), (4, "d"), (5, "e")}
    # replay idempotence: doubling every event is a no-op
    got2 = {
        (r.k, r.v)
        for r in apply_changelog(
            base, changes.unionByName(changes), ["k"], "seq", "op"
        ).collect()
    }
    assert got2 == got
    # the resolution is an aggregate, not a window (skew posture)
    plan = (
        apply_changelog(base, changes, ["k"], "seq", "op")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Window" not in plan
