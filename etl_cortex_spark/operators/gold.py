"""Gold-layer transforms (SURVEY §2 rows A11-A19, A24).

The reference's ``unify_cortex`` (``/root/reference/app.py:219-280``):
union N cleaned files, dedup keeping the most-recent row per endpoint,
then derive count summaries and a keyword-flagged failure slice.

Scale notes
-----------
- ``dedup_latest`` is ONE shuffle on the dedup keys (window + rn=1).
  The reference's sort-then-drop-duplicates (app.py:237-240) relies on
  pandas' stable sort; a naive Spark ``orderBy().dropDuplicates()`` is
  non-deterministic, so the window form with an explicit total-order
  tiebreaker is the only correct distributed translation (SURVEY §7
  "what's hard" #1). At 100 TB this is a standard hash-partitioned
  window — AQE handles skewed endpoints.
- ``value_counts`` is a map-side-combinable hash aggregate — partial
  aggregation means the shuffle carries one row per (key, partition),
  not per input row.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_cortex_spark.operators.cleaning import FAIL_KEYWORDS, keyword_flag

DEFAULT_DEDUP_KEYS = ("endpoint_name", "endpoint_alias")
DEFAULT_RECENCY_COLS = ("last_seen", "last_upgrade_status_time")
FAIL_CHECK_COLS = ("last_upgrade_status", "last_upgrade_failure_reason")


def union_all(dfs: Sequence[DataFrame]) -> DataFrame:
    """A11: ``pd.concat(ignore_index=True)`` (app.py:325).

    pandas concat aligns on column names and NaN-fills the gaps, so the
    faithful mapping is ``unionByName(allowMissingColumns=True)`` —
    positional ``union`` would silently mis-align heterogeneous files.
    """
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def dedup_latest(
    df: DataFrame,
    keys: Sequence[str] = DEFAULT_DEDUP_KEYS,
    recency_cols: Sequence[str] = DEFAULT_RECENCY_COLS,
) -> DataFrame:
    """A12+A13: keep the most-recent row per key group (app.py:237-240).

    Window ``row_number`` with descending recency columns; any remaining
    tie is broken by every other column descending so the survivor is
    deterministic regardless of partitioning (the pandas original's
    survivor depends on input row order — a contract Spark cannot and
    should not honor).

    Falls back to full-row distinct (A14, app.py:242) when none of the
    requested keys exist, exactly like the reference.
    """
    keys = [k for k in keys if k in df.columns]
    if not keys:
        return df.dropDuplicates()
    order = [F.desc_nulls_last(c) for c in recency_cols if c in df.columns]
    # deterministic tiebreak: remaining columns, stable order
    tiebreak = [
        F.desc_nulls_last(c)
        for c in df.columns
        if c not in keys and c not in recency_cols
    ]
    w = Window.partitionBy(*keys).orderBy(*(order + tiebreak))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def value_counts(df: DataFrame, col: str, count_name: str = "qtd") -> DataFrame:
    """A15: group-by count keeping NULL keys, biggest first (app.py:245-261).

    Spark groupBy keeps NULL groups by default = pandas
    ``dropna=False``. Secondary sort on the key makes the output order
    total (the reference inherits pandas' stable sort; ties in qtd
    would otherwise be partition-order-dependent here).
    """
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias(count_name))
        .orderBy(F.desc(count_name), F.asc_nulls_last(col))
    )


def filter_failures(
    df: DataFrame,
    cols: Iterable[str] = FAIL_CHECK_COLS,
    pattern: str = FAIL_KEYWORDS,
) -> DataFrame:
    """A16+A17: rows where any keyword column matches (app.py:264-270)."""
    return df.filter(keyword_flag(df, cols, pattern))


def unify(
    df: DataFrame,
    dedup_on: Sequence[str] = DEFAULT_DEDUP_KEYS,
) -> dict[str, DataFrame]:
    """A18/A24: the gold 'sheet book' (app.py:219-280).

    Returns the four output tables keyed by the reference's sheet
    names. The deduped base is cached: three downstream outputs branch
    from it (the reference recomputes from scratch on every Streamlit
    rerun — SURVEY §4.3 calls out the cache as the Spark win).

    Empty-summary suppression (A18, app.py:272-278) is left to the
    caller/sink — at plan-build time emptiness is unknown without an
    action, and the xlsx sink already checks it when materializing.
    """
    base = dedup_latest(df, keys=dedup_on).cache()
    sheets: dict[str, DataFrame] = {"Base_Limpa": base}
    if "endpoint_status" in base.columns:
        sheets["Resumo_Status"] = value_counts(base, "endpoint_status")
    if "operating_system" in base.columns:
        sheets["Resumo_OS"] = value_counts(base, "operating_system")
    sheets["Falhas_Upgrade"] = filter_failures(base)
    return sheets


def scd2_from_snapshots(
    df: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from periodic
    snapshots/observations: collapse consecutive rows with identical
    ``attr_cols`` per key, emitting one row per attribute run with
    ``valid_from`` / ``valid_to`` / ``is_current``.

    Scale shape: both windows (the change-detection lag and the
    validity lead) partition on ``key_cols`` — Spark plans ONE shuffle
    and reuses the partitioning for the second window. Null-safe
    comparison (``eqNullSafe``) so NULL attribute values form runs
    instead of infinite change-points. ``tiebreak_cols`` must make the
    per-key order total or history assembly is nondeterministic.
    """
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    changed = (
        df.withColumn("__prev", F.lag(attrs).over(w))
        .filter(F.col("__prev").isNull() | ~attrs.eqNullSafe(F.col("__prev")))
        .drop("__prev")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        changed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(*key_cols, *attr_cols, "valid_from", "valid_to", "is_current")
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """SQL ``MERGE INTO`` semantics on plain DataFrames: rows matched
    on ``keys`` take the source's values (WHEN MATCHED THEN UPDATE),
    source-only rows insert, target-only rows pass through unchanged.
    Adds ``updated`` / ``inserted`` audit flags.

    The reference app has no incremental path (it rebuilds gold from
    scratch each run); this is the incremental-refresh twin a
    warehouse-scale deployment needs.

    Scale shape: ONE full-outer shuffle join on the merge keys — the
    minimal data movement MERGE admits. Both sides' non-key columns
    ride the join; at 100 TB the target side would be a bucketed table
    so the shuffle happens once at write time, and AQE broadcasts
    small delta batches automatically.
    """
    keys = list(keys)
    value_cols = [c for c in target.columns if c not in keys]
    missing = [c for c in value_cols if c not in source.columns]
    if missing:
        raise ValueError(f"source is missing merge columns: {missing}")
    t = target.withColumn("__t", F.lit(True))
    s = source.withColumn("__s", F.lit(True))
    joined = t.alias("t").join(s.alias("s"), keys, "full_outer")
    in_t, in_s = F.col("t.__t").isNotNull(), F.col("s.__s").isNotNull()
    return joined.select(
        *keys,
        *[
            F.when(in_s, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in value_cols
        ],
        (in_t & in_s).alias("updated"),
        (~in_t).alias("inserted"),
    )


def incremental_agg_merge(
    state: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    *,
    count_col: str = "n",
    sum_cols: Sequence[str] = (),
) -> DataFrame:
    """Incremental materialized-view maintenance for algebraic
    aggregates: ``state`` holds per-key partial (count, sums); ``delta``
    is the same shape computed over only the NEW rows; the merged view
    is the union re-aggregated — identical to a full recompute because
    count and sum are commutative monoids, but it touches only
    O(|state| + |delta|) rows instead of rescanning history.

    At 100 TB this is the difference between an hourly full-table
    aggregate and folding an hour's partition into yesterday's state:
    one keyed shuffle over data that is mostly the (already compact)
    state table. avg/stddev derive from (count, sum, sum²) kept as
    columns — never stored as ratios, which don't merge.
    """
    keys = list(keys)
    cols = [count_col, *sum_cols]
    for c in cols:
        for side, df in (("state", state), ("delta", delta)):
            if c not in df.columns:
                raise ValueError(f"{side} is missing aggregate column: {c}")
    return (
        state.select(*keys, *cols)
        .unionByName(delta.select(*keys, *cols))
        .groupBy(*keys)
        .agg(
            F.sum(count_col).alias(count_col),
            *[F.sum(c).alias(c) for c in sum_cols],
        )
    )


def retract_agg(
    state: DataFrame,
    retractions: DataFrame,
    keys: Sequence[str],
    *,
    count_col: str = "n",
    sum_cols: Sequence[str] = (),
    strict: bool = False,
) -> DataFrame:
    """DELETION-aware incremental view maintenance (round 11 — the
    inverse of ``incremental_agg_merge``, and the right-to-be-forgotten
    shape every stored aggregate needs): ``retractions`` holds the same
    (count, sums) partials computed over ONLY the rows being deleted
    (e.g. a GDPR erasure batch, semi-joined out of the fact by key);
    the corrected view subtracts them from ``state`` and drops groups
    whose count reaches zero. Exactly equal to a full recompute over
    the surviving rows because count and sum are GROUPS (invertible
    monoids) under integer arithmetic — which is also why the sums
    must be integer-typed (cents, token counts): float sums are not
    exactly invertible, and a "corrected" float view would drift from
    the recompute by accumulated ulps.

    At 100 TB this is the difference between replaying all history on
    every erasure request and one keyed merge of O(|state| +
    |deleted-rows' groups|); the deleted rows themselves are found
    with a key-pushdown scan (broadcast semi-join against the erasure
    list), never a full-table rewrite. Over-retraction handling
    (a retraction for rows the state never contained drives a group's
    count NEGATIVE): by default such groups are DROPPED by the
    ``n > 0`` filter — indistinguishable from a legitimate full
    deletion, which is acceptable only when the caller guarantees
    retractions are a subset of state (the semi-join construction
    above does). Pass ``strict=True`` to instead RAISE at execution
    time on any post-merge negative count, AND on any group whose
    merged count reached exactly 0 while a sum column did not — the
    signature of a corrupting retraction that matched the group's row
    count but not its values (round-12 advice: count-only strict mode
    let an inflated-sum retraction pass silently). Strict mode cannot
    see a corrupted sum on a group whose count stays positive — that
    is undetectable from (count, sum) partials alone — so it is a
    subset-violation tripwire, not a full integrity proof; the posture
    a pipeline without the subset guarantee should run."""
    keys = list(keys)
    cols = [count_col, *sum_cols]
    for c in cols:
        for side, df in (("state", state), ("retractions", retractions)):
            if c not in df.columns:
                raise ValueError(f"{side} is missing aggregate column: {c}")
    negated = retractions.select(
        *keys, *[(-F.col(c)).alias(c) for c in cols]
    )
    merged = (
        state.select(*keys, *cols)
        .unionByName(negated)
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in cols])
    )
    if strict:
        # assert_true returns NULL when the predicate holds and raises
        # otherwise; keeping it inside the Filter (not a dropped
        # projection) means column pruning can never optimize the
        # check away. A fully-deleted group (count == 0) must have all
        # its sums back at exactly 0 too — a nonzero residue means the
        # retraction matched the row count but not the values.
        ok = F.col(count_col) >= 0
        for c in sum_cols:
            ok = ok & ((F.col(count_col) > 0) | (F.col(c) == 0))
        merged = merged.filter(
            F.assert_true(
                ok,
                F.concat(
                    F.lit(
                        "retract_agg: inconsistent merge (negative "
                        f"{count_col}, or zero {count_col} with nonzero "
                        "sum residue — retraction not a subset of state) "
                        "for group "
                    ),
                    F.concat_ws(
                        ",", *[F.col(k).cast("string") for k in keys]
                    ),
                ),
            ).isNull()
        )
    return merged.filter(F.col(count_col) > 0)

def incremental_join_merge(
    view: DataFrame,
    delta_left: DataFrame,
    right: DataFrame,
    left_keys: Sequence[str],
    join_key: str,
) -> DataFrame:
    """Incremental maintenance of a materialized JOIN view
    (the Δ-propagation rule: for upserted left rows,
    J' = (J ∖ π_keys(ΔL)) ∪ (ΔL ⋈ R)) — the join sibling of
    ``incremental_agg_merge``. ``view`` is the stored L ⋈ R;
    ``delta_left`` carries new/changed L rows identified by
    ``left_keys``; ``right`` is the (dimension) side the delta must be
    re-joined against.

    Cost is O(|view| + |Δ| ⋈ R) — the anti join's shuffle carries the
    view keyed on the row identity and the delta's key set broadcasts;
    the re-join touches only delta rows. Never re-scans the full left
    side, which at 100 TB is the entire point: folding an hourly
    upsert batch into a wide joined view without re-running the
    multi-hour join. Equality with a full recompute is the oracle's
    claim (join distributes over union when old keyed rows are
    removed first), not an approximation.
    """
    left_keys = list(left_keys)
    refreshed = delta_left.join(right, join_key)
    # No broadcast hint on the delta key set: a typical hourly delta
    # broadcasts fine, but a backfill delta's distinct keys can exceed
    # driver/broadcast limits, and a forced hint overrides AQE's
    # size-based choice — failing the job instead of degrading to a
    # shuffle join. AQE broadcasts it when it is actually small.
    kept = view.join(
        delta_left.select(*left_keys).distinct(),
        left_keys,
        "left_anti",
    )
    return kept.unionByName(refreshed.select(*view.columns))


def cdc_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Change-data-capture between two snapshots: emit the CHANGE SET
    (the complement of ``merge_upsert``, which applies one). Rows only
    in ``new`` → 'I', only in ``old`` → 'D', present in both with any
    differing value column → 'U'; unchanged rows are not emitted.

    One full-outer shuffle join on the keys; the value comparison is a
    null-safe eqNullSafe conjunction, so NULL→value and value→NULL
    transitions count as updates. At 100 TB both snapshots would be
    bucketed on the keys, making the join co-located.
    """
    keys = list(keys)
    value_cols = [c for c in old.columns if c not in keys]
    if set(old.columns) != set(new.columns):
        raise ValueError("snapshots must share a schema")
    o = old.alias("o").withColumn("__o", F.lit(True))
    n = new.alias("n").withColumn("__n", F.lit(True))
    joined = o.join(n, keys, "full_outer")
    in_o, in_n = F.col("__o").isNotNull(), F.col("__n").isNotNull()
    unchanged = F.lit(True)
    for c in value_cols:
        unchanged = unchanged & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    change = (
        F.when(~in_o, F.lit("I"))
        .when(~in_n, F.lit("D"))
        .when(~unchanged, F.lit("U"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *keys,
            "change_type",
            *[F.col(f"o.{c}").alias(f"old_{c}") for c in value_cols],
            *[F.col(f"n.{c}").alias(f"new_{c}") for c in value_cols],
        )
    )


def dedup_latest_agg(
    df: DataFrame,
    keys: Sequence[str],
    recency_cols: Sequence[str],
) -> DataFrame:
    """Keep-latest dedup as an AGGREGATE (``max_by`` over an ordering
    struct) instead of a window — same survivor as ``dedup_latest``
    when the ordering is total, but a different physical strategy:

    - window: exchange carries EVERY row, then per-partition sort on
      (keys, recency) drives row_number (WindowGroupLimit trims late);
    - max_by agg: map-side PARTIAL aggregation first — the exchange
      carries at most one candidate row per (input partition, key).
      Spark executes struct-valued max_by as a SortAggregate (struct
      buffers cannot hash-aggregate), but its sorts are on the GROUP
      KEYS only, never on the recency columns, and they run over the
      already-reduced candidate set.

    At 100 TB with heavy duplication the partial-agg variant wins on
    shuffle bytes (the dominant cost); with near-unique keys the
    window variant's WindowGroupLimit is comparable. Both are offered;
    plans asserted in tests/test_plans.py.

    Ordering-struct comparison ranks NULL fields lowest, matching
    ``dedup_latest``'s ``desc_nulls_last`` (parity pinned in
    tests/test_gold.py including NULL recency values).
    """
    payload = [c for c in df.columns if c not in keys]
    ordering = list(recency_cols) + [
        c for c in payload if c not in recency_cols
    ]
    packed = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload]),
            F.struct(*[F.col(c) for c in ordering]),
        ).alias("__m")
    )
    return packed.select(
        *[
            F.col(f"__m.{c}").alias(c) if c in payload else F.col(c)
            for c in df.columns
        ]
    )


def point_in_time_join(
    facts: DataFrame,
    dim_history: DataFrame,
    keys: Sequence[str],
    fact_ts: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """POINT-IN-TIME join against an SCD2 history (round 13 — the
    feature-store primitive that prevents TEMPORAL LEAKAGE in training
    data): each fact row is enriched with the dimension state that was
    valid AT ITS OWN timestamp — `[valid_from, valid_to)` with an open
    current row (valid_to NULL) — never the state written later. Using
    the current snapshot instead of this join is the classic label-
    leakage bug (training features computed from post-event states);
    `scd2_from_snapshots` builds the history this consumes.

    Plan shape: an EQUI-join on the keys with the validity range as a
    residual join condition — the per-key history is a handful of rows
    (state changes, not observations), so the match fan-out is bounded
    and there is no cartesian and no range-bin machinery needed (the
    binned_range_join answer is for big×big interval joins; here the
    right side is dim-sized per key by construction). Interval
    semantics: from-inclusive / to-exclusive, so back-to-back ranges
    never double-match and a fact at a state-change instant gets the
    NEW state. Facts predating the first state keep NULL state under
    ``how='left'`` — visible, not silently dropped."""
    cond = None
    for k in keys:
        c = facts[k] == dim_history[k]
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (facts[fact_ts] >= dim_history[valid_from])
        & (
            dim_history[valid_to].isNull()
            | (facts[fact_ts] < dim_history[valid_to])
        )
    )
    out = facts.join(dim_history, cond, how)
    return out.select(
        *[facts[c] for c in facts.columns],
        *[
            dim_history[c]
            for c in dim_history.columns
            if c not in set(keys)
        ],
    )


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply an OUT-OF-ORDER changelog (upserts + delete tombstones,
    each stamped with a monotone per-key sequence number) to a base
    table — the Debezium/CDC-consumer contract: arrival order is
    meaningless, the winner per key is the event with the HIGHEST
    sequence; a winning ``op='D'`` removes the key, a winning
    ``op='U'`` replaces the row, and keys the changelog never touches
    keep their base row (the base participates as sequence-0
    upserts).

    The whole resolution is ONE partial-combined aggregate —
    ``max_by(struct(op, payload), seq)`` per key — the repo's
    dedup-latest discipline: each map task forwards at most one
    candidate per key, so a hot key (millions of updates in one
    batch) never concentrates rows the way a window would, and
    late/duplicate/replayed events are idempotent by construction
    (same seq → same winner). Tombstones are dropped AFTER the
    argmax, never before — dropping them first would resurrect
    deleted keys whose tombstone out-sequences their updates."""
    payload = [c for c in base.columns if c not in keys]
    zero = base.withColumn(seq_col, F.lit(0).cast("long")).withColumn(
        op_col, F.lit("U")
    )
    ev = zero.unionByName(changes.select(*zero.columns))
    winner = ev.groupBy(*keys).agg(
        F.max_by(
            F.struct(F.col(op_col).alias("__op"), *[F.col(c) for c in payload]),
            F.col(seq_col),
        ).alias("__w")
    )
    return winner.filter(F.col("__w.__op") == "U").select(
        *keys, *[F.col(f"__w.{c}").alias(c) for c in payload]
    )
