"""Skew-mitigation helpers (SURVEY §4.3 / the 100 TB contract).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
our session factory) handles most skew at runtime; these helpers cover
the two cases AQE cannot:

- **salted_agg**: a groupBy whose hottest key overwhelms one reducer.
  Two-phase: salt the key with ``n_salts`` shards → partial aggregate
  per (key, salt) → final aggregate per key. Only algebraic aggregates
  (sum/count/min/max, and avg via sum+count) can be re-aggregated —
  enforced by construction: callers pass (col, fn) pairs from the
  supported set.
- **salted_broadcast_left**: a join where the BUILD side is small but
  the probe side's key distribution is pathological AND the join must
  not broadcast (e.g. the small side exceeds the broadcast cap). The
  left's rows get a random-but-deterministic salt (hash of a unique
  column), the right is exploded ``n_salts`` times — the classic
  replicate-the-small-side salt join. Bytes cost: right × n_salts.

Both keep everything in builtin expressions — no UDFs, no RDDs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: aggregate fns that can be split into partial + final safely.
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    n_salts: int = 16,
    salt_src: Column | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` is (input_col, fn, output_name) with fn in
    {sum, count, min, max}. The salt is derived from a hash of the
    whole row (or ``salt_src``) so it is deterministic and needs no RNG.

    Equivalent to ``df.groupBy(keys).agg(...)`` for these algebraic
    fns; the first shuffle fans the hot key across ``n_salts``
    reducers, the second is one row per (key, salt).
    """
    bad = [fn for _, fn, _ in aggs if fn not in _ALGEBRAIC]
    if bad:
        raise ValueError(f"non-algebraic aggregate(s) {bad}; supported: {sorted(_ALGEBRAIC)}")

    salt = F.pmod(
        salt_src if salt_src is not None else F.xxhash64(*[F.col(c) for c in df.columns]),
        F.lit(n_salts),
    ).alias("__salt")

    partial = (
        df.select("*", salt)
        .groupBy(*keys, "__salt")
        .agg(
            *[
                _ALGEBRAIC[fn][0](F.col(c)).alias(f"__p_{out}")
                for c, fn, out in aggs
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[fn][1](F.col(f"__p_{out}")).alias(out)
            for _, fn, out in aggs
        ]
    )


def salted_broadcast_left(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (large, skewed) left; replicate the
    (small) right across every salt via a literal-range explode. The
    joined output equals ``left.join(right, on, how)`` for inner/left
    joins on equi-keys.
    """
    on = list(on)
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l = left.withColumn("__salt", lsalt)
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = l.join(r, on + ["__salt"], how)
    return joined.drop("__salt")


def global_rank(
    df: DataFrame,
    order_exprs: Sequence[Column],
    rank_col: str = "global_rank",
    n_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Exact 1-based rank under a global TOTAL order — withOUT a
    partition-less window (the third thing AQE can't fix: a global
    ntile/rank funnels the whole frame through ONE task; this is the
    classic two-phase distributed rank instead):

    1. ``repartitionByRange`` on the order expressions → partitions
       are non-overlapping key ranges, PERSISTED so the pid→count
       census and the rank job see the identical placement.
    2. A |partitions|-row census gives each partition its global
       offset (bounded driver state, the k-means pattern).
    3. global rank = offset[pid] + row_number within the partition —
       a PARTITIONED window, so every task ranks only its own range.

    The order must be TOTAL (include a unique tiebreak column) for
    the result to be deterministic. Returns (ranked df, total rows).
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    n_partitions = (
        n_partitions or df.sparkSession.sparkContext.defaultParallelism
    )
    from etl_cortex_spark.operators.caching import track

    # Tracked persist (round-6 ADVICE): the FIFO in operators.caching
    # evicts the oldest helper cache past its cap, so a long session /
    # full registry drive can't accumulate unbounded CacheManager
    # entries. Eviction is correctness-safe here: repartitionByRange
    # samples deterministically, so a recompute reproduces the exact
    # placement the census measured.
    parted = track(
        df.repartitionByRange(n_partitions, *order_exprs)
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in parted.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    offsets, acc = {}, 0
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    if not offsets:
        return parted.withColumn(rank_col, F.lit(None).cast("long")).drop(
            "__pid"
        ), 0
    omap = F.create_map(
        *[
            x
            for pid, off in sorted(offsets.items())
            for x in (F.lit(pid), F.lit(off))
        ]
    )
    w = Window.partitionBy("__pid").orderBy(*order_exprs)
    ranked = parted.withColumn(
        rank_col,
        (omap[F.col("__pid")] + F.row_number().over(w)).cast("long"),
    ).drop("__pid")
    return ranked, acc


def global_ntile(
    df: DataFrame,
    n_buckets: int,
    order_exprs: Sequence[Column],
    out_col: str = "ntile",
) -> DataFrame:
    """SQL ``ntile(b) OVER (ORDER BY ...)`` semantics at scale: the
    first ``n mod b`` buckets take ``n div b + 1`` rows, the rest
    ``n div b`` — computed from the two-phase ``global_rank`` and the
    exact total, so no data-sized single partition exists anywhere.
    Order must be total (tiebreak column included) to match the
    windowed ntile bit-for-bit."""
    ranked, n = global_rank(df, order_exprs, rank_col="__r")
    q, rem = divmod(n, n_buckets) if n else (0, 0)
    bucket = _ntile_bucket(F.col("__r"), F.lit(q), F.lit(rem))
    return ranked.withColumn(out_col, bucket.cast("int")).drop("__r")


def _ntile_bucket(rank: Column, q: Column, rem: Column) -> Column:
    """The SQL ntile fill rule as one expression (shared by
    `global_ntile` and `grouped_ntile` so the arithmetic can never
    drift between them): with n = q·b + rem rows, the first ``rem``
    buckets take ``q + 1`` rows, the rest ``q``; ``q = 0`` (n < b)
    degenerates to one row per bucket."""
    big = rem * (q + F.lit(1))
    return (
        F.when(q == F.lit(0), rank)
        .when(rank <= big, F.ceil(rank / (q + 1)))
        .otherwise(rem + F.ceil((rank - big) / q))
    )


def _gk(v) -> str:
    # driver-side group-key render; must match the executor-side
    # COALESCE(CAST(g AS STRING), sentinel) in _grouped_two_phase
    return "\x00NULL" if v is None else str(v)


def _lit_map(d: dict) -> Column:
    return F.create_map(
        *[x for k, v in sorted(d.items()) for x in (F.lit(k), F.lit(v))]
    )


def _grouped_two_phase(
    df: DataFrame,
    group_col: str,
    order_exprs: Sequence[Column],
    n_partitions: int | None,
    max_groups: int,
    caller: str,
):
    """The shared core of `grouped_rank` / `grouped_ntile` (round 16):
    range-repartition on (group, order) → PERSISTED placement → a
    bounded (pid, group) census → per-(pid, group) offsets and exact
    per-group totals as driver state. Returns (parted, rank_expr,
    gkey_expr, totals_by_group_key) — rank_expr is the exact 1-based
    rank WITHIN the row's group, computed under a window PARTITIONED
    by (__pid, group) so no task ever sorts more than its own range
    slice, no matter how skewed the groups. Returns totals empty when
    the frame is empty."""
    from pyspark import StorageLevel
    from pyspark.sql import Window
    from pyspark.sql import types as T  # noqa: N812

    from etl_cortex_spark.operators.caching import track

    # LOUD dtype gate (round-16 review): the census keys groups by
    # Python str() while the executor keys by CAST(g AS STRING); the
    # two renderings agree for strings/integers/dates but NOT for
    # floats ('1e+20' vs '1.0E20'), booleans ('True' vs 'true'),
    # timestamps or decimals — which would silently NULL every rank
    # of the mismatched group. Refuse those types up front; callers
    # pre-cast to string.
    gtype = df.schema[group_col].dataType
    if not isinstance(
        gtype,
        (
            T.StringType,
            T.IntegerType,
            T.LongType,
            T.ShortType,
            T.ByteType,
            T.DateType,
        ),
    ):
        raise ValueError(
            f"{caller}: group column {group_col!r} has type {gtype} — "
            "only string/integral/date group keys render identically in "
            "Python and Spark; cast the column to string first"
        )
    n_partitions = (
        n_partitions or df.sparkSession.sparkContext.defaultParallelism
    )
    parted = track(
        df.repartitionByRange(n_partitions, F.col(group_col), *order_exprs)
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # The cardinality guard must fire BEFORE the driver materializes
    # the census (round-16 verdict #2): collect through limit(bound+1),
    # so an unbounded group column yields at most bound+1 driver rows
    # and a loud ValueError — never a driver OOM. A limit that returns
    # <= bound rows IS the complete census (limit only truncates past
    # the bound), so the success path costs the same single job.
    bound = max_groups + n_partitions
    census = (
        parted.groupBy("__pid", group_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .limit(bound + 1)
        .collect()
    )
    if len(census) > bound:
        raise ValueError(
            f"{caller}: census exceeds max_groups={max_groups} + "
            f"{n_partitions} partitions ((pid, group) rows > {bound}) "
            f"— {group_col!r} is not a bounded-cardinality group column"
        )
    from collections import defaultdict

    by_group: dict[str, list] = defaultdict(list)
    for r in census:
        by_group[_gk(r[group_col])].append((r["__pid"], r["__n"]))
    offsets: dict[str, int] = {}
    totals: dict[str, int] = {}
    for gk, lst in by_group.items():
        acc = 0
        for pid, n in sorted(lst):
            offsets[f"{pid}\x1f{gk}"] = acc
            acc += n
        totals[gk] = acc
    gkey = F.coalesce(F.col(group_col).cast("string"), F.lit("\x00NULL"))
    if not offsets:
        return parted, None, gkey, totals
    okey = F.concat_ws("\x1f", F.col("__pid").cast("string"), gkey)
    w = Window.partitionBy("__pid", group_col).orderBy(*order_exprs)
    rank = (_lit_map(offsets)[okey] + F.row_number().over(w)).cast("long")
    return parted, rank, gkey, totals


def grouped_rank(
    df: DataFrame,
    group_col: str,
    order_exprs: Sequence[Column],
    rank_col: str = "rank",
    n_partitions: int | None = None,
    max_groups: int = 10_000,
) -> DataFrame:
    """Exact 1-based ``row_number() OVER (PARTITION BY g ORDER BY ...)``
    at scale (round 16 — the d85 fix found by this round's latent-skew
    sweep): an UNFILTERED per-group row_number cannot be
    WindowGroupLimit-pruned (only rank-≤-k filters plan that way), so
    the windowed form sorts a dominant group — the biggest curriculum
    stratum, the dominant language — in ONE task at 100 TB. Two-phase
    instead (`_grouped_two_phase`): every task ranks only its own
    range slice and the offsets come from a bounded census.

    Contract: ``group_col`` must be BOUNDED-CARDINALITY (guarded by
    ``max_groups``, which also bounds the literal lookup maps) and its
    values must render identically via Spark's CAST(.. AS STRING) and
    Python's str() (strings, ints, dates do; floats and booleans do
    not — pre-cast those). The order must be TOTAL within each group
    (include a unique tiebreak) or the rank is nondeterministic."""
    parted, rank, _gkey, totals = _grouped_two_phase(
        df, group_col, order_exprs, n_partitions, max_groups, "grouped_rank"
    )
    if rank is None:  # empty frame
        return parted.drop("__pid").withColumn(
            rank_col, F.lit(None).cast("long")
        )
    return parted.withColumn(rank_col, rank).drop("__pid")


def grouped_ntile(
    df: DataFrame,
    n_buckets: int,
    group_col: str,
    order_exprs: Sequence[Column],
    out_col: str = "ntile",
    n_partitions: int | None = None,
    max_groups: int = 10_000,
) -> DataFrame:
    """PER-GROUP ``ntile(b) OVER (PARTITION BY g ORDER BY ...)`` at
    scale (round 16 — the round-15 verdict's one scale-killer, fixed
    at the primitive level): the windowed form cannot be
    WindowGroupLimit-pruned — ntile needs its WHOLE partition — so a
    dominant group (45% of a crawl corpus is English) sorts in ONE
    task at 100 TB. Rank from `_grouped_two_phase` (every task ranks
    only its own range slice), bucket from the SQL ntile fill rule
    (first ``n mod b`` buckets take one extra row) applied to the
    exact per-group totals — bit-identical to the windowed ntile,
    pinned under 90%-skew in tests/test_skew.py. Same
    bounded-cardinality / total-order contract as `grouped_rank`."""
    parted, rank, gkey, totals = _grouped_two_phase(
        df, group_col, order_exprs, n_partitions, max_groups, "grouped_ntile"
    )
    if rank is None:  # empty frame
        return parted.drop("__pid").withColumn(
            out_col, F.lit(None).cast("int")
        )
    q_by_g = {gk: n // n_buckets for gk, n in totals.items()}
    rem_by_g = {gk: n % n_buckets for gk, n in totals.items()}
    bucket = _ntile_bucket(
        rank,
        _lit_map(q_by_g)[gkey].cast("long"),
        _lit_map(rem_by_g)[gkey].cast("long"),
    )
    return parted.withColumn(out_col, bucket.cast("int")).drop("__pid")


def skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """KEY-SKEW DIAGNOSTICS (round 13 — the measurement the rest of
    this module acts on): one row summarizing how lopsided a join/agg
    key's distribution is, BEFORE the 100 TB job runs —
    (n_rows, n_keys, max_key_count, hottest_key, avg_per_key,
    p99_key_count, skew_factor = max/avg). A skew_factor near 1 means
    hash partitioning will balance; tens-to-thousands means the
    hottest key's partition is the straggler and the job needs
    `salted_agg`/`salted_broadcast_left` (or AQE skew-join if the
    factor is within its split threshold). Two partial-agg shuffles
    (key counts, then the 1-row summary) — the report never moves
    payload columns; p99 is percentile_disc (an actual data point,
    exact on any engine — the c61 percentile_disc convention);
    hottest_key breaks count ties on the key so the report is
    deterministic."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__n"))
    return counts.groupBy().agg(
        F.sum("__n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("__n").alias("max_key_count"),
        # combined scalar (count·10^7 + key) keeps the max_by ordering
        # key portable — DuckDB's max_by has no struct ordering; valid
        # while keys < 10^7 and counts < 9.2e11 (asserted by the caller's
        # domain; both hold for every test SF and any key census that
        # fits a BIGINT)
        F.max_by(
            key_col, F.col("__n") * F.lit(10_000_000) + F.col(key_col)
        ).alias("hottest_key"),
        (F.sum("__n") / F.count(F.lit(1))).alias("avg_per_key"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY __n)")
        .cast("long")
        .alias("p99_key_count"),
        (
            F.max("__n")
            / (F.sum("__n") / F.count(F.lit(1)))
        ).alias("skew_factor"),
    )


def join_explosion_report(
    left: DataFrame, right: DataFrame, key_col: str
) -> DataFrame:
    """JOIN-CARDINALITY PRE-FLIGHT (round 14 — `skew_report`'s join
    sibling; together they are the measure-before-join pair): the
    EXACT output size of ``left ⋈ right`` on ``key_col`` is
    Σ_k n_left(k)·n_right(k), computable from the two key-count
    tables WITHOUT running the join — two partial-agg count shuffles
    plus a join of count rows (one row per key, payload never moves).
    One summary row: both input sizes, the exact join output size,
    the amplification factor vs the larger input, and the hottest
    key with its contribution — a key whose product dominates is a
    join explosion (the classic many-to-many trap: at 100 TB an
    unnoticed 1000×1000 key pair adds 10^6 rows, and a handful of
    them OOM the stage). Running the report costs O(|keys|) shuffle
    bytes; running the exploded join costs the explosion — this is
    the cheap check that decides between the plain join, collapsing
    duplicates first (`dedup_latest_agg`), or salting.

    hottest_key's max_by uses the combined-scalar ordering key
    (product·10^7 + key), the `skew_report` portability convention —
    valid while keys < 10^7 and products < 9.2e11, which every test
    SF and any count census fitting a BIGINT satisfies."""
    lc = left.groupBy(key_col).agg(F.count(F.lit(1)).alias("__nl"))
    rc = right.groupBy(key_col).agg(F.count(F.lit(1)).alias("__nr"))
    prod = lc.join(rc, key_col).select(
        F.col(key_col), (F.col("__nl") * F.col("__nr")).alias("__p"),
        "__nl", "__nr",
    )
    totals = prod.groupBy().agg(
        F.sum("__p").alias("join_rows"),
        F.count(F.lit(1)).alias("n_matching_keys"),
        F.max("__p").alias("max_key_product"),
        F.max_by(
            key_col, F.col("__p") * F.lit(10_000_000) + F.col(key_col)
        ).alias("hottest_key"),
    )
    n_l = left.groupBy().agg(F.count(F.lit(1)).alias("left_rows"))
    n_r = right.groupBy().agg(F.count(F.lit(1)).alias("right_rows"))
    return (
        totals.crossJoin(F.broadcast(n_l))
        .crossJoin(F.broadcast(n_r))
        .select(
            "left_rows",
            "right_rows",
            "join_rows",
            "n_matching_keys",
            "hottest_key",
            "max_key_product",
            (
                F.col("join_rows")
                / F.greatest(F.col("left_rows"), F.col("right_rows"))
            ).alias("amplification"),
        )
    )
