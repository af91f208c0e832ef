"""Count-Min Sketch as plain DataFrame aggregation (frequency twin of
the HLL distinct-count sketches in `scale_hll_sketch_rollup`).

PySpark 4 exposes no count-min API (the old ``df.stat.countMinSketch``
is gone and SQL's ``count_min_sketch`` emits an opaque binary with no
query function), so the sketch is stood up from first principles as a
DataFrame — which is the better 100 TB shape anyway:

- **Build**: every input row contributes +1 to ``depth`` counters, one
  per hash row ``i``: ``bucket_i = xxhash64(key, i) % width``. The
  sketch IS a DataFrame of at most ``depth*width`` rows
  ``(i, bucket, cnt)`` — one explode + one partial-combined groupBy,
  and the result is tiny regardless of input size.
- **Merge**: union + re-aggregate (counters add) — sketches built per
  partition/day/source roll up without re-scanning base data, the same
  property that makes the HLL rollup the distinct-count answer.
- **Estimate**: probe keys re-derive their ``depth`` buckets, join the
  (broadcast) sketch on ``(i, bucket)``, and take the min counter —
  missing buckets count 0.

Guarantees (standard CMS, Cormode & Muthukrishnan): estimates never
undercount (counters only add), and overcount by at most ``eps*N``
with probability ``1-delta`` for ``width=ceil(e/eps)``,
``depth=ceil(ln(1/delta))`` — pinned by the epsilon-oracle entry
`scale_cms_frequency` and by collision/merge pytests.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_params(eps: float, delta: float) -> tuple[int, int]:
    """(width, depth) for an eps*N overestimate bound holding with
    probability 1-delta."""
    return math.ceil(math.e / eps), math.ceil(math.log(1.0 / delta))


def _bucketed(df: DataFrame, key_col: str, width: int, depth: int) -> DataFrame:
    """One row per (input row, depth): the counter coordinates."""
    return df.select(
        F.col(key_col).alias("__k"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("i"),
    ).select(
        "__k",
        "i",
        F.pmod(F.xxhash64("__k", "i"), F.lit(width)).alias("bucket"),
    )


def cms_build(df: DataFrame, key_col: str, width: int, depth: int) -> DataFrame:
    """Sketch frame ``(i, bucket, cnt)`` — ≤ depth*width rows. The
    explode multiplies rows depth× BEFORE the aggregation, but the
    map-side partial combine collapses them to ≤ depth*width per input
    partition, so the shuffle carries sketch-sized data, not data-sized
    data."""
    return (
        _bucketed(df, key_col, width, depth)
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (width, depth): counters add."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("i", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, key_col: str, width: int, depth: int
) -> DataFrame:
    """Point-query estimates for each distinct probe key: min over the
    key's depth counters. Returns ``(key_col, est)``. The sketch is
    broadcast — it is bounded by depth*width rows by construction."""
    pd = _bucketed(probes.select(key_col).distinct(), key_col, width, depth)
    joined = pd.join(F.broadcast(sketch), ["i", "bucket"], "left")
    return (
        joined.groupBy("__k")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
        .withColumnRenamed("__k", key_col)
    )


# --- bottom-k uniform sample sketch (KMV-style) -------------------------------
#
# The quantile member of the mergeable-sketch family (next to the HLL
# distinct rollup and the Count-Min frequency sketch): per group, keep
# the k rows with the SMALLEST content-hash priority. Because the
# priority is a pure function of each row's unique key (md5 of its
# decimal string), the sample is a deterministic uniform draw — and
# bottom-k of a union of bottom-k sketches equals bottom-k of the
# union, so merging sketches up a hierarchy (nation → region) gives
# EXACTLY the sketch a direct build would give (pinned by pytest).
# Quantile estimates read the sample like any order statistic, with
# O(1/sqrt(k)) rank error; unlike GK/t-digest the whole construction
# is replayable verbatim in SQL, so the oracle is exact, not epsilon.


def bottomk_build(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    k: int,
) -> DataFrame:
    """Per-group bottom-k sample: (group..., __pri, __key, value).
    rank ≤ k over (priority, key) plans as WindowGroupLimit — the
    per-group exchange carries at most k·n_partitions rows."""
    from pyspark.sql import Window

    pri = F.md5(F.col(key_col).cast("string").cast("binary"))
    w = Window.partitionBy(*group_cols).orderBy(pri, F.col(key_col))
    return (
        df.withColumn("__pri", pri)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(*group_cols, "__pri", F.col(key_col).alias("__key"), value_col)
    )


def bottomk_merge(
    sketch: DataFrame,
    group_cols: list[str],
    k: int,
) -> DataFrame:
    """Merge sketches into coarser groups (e.g. nation sketches →
    region): re-rank the union on the SAME (priority, key) order and
    keep the bottom k — identical to building directly at the coarse
    level, because priorities are global content hashes."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("__pri", "__key")
    return (
        sketch.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def bottomk_quantile(
    sketch: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: float,
) -> DataFrame:
    """Discrete quantile from each group's sample: the element at
    1-based position floor((m-1)·p)+1 of the sorted sample values —
    an actual data point (no interpolation), so the emitted double is
    bit-identical in any engine."""
    vals = F.array_sort(F.collect_list(value_col))
    idx = F.floor((F.size(vals) - 1) * F.lit(p)).cast("int") + 1
    return sketch.groupBy(*group_cols).agg(
        F.element_at(vals, idx).alias(f"p{int(p * 100)}_{value_col}"),
        F.count(F.lit(1)).alias("sample_size"),
    )


# --- Bloom filter (set membership, the fourth sketch family) ------------------
#
# CMS answers "how often", HLL answers "how many distinct", bottom-k
# answers "what quantile" — the Bloom filter answers "is this key in
# the set" with zero false NEGATIVES, which is exactly the contract
# eval-set decontamination needs (a missed benchmark gram is a leak; a
# false positive merely over-filters). PySpark exposes no queryable
# Bloom aggregate (`bloom_filter_agg` exists in Catalyst for runtime
# join filters but its binary is opaque to SQL), so — like the CMS
# above — the filter is stood up from first principles in a way that
# is PORTABLE across engines: the k=3 hash functions are disjoint
# 4-hex-char windows of md5 (offsets 1/9/17) read as 16-bit ints,
# giving three independent banks (a "partitioned" Bloom filter, one
# bank per hash). The built state is one row of three 65536-element
# BOOLEAN arrays — a real bitset, ~192 KB total at ANY key count, so
# it broadcasts at any scale — and a probe is three O(1) element_at
# lookups on one md5: membership WITHOUT a join or a shuffle of the
# probe side (an array-of-present-values representation was measured
# 2-3× slower at sf0.1 — array_contains is a linear scan per gram).
# The build aggregates collect_set(position) (map-side partial, shuffle
# carries ≤ 3·65536 ints however large the key set), then run-length-
# encodes the sorted positions into the bitmap: O(|set| + 65536), not
# the O(|set|·65536) of probing every index. False-positive rate per
# probe is ∏(popcount_i/65536) ≤ (n/65536)³ — ~4.5e-4 at n=5k keys.

BLOOM_OFFSETS = (1, 9, 17)
BLOOM_HEX_WIDTH = 4
BLOOM_BANK_SIZE = 1 << (4 * BLOOM_HEX_WIDTH)


def _md5_hex(col) -> "F.Column":
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("binary"))


def bloom_positions(md5_col) -> list:
    """The k bank positions of a key's md5 hex — 4-hex-char windows as
    ints. Portable: DuckDB's substr(md5(x), o, 4) names the same bit."""
    return [
        F.conv(F.substring(md5_col, o, BLOOM_HEX_WIDTH), 16, 10).cast("int")
        for o in BLOOM_OFFSETS
    ]


def _bitset(sorted_positions) -> "F.Column":
    """Sorted distinct int positions → 65536-element boolean array.
    Run-length: emit repeat('0', gap)+'1' per position, pad the tail,
    split to chars — O(|set| + bank size)."""
    sp = sorted_positions
    idx = F.sequence(F.lit(0), F.size(sp) - 1)
    parts = F.transform(
        idx,
        lambda i: F.concat(
            F.repeat(
                F.lit("0"),
                F.element_at(sp, i + 1)
                - F.when(i == 0, F.lit(-1)).otherwise(F.element_at(sp, i))
                - 1,
            ),
            F.lit("1"),
        ),
    )
    body = F.when(F.size(sp) == 0, F.lit("")).otherwise(F.concat_ws("", parts))
    padded = F.concat(body, F.repeat(F.lit("0"), F.lit(BLOOM_BANK_SIZE) - F.length(body)))
    return F.transform(
        F.slice(F.split(padded, ""), 1, BLOOM_BANK_SIZE), lambda c: c == F.lit("1")
    )


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """Aggregate a key set into the one-row filter (__bloom_0..2
    boolean bitsets). collect_set is map-side partial — duplicate keys
    collapse per input partition — and the bitset encode runs once on
    the single aggregated row."""
    ps = bloom_positions(_md5_hex(key_col))
    agg = keys.agg(
        *[F.array_sort(F.collect_set(p)).alias(f"__set_{i}") for i, p in enumerate(ps)]
    )
    return agg.select(
        *[_bitset(F.col(f"__set_{i}")).alias(f"__bloom_{i}") for i in range(len(ps))]
    )


def _member_of_banks(positions) -> "F.Column":
    pred = F.lit(True)
    for i, p in enumerate(positions):
        pred = pred & F.element_at(F.col(f"__bloom_{i}"), p + 1)
    return pred


def bloom_might_contain(key_col) -> "F.Column":
    """Membership predicate against the __bloom_* columns of a joined
    (broadcast) filter row. True ⇔ every bank has the key's bit set —
    never false for a key that was built in. Three O(1) lookups."""
    return _member_of_banks(bloom_positions(_md5_hex(key_col)))


def bloom_member_count(arr_col) -> "F.Column":
    """How many elements of a string-array column probe positive —
    the per-document decontamination counter. Hashes each element
    ONCE (transform to md5 first, then derive the three windows), so
    the per-element cost is one md5 + three O(1) lookups."""
    arr = F.col(arr_col) if isinstance(arr_col, str) else arr_col
    hashed = F.transform(arr, lambda g: F.md5(g.cast("binary")))
    return F.size(F.filter(hashed, lambda h: _member_of_banks(bloom_positions(h))))


def bloom_merge(prev: DataFrame, sk: DataFrame) -> DataFrame:
    """Element-wise OR of two filters' banks (both 1-row). Bitwise OR
    is associative + commutative + idempotent, so filters built per
    partition / micro-batch / day merge to exactly the filter of the
    union of their key sets — the same mergeability that makes the
    CMS and HLL rollups work, at a constant 3·65536-bit state."""
    n = len([c for c in prev.columns if c.startswith("__bloom_")])
    other = sk.select(*[F.col(f"__bloom_{i}").alias(f"__o_{i}") for i in range(n)])
    return prev.crossJoin(F.broadcast(other)).select(
        *[
            F.zip_with(f"__bloom_{i}", f"__o_{i}", lambda x, y: x | y).alias(
                f"__bloom_{i}"
            )
            for i in range(n)
        ]
    )


def kmv_sketch(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """GLOBAL bottom-k (KMV / Theta) sketch of a key set: the k
    distinct keys with the smallest md5 priorities. Planned as
    ``orderBy(pri, key).limit(k)`` — Spark's TakeOrderedAndProject:
    each partition keeps its own k candidates and the driver merges
    k·n_partitions rows, so there is NO data-sized global sort or
    window anywhere (the c69-class hazard this file's quantile sketch
    avoids with per-group windows is avoided here with take-ordered).
    Columns: (__pri, __key)."""
    pri = F.md5(F.col("__key").cast("string").cast("binary"))
    return (
        df.select(F.col(key_col).alias("__key"))
        .distinct()
        .select(pri.alias("__pri"), "__key")
        .orderBy("__pri", "__key")
        .limit(k)
    )


def kmv_intersection(
    a: DataFrame, b: DataFrame, key_col: str, k: int = 64
) -> DataFrame:
    """SET-INTERSECTION cardinality from two mergeable KMV sketches —
    the Theta-sketch workhorse (Beyer et al. 2007 / DataSketches):
    with L = the k smallest-hash keys of the UNION of the two
    sketches and u = L's k-th normalized hash, |A∪B| ≈ (k−1)/u,
    ρ̂(Jaccard) = |L ∩ S_A ∩ S_B| / |L|, and |A∩B| ≈ ρ̂ · |A∪B| — an
    intersection estimate from two k-row summaries, never a join of
    the sets. When the union sample holds fewer than k keys the
    sketch IS the union and every output is exact (the small-set
    branch, replayed identically by the oracle).

    Engine-portable arithmetic: the hash is the repo's md5-hex
    convention, normalized by its first 13 hex digits (52 bits —
    exactly representable in BIGINT and DOUBLE in both engines), so
    every emitted double is a quotient of exact integers and the
    oracle hash-matches bit-for-bit; the exact |A∩B| is emitted
    alongside so every record of this estimator carries its own
    ground truth. At 100 TB the sketches are k-row broadcast state
    (audience-overlap / join-selectivity estimation without the
    join); building them costs one distinct + take-ordered per side."""
    sa = kmv_sketch(a, key_col, k)
    sb = kmv_sketch(b, key_col, k)
    union = (
        sa.unionByName(sb)
        .groupBy("__key")
        .agg(F.min("__pri").alias("__pri"))
        .orderBy("__pri", "__key")
        .limit(k)
    )
    in_both = (
        union.join(sa.select("__key"), "__key", "left_semi")
        .join(sb.select("__key"), "__key", "left_semi")
    )
    exact = (
        a.select(F.col(key_col).alias("__key"))
        .distinct()
        .join(
            b.select(F.col(key_col).alias("__key")).distinct(),
            "__key",
            "left_semi",
        )
        .agg(F.count(F.lit(1)).alias("n_intersect_exact"))
    )
    stats = union.agg(
        F.count(F.lit(1)).alias("n_union_sample"),
        F.max("__pri").alias("__kth"),
    )
    c = in_both.agg(F.count(F.lit(1)).alias("c_common"))
    row = stats.crossJoin(c).crossJoin(exact)
    u = F.conv(F.substring("__kth", 1, 13), 16, 10).cast("bigint").cast(
        "double"
    ) / F.lit(float(16**13))
    small = F.col("n_union_sample") < F.lit(k)
    union_est = F.when(
        small, F.col("n_union_sample").cast("double")
    ).otherwise((F.lit(k) - 1) / u)
    jac = F.col("c_common").cast("double") / F.col("n_union_sample")
    return row.select(
        F.lit(k).alias("k"),
        "n_union_sample",
        "c_common",
        "n_intersect_exact",
        union_est.alias("union_est"),
        jac.alias("jaccard_est"),
        (jac * union_est).alias("intersect_est"),
    )
