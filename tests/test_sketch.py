"""Count-Min Sketch invariants (operators/sketch.py): never-undercount,
eps*N overestimate bound, exact merge, and cross-check against the
hand-computed model.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_cortex_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_merge,
    cms_params,
)


def _freqs(spark, pairs):
    """pairs: [(key, n_copies)] → one-row-per-occurrence DataFrame."""
    rows = [(k,) for k, n in pairs for _ in range(n)]
    return spark.createDataFrame(rows, "k bigint")


def _est_map(sketch, probes, width, depth):
    out = cms_estimate(sketch, probes, "k", width, depth)
    return {r["k"]: r["est"] for r in out.collect()}


def test_wide_sketch_is_exact_and_zero_for_unseen(spark):
    pairs = [(1, 5), (2, 3), (7, 1), (1000, 10)]
    df = _freqs(spark, pairs)
    width, depth = cms_params(0.01, 0.01)  # 272 counters/row, 19 keys: no collision
    sketch = cms_build(df, "k", width, depth)
    probes = spark.createDataFrame([(k,) for k, _ in pairs] + [(999,)], "k bigint")
    est = _est_map(sketch, probes, width, depth)
    assert est == {1: 5, 2: 3, 7: 1, 1000: 10, 999: 0}


def test_narrow_sketch_never_undercounts_and_respects_eps_bound(spark):
    # 40 distinct keys forced into width=16: collisions guaranteed.
    pairs = [(k, (k % 5) + 1) for k in range(40)]
    df = _freqs(spark, pairs)
    n_total = sum(n for _, n in pairs)
    width, depth = 16, 5
    sketch = cms_build(df, "k", width, depth)
    probes = spark.createDataFrame([(k,) for k, _ in pairs], "k bigint")
    est = _est_map(sketch, probes, width, depth)
    exact = dict(pairs)
    assert all(est[k] >= exact[k] for k in exact), "CMS undercounted"
    # the formal bound is eps=e/width with prob 1-delta; depth=5 on a
    # fixed seedless hash makes this effectively deterministic here
    eps = 2.718281828 / width
    assert all(est[k] <= exact[k] + eps * n_total for k in exact)


def test_merge_equals_rebuild(spark):
    a = _freqs(spark, [(1, 4), (2, 2), (3, 1)])
    b = _freqs(spark, [(2, 5), (3, 1), (9, 7)])
    width, depth = 32, 4
    merged = cms_merge(cms_build(a, "k", width, depth), cms_build(b, "k", width, depth))
    rebuilt = cms_build(a.unionByName(b), "k", width, depth)
    m = {(r["i"], r["bucket"]): r["cnt"] for r in merged.collect()}
    r_ = {(r["i"], r["bucket"]): r["cnt"] for r in rebuilt.collect()}
    assert m == r_


def test_sketch_size_is_bounded(spark):
    df = _freqs(spark, [(k, 3) for k in range(200)])
    width, depth = 16, 5
    sketch = cms_build(df, "k", width, depth)
    assert sketch.count() <= width * depth
    # total mass per depth row == N (counters partition the stream)
    per_row = {
        r["i"]: r["s"]
        for r in sketch.groupBy("i").agg(F.sum("cnt").alias("s")).collect()
    }
    assert set(per_row) == set(range(depth))
    assert all(v == 600 for v in per_row.values())


def test_streamed_sketch_equals_batch_build_and_replay_is_noop(spark, tmp_path):
    """foreach_batch_cms over micro-batches must produce EXACTLY the
    sketch cms_build produces over the whole input at once (merge is
    associative+commutative), and re-draining with the same checkpoint
    must not change it (guard-file idempotence)."""
    import os

    from etl_cortex_spark.streaming.ingest import (
        foreach_batch_cms,
        read_upsert_table,
    )

    src = tmp_path / "src"
    src.mkdir()
    a = spark.createDataFrame([(k % 7,) for k in range(40)], "k bigint")
    b = spark.createDataFrame([(k % 11,) for k in range(60)], "k bigint")
    a.coalesce(1).write.parquet(str(src / "a.parquet"))
    b.coalesce(1).write.parquet(str(src / "b.parquet"))

    width, depth = 32, 4
    stream = (
        spark.readStream.schema("k bigint")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    table_dir = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    q = foreach_batch_cms(stream, table_dir, ckpt, "k", width, depth)
    q.awaitTermination()
    from etl_cortex_spark.streaming.ingest import guard_applied

    gdir = os.path.join(ckpt, "applied_batches")
    assert guard_applied(gdir, 0) and guard_applied(gdir, 1), (
        "expected one commit per micro-batch in the bounded guard state"
    )

    streamed = {
        (r["i"], r["bucket"]): r["cnt"]
        for r in read_upsert_table(spark, table_dir).collect()
    }
    batch = {
        (r["i"], r["bucket"]): r["cnt"]
        for r in cms_build(a.unionByName(b), "k", width, depth).collect()
    }
    assert streamed == batch

    q2 = foreach_batch_cms(stream, table_dir, ckpt, "k", width, depth)
    q2.awaitTermination()
    streamed2 = {
        (r["i"], r["bucket"]): r["cnt"]
        for r in read_upsert_table(spark, table_dir).collect()
    }
    assert streamed2 == streamed


def test_cms_is_partition_invariant(spark):
    """Counter addition is associative+commutative, so the sketch must
    be identical under any partitioning of the input — the property
    that makes per-partition partial aggregation (and the streaming
    merge) exact."""
    df = _freqs(spark, [(k, (k % 9) + 1) for k in range(60)])
    width, depth = 16, 5
    a = {
        (r["i"], r["bucket"]): r["cnt"]
        for r in cms_build(df.repartition(3), "k", width, depth).collect()
    }
    b = {
        (r["i"], r["bucket"]): r["cnt"]
        for r in cms_build(df.repartition(29), "k", width, depth).collect()
    }
    assert a == b


# --- bottom-k sample sketch ---------------------------------------------------


def test_bottomk_merge_equals_direct_build(spark):
    """KMV mergeability: bottom-k of the union of per-subgroup
    bottom-k sketches must equal bottom-k built directly on the
    coarser grouping — priorities are global content hashes."""
    from etl_cortex_spark.operators.sketch import bottomk_build, bottomk_merge

    rows = [(i, i % 7, i % 3, float((i * 37) % 1000)) for i in range(2000)]
    df = spark.createDataFrame(rows, "k bigint, fine int, coarse int, v double")
    fine = bottomk_build(df, ["fine", "coarse"], "v", "k", 32)
    merged = bottomk_merge(fine.select("coarse", "__pri", "__key", "v"), ["coarse"], 32)
    direct = bottomk_build(df, ["coarse"], "v", "k", 32)
    a = sorted((r["coarse"], r["__key"]) for r in merged.collect())
    b = sorted((r["coarse"], r["__key"]) for r in direct.collect())
    assert a == b and len(a) == 3 * 32


def test_bottomk_quantile_rank_error_bounded(spark):
    """The sample median must land within ~2/sqrt(k) rank error of the
    exact median (uniform-sample order-statistic bound, generous)."""
    from etl_cortex_spark.operators.sketch import bottomk_build, bottomk_quantile

    n, k = 5000, 128
    rows = [(i, 0, float(i)) for i in range(n)]  # values 0..n-1, exact median known
    df = spark.createDataFrame(rows, "k bigint, g int, v double")
    sk = bottomk_build(df, ["g"], "v", "k", k)
    est = bottomk_quantile(sk, ["g"], "v", 0.5).first()
    rank = est[f"p50_v"] / (n - 1)  # value == its own rank here
    assert abs(rank - 0.5) < 2 / (k ** 0.5), rank


def test_bottomk_build_plans_as_window_group_limit(spark):
    from etl_cortex_spark.operators.sketch import bottomk_build

    df = spark.createDataFrame([(i, i % 3, 1.0) for i in range(100)], "k bigint, g int, v double")
    plan = (
        bottomk_build(df, ["g"], "v", "k", 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


# --- Bloom filter (set membership, operators/sketch.bloom_*) ------------------


def test_bloom_never_false_negative(spark):
    """Every key that was built into the filter must probe positive —
    the decontamination contract (a missed benchmark gram is a leak)."""
    from etl_cortex_spark.operators import sketch as SK

    keys = spark.range(0, 500).select(
        F.concat(F.lit("gram-"), F.col("id")).alias("k")
    )
    filt = SK.bloom_build(keys, "k")
    probed = keys.crossJoin(F.broadcast(filt)).select(
        SK.bloom_might_contain(F.col("k")).alias("hit")
    )
    assert probed.filter(~F.col("hit")).count() == 0


def test_bloom_false_positive_rate_is_small(spark):
    """Disjoint probe keys may collide, but with 500 built keys the
    per-bank hit rate is 500/65536, so the k=3 conjunction should pass
    ~(500/65536)^3 ≈ 4e-7 of probes — assert well under 1%."""
    from etl_cortex_spark.operators import sketch as SK

    built = spark.range(0, 500).select(
        F.concat(F.lit("gram-"), F.col("id")).alias("k")
    )
    probes = spark.range(0, 2000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("k")
    )
    filt = SK.bloom_build(built, "k")
    fp = (
        probes.crossJoin(F.broadcast(filt))
        .filter(SK.bloom_might_contain(F.col("k")))
        .count()
    )
    assert fp <= 20, f"false-positive count {fp} out of 2000 probes"


def test_bloom_state_is_bounded(spark):
    """Each bank is EXACTLY a 65536-slot boolean bitset with at most
    |keys| bits set — the constant-size-broadcast claim."""
    from etl_cortex_spark.operators import sketch as SK

    keys = spark.range(0, 3000).select(F.col("id").cast("string").alias("k"))
    row = SK.bloom_build(keys, "k").collect()[0]
    for i in range(3):
        bank = row[f"__bloom_{i}"]
        assert len(bank) == SK.BLOOM_BANK_SIZE
        assert all(isinstance(x, bool) for x in bank[:10])
        assert 0 < sum(bank) <= 3000


def test_bloom_decontaminate_covers_exact_flagged_set(spark):
    """d91's Bloom candidate count dominates d12's exact match count
    per doc (no false negatives ⇒ candidates ⊇ matches), so the
    flagged set is a superset of the exact flagged set — and the
    benchmark slice itself is flagged at bloom_overlap 1.0."""
    from etl_cortex_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    exact = {r["doc_id"] for r in QUERIES["d12_contamination_check"](spark, sf).collect()}
    bloom_rows = QUERIES["d91_bloom_decontaminate"](spark, sf).collect()
    bloom = {r["doc_id"] for r in bloom_rows}
    assert exact <= bloom, f"exact-flagged docs missing from bloom: {sorted(exact - bloom)[:5]}"
    bench_full = {r["doc_id"] for r in bloom_rows if r["doc_id"] % 97 == 0}
    for r in bloom_rows:
        if r["doc_id"] % 97 == 0:
            assert r["bloom_overlap"] == 1.0
    assert bench_full, "benchmark slice not flagged at all"


def test_streamed_bloom_equals_batch_build_and_replay_is_noop(spark, tmp_path):
    """foreach_batch_bloom over micro-batches must produce EXACTLY the
    bitset bloom_build produces over the whole input at once (OR is
    associative+commutative+idempotent), and re-draining with the same
    checkpoint must not change it (guard-file idempotence)."""
    import os

    from etl_cortex_spark.operators import sketch as SK
    from etl_cortex_spark.streaming.ingest import (
        foreach_batch_bloom,
        read_upsert_table,
    )

    src = tmp_path / "src"
    src.mkdir()
    a = spark.createDataFrame([(f"k{i % 7}",) for i in range(40)], "k string")
    b = spark.createDataFrame([(f"k{i % 11}",) for i in range(60)], "k string")
    a.coalesce(1).write.parquet(str(src / "a.parquet"))
    b.coalesce(1).write.parquet(str(src / "b.parquet"))

    stream = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    table_dir = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    q = foreach_batch_bloom(stream, table_dir, ckpt, "k")
    q.awaitTermination()
    from etl_cortex_spark.streaming.ingest import guard_applied

    gdir = os.path.join(ckpt, "applied_batches")
    assert guard_applied(gdir, 0) and guard_applied(gdir, 1), (
        "expected one commit per micro-batch in the bounded guard state"
    )

    streamed = read_upsert_table(spark, table_dir).collect()[0]
    batch = SK.bloom_build(a.unionByName(b), "k").collect()[0]
    for i in range(3):
        assert list(streamed[f"__bloom_{i}"]) == list(batch[f"__bloom_{i}"])

    q2 = foreach_batch_bloom(stream, table_dir, ckpt, "k")
    q2.awaitTermination()
    streamed2 = read_upsert_table(spark, table_dir).collect()[0]
    for i in range(3):
        assert list(streamed2[f"__bloom_{i}"]) == list(streamed[f"__bloom_{i}"])


def test_bloom_of_empty_key_set_rejects_everything(spark):
    """An empty build set must yield an all-zeros bitset (the
    run-length encoder's empty-set branch), and every probe must then
    test negative — no benchmark grams means nothing is flagged."""
    from etl_cortex_spark.operators import sketch as SK

    empty = spark.createDataFrame([], "k string")
    filt = SK.bloom_build(empty, "k")
    row = filt.collect()[0]
    for i in range(3):
        assert len(row[f"__bloom_{i}"]) == SK.BLOOM_BANK_SIZE
        assert not any(row[f"__bloom_{i}"])
    probes = spark.range(0, 50).select(F.col("id").cast("string").alias("k"))
    hits = (
        probes.crossJoin(F.broadcast(filt))
        .filter(SK.bloom_might_contain(F.col("k")))
        .count()
    )
    assert hits == 0


def test_streamed_hll_equals_batch_build_and_replay_is_noop(spark, tmp_path):
    """foreach_batch_hll (round 11) over micro-batches must estimate
    EXACTLY what one hll_sketch_agg over the whole input estimates
    (union = register-wise max: associative, commutative, idempotent),
    and re-draining with the same checkpoint must not change it."""
    import os

    from etl_cortex_spark.streaming.ingest import (
        foreach_batch_hll,
        read_upsert_table,
    )

    src = tmp_path / "src"
    src.mkdir()
    a = spark.createDataFrame([(k % 37,) for k in range(80)], "k bigint")
    b = spark.createDataFrame([(k % 53,) for k in range(90)], "k bigint")
    a.coalesce(1).write.parquet(str(src / "a.parquet"))
    b.coalesce(1).write.parquet(str(src / "b.parquet"))

    stream = (
        spark.readStream.schema("k bigint")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    table_dir = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    q = foreach_batch_hll(stream, table_dir, ckpt, "k", lg_k=12)
    q.awaitTermination()
    from etl_cortex_spark.streaming.ingest import guard_applied

    gdir = os.path.join(ckpt, "applied_batches")
    assert guard_applied(gdir, 0) and guard_applied(gdir, 1), (
        "expected one commit per micro-batch in the bounded guard state"
    )

    def est(df):
        return df.select(F.hll_sketch_estimate("sketch").alias("e")).first()["e"]

    streamed = est(read_upsert_table(spark, table_dir))
    batch = est(
        a.unionByName(b).agg(F.hll_sketch_agg("k", 12).alias("sketch"))
    )
    assert streamed == batch
    # 53 distinct keys at lg_k=12: the sketch is effectively exact
    assert abs(streamed - 53) / 53 <= 0.05

    q2 = foreach_batch_hll(stream, table_dir, ckpt, "k", lg_k=12)
    q2.awaitTermination()
    assert est(read_upsert_table(spark, table_dir)) == streamed


def test_streamed_kmv_equals_batch_build_and_replay_is_noop(spark, tmp_path):
    """foreach_batch_kmv (round 11): the drained bottom-k sample must
    EQUAL the one bottomk_build produces over the whole input at once
    (union-rerank-truncate is associative/commutative/idempotent on
    global hash priorities), and re-draining must not change it."""
    from etl_cortex_spark.operators.sketch import bottomk_build
    from etl_cortex_spark.streaming.ingest import (
        foreach_batch_kmv,
        read_upsert_table,
    )

    src = tmp_path / "src"
    src.mkdir()
    a = spark.createDataFrame(
        [(k, float(k % 13)) for k in range(70)], "k bigint, v double"
    )
    b = spark.createDataFrame(
        [(k, float(k % 17)) for k in range(70, 160)], "k bigint, v double"
    )
    a.coalesce(1).write.parquet(str(src / "a.parquet"))
    b.coalesce(1).write.parquet(str(src / "b.parquet"))
    stream = (
        spark.readStream.schema("k bigint, v double")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    table_dir = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    q = foreach_batch_kmv(stream, table_dir, ckpt, "v", "k", k=16)
    q.awaitTermination()

    def sample(df):
        return sorted((r["__key"], r["v"]) for r in df.collect())

    streamed = sample(read_upsert_table(spark, table_dir))
    assert len(streamed) == 16
    batch = sample(
        bottomk_build(
            a.unionByName(b).withColumn("__g", F.lit(1)), ["__g"], "v", "k", 16
        )
    )
    assert streamed == batch

    q2 = foreach_batch_kmv(stream, table_dir, ckpt, "v", "k", k=16)
    q2.awaitTermination()
    assert sample(read_upsert_table(spark, table_dir)) == streamed


def test_kmv_intersection_estimates_and_small_set_exactness(spark):
    """KMV intersection: on a synthetic pair with known overlap the
    estimate lands within 4/sqrt(k) relative error of truth (99.9%+
    envelope), the emitted exact count is right, and when the union
    fits inside k the small-set branch returns EXACT values."""
    from pyspark.sql import functions as F

    from etl_cortex_spark.operators.sketch import kmv_intersection

    a = spark.range(0, 4000).select(F.col("id").alias("key"))
    b = spark.range(2000, 7000).select(F.col("id").alias("key"))
    r = kmv_intersection(a, b, "key", k=256).collect()[0]
    assert r["n_intersect_exact"] == 2000
    assert r["n_union_sample"] == 256
    rel = 4.0 / (256 ** 0.5)
    assert abs(r["union_est"] - 7000) / 7000 < rel
    assert abs(r["intersect_est"] - 2000) / 2000 < 2 * rel
    # small-set branch: union fits in k -> everything exact
    a2 = spark.range(0, 30).select(F.col("id").alias("key"))
    b2 = spark.range(20, 50).select(F.col("id").alias("key"))
    r2 = kmv_intersection(a2, b2, "key", k=256).collect()[0]
    assert r2["n_union_sample"] == 50
    assert r2["union_est"] == 50.0
    assert r2["c_common"] == 10 and r2["intersect_est"] == 10.0
