"""Tests for operators/clustering.py — Lloyd's k-means and SemDeDup.

The reference app has no clustering surface; these pin the tier-D
extension's contracts: deterministic seeding/assignment, the Lloyd's
objective (inertia) never increasing across iterations, recovery of
well-separated synthetic clusters, and the SemDeDup survivor rule.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as Ty

from etl_cortex_spark.operators import clustering as CL

SF_SMOKE = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


# --- deterministic seeding + assignment --------------------------------------


def test_initial_centroids_are_lowest_ids(spark):
    emb = _emb(spark)
    cents = CL.initial_centroids(emb, 4)
    want = [
        [float(x) for x in r.v]
        for r in emb.select(
            "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
        )
        .orderBy("vec_id")
        .limit(4)
        .collect()
    ]
    assert cents == want


def test_assignment_deterministic_across_runs(spark):
    emb = _emb(spark)
    cents = CL.initial_centroids(emb, 4)
    a = CL.assign_centroids(emb, cents).orderBy("vec_id").collect()
    b = CL.assign_centroids(emb, cents).orderBy("vec_id").collect()
    assert a == b


def test_assignment_is_true_argmin(spark):
    """Cross-check the struct-array argmin against a brute-force
    per-centroid distance computation on a small sample."""
    emb = _emb(spark).limit(20)
    cents = CL.initial_centroids(emb, 3)
    rows = CL.assign_centroids(emb, cents).collect()
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in emb.select("vec_id", "embedding").collect()
    }
    for r in rows:
        v = vecs[r.vec_id]
        dists = [
            round(sum((a - b) * (a - b) for a, b in zip(v, c)), 6) for c in cents
        ]
        assert dists[r.cluster] == min(dists)
        assert abs(r.sq_dist - min(dists)) < 1e-9


def test_assignment_sql_form_equals_column_reference(spark):
    """Round-19 pin: `_assign` is rendered as parsed SQL text (one
    py4j call instead of ~k·dim·6 Column calls). The parsed tree must
    stay operation-identical to the Column form it replaced — same
    zip_with/aggregate fold, same round-then-argmin, same
    lowest-index tie rule, same NULL guard. Reference rebuilt here
    with the Column API over an adversarial fixture: an exact
    tie between centroids 0 and 1, a NULL vector, and an ordinary
    point."""
    cents = [[0.0, 0.0], [0.0, 0.0], [3.0, 4.0]]  # 0 and 1 tie always
    df = spark.createDataFrame(
        [(1, [1.0, 1.0]), (2, None), (3, [3.0, 4.0])],
        "vec_id bigint, __v array<double>",
    )
    got = df.select("vec_id", *CL._assign(cents, "__v", 6)).collect()

    # the pre-round-19 Column construction, verbatim
    v = F.transform(F.col("__v"), lambda x: x.cast("double"))

    def sq(c):
        carr = F.array(*[F.lit(float(x)) for x in c])
        return F.aggregate(
            F.zip_with(v, carr, lambda x, cc: (x - cc) * (x - cc)),
            F.lit(0.0),
            lambda s, x: s + x,
        )

    pairs = F.array(
        *[
            F.struct(F.round(sq(c), 6).alias("dist"), F.lit(j).alias("idx"))
            for j, c in enumerate(cents)
        ]
    )
    best = F.array_min(pairs)
    want = df.select(
        "vec_id",
        F.when(v.isNotNull(), best["idx"]).alias("cluster"),
        F.when(v.isNotNull(), best["dist"]).alias("sq_dist"),
    ).collect()
    assert sorted(got) == sorted(want)
    by_id = {r.vec_id: r for r in got}
    assert by_id[1].cluster == 0  # tie -> lowest index
    assert by_id[2].cluster is None and by_id[2].sq_dist is None
    assert by_id[3].cluster == 2 and by_id[3].sq_dist == 0.0


def test_assignment_column_form_equals_literal_reference(spark):
    """Round-20 pin: the production assignment runs against a flat
    centroid-literal COLUMN (`_cents_lit` + `_assign_cols`) so Lloyd
    iterations reuse one O(1)-sized parsed argmin plan. It must stay
    operation-identical to the literal-embedding `_assign` reference —
    same fold element order, same round-before-argmin, same
    lexicographic lowest-index tie rule, same NULL-vector guard — on
    the adversarial tie/NULL fixture AND on real sf0.001 embeddings
    (bit-equal sq_dist included)."""
    cents = [[0.0, 0.0], [0.0, 0.0], [3.0, 4.0]]  # 0 and 1 tie always
    df = spark.createDataFrame(
        [(1, [1.0, 1.0]), (2, None), (3, [3.0, 4.0])],
        "vec_id bigint, __v array<double>",
    )
    ref = df.select("vec_id", *CL._assign(cents, "__v", 6)).collect()
    cluster, dist = CL._assign_cols(len(cents), "__v", "__cents", 6)
    got = (
        df.withColumn("__cents", CL._cents_lit(cents))
        .select("vec_id", cluster, dist)
        .collect()
    )
    assert sorted(got) == sorted(ref)

    emb = _emb(spark).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("__v"),
    )
    k = 5
    real_cents = CL.initial_centroids(emb, k, "vec_id", "__v")
    ref2 = emb.select("vec_id", *CL._assign(real_cents, "__v", 6)).collect()
    cluster2, dist2 = CL._assign_cols(k, "__v", "__cents", 6)
    got2 = (
        emb.withColumn("__cents", CL._cents_lit(real_cents))
        .select("vec_id", cluster2, dist2)
        .collect()
    )
    assert sorted(got2) == sorted(ref2)  # exact equality incl. sq_dist


def test_render_double_non_finite_guard(spark):
    """Round-20 (r19 ADVICE): non-finite centroid elements render as
    parseable CASTs instead of the unparseable ``infD``/``nanD``."""
    import math

    cents = [[float("inf"), float("-inf")], [float("nan"), 1.0]]
    row = (
        spark.range(1)
        .select(CL._cents_lit(cents).alias("__cents"))
        .collect()[0]["__cents"]
    )
    assert row[0][0] == float("inf") and row[0][1] == float("-inf")
    assert math.isnan(row[1][0]) and row[1][1] == 1.0


# --- Lloyd's convergence ------------------------------------------------------


def test_inertia_non_increasing(spark):
    emb = _emb(spark)
    prev = None
    for iters in (0, 1, 2, 3):
        if iters == 0:
            cents = CL.initial_centroids(emb, 4)
            assigned = CL.assign_centroids(emb, cents)
        else:
            assigned = CL.kmeans_fit_predict(emb, k=4, iters=iters)
        cur = CL.inertia(assigned)
        if prev is not None:
            assert cur <= prev + 1e-6, f"inertia rose at iter {iters}: {prev} -> {cur}"
        prev = cur


def test_recovers_separated_clusters(spark):
    """Three tight blobs far apart, ids interleaved so the lowest-id
    seeds land one per blob: Lloyd's must put each blob in exactly one
    cluster."""
    offsets = {0: 0.0, 1: 100.0, 2: -100.0}
    rows = [
        (blob + 3 * i, [offsets[blob] + 0.01 * i, offsets[blob] - 0.01 * i])
        for blob in (0, 1, 2)
        for i in range(8)
    ]
    schema = Ty.StructType(
        [
            Ty.StructField("vec_id", Ty.LongType()),
            Ty.StructField("embedding", Ty.ArrayType(Ty.DoubleType())),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    out = CL.kmeans_fit_predict(df, k=3, iters=5).collect()
    label_of = {r.vec_id: r.cluster for r in out}
    for blob in (0, 1, 2):
        blob_labels = {label_of[blob + 3 * i] for i in range(8)}
        assert len(blob_labels) == 1, f"blob {blob} split across {blob_labels}"
    assert len({label_of[blob] for blob in (0, 1, 2)}) == 3


def test_empty_cluster_keeps_previous_centroid(spark):
    """k larger than the number of distinct points: surplus clusters
    must not crash the update loop (they keep their seed centroid)."""
    rows = [(i, [float(i % 2), float(i % 2)]) for i in range(6)]
    schema = Ty.StructType(
        [
            Ty.StructField("vec_id", Ty.LongType()),
            Ty.StructField("embedding", Ty.ArrayType(Ty.DoubleType())),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    out = CL.kmeans_fit_predict(df, k=4, iters=3)
    assert out.count() == 6


# --- SemDeDup ----------------------------------------------------------------


def test_semantic_dedup_drops_perturbed_copies(spark):
    """Seeded near-identical copies (cosine ~ 1 with their original,
    higher id) must lose; originals must survive."""
    emb = _emb(spark)
    copies = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") + 0.01).alias("embedding"),
        "label",
    )
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        "label",
    )
    seeded = base.unionByName(copies)
    survivors = CL.semantic_dedup(seeded, threshold=0.99, n_planes=4, seed=7)
    ids = {r.vec_id for r in survivors.select("vec_id").collect()}
    originals = {r.vec_id for r in base.select("vec_id").collect()}
    copy_ids = {r.vec_id for r in copies.select("vec_id").collect()}
    # every original survives (no copy has a lower id than its original)
    assert originals <= ids
    # the copies share a bucket with their original (same sign pattern
    # for a tiny perturbation in almost all cases) and must be dropped
    assert len(copy_ids & ids) <= len(copy_ids) * 0.2, (
        f"{len(copy_ids & ids)}/{len(copy_ids)} seeded copies survived"
    )


def test_semantic_dedup_preserves_input_columns(spark):
    emb = _emb(spark).limit(50)
    out = CL.semantic_dedup(emb, threshold=0.99, n_planes=4, seed=7)
    assert set(emb.columns) <= set(out.columns)
    assert "bucket" in out.columns


def test_semantic_dedup_no_dups_is_identity(spark):
    """With an impossible threshold nothing is dropped."""
    emb = _emb(spark).limit(100)
    out = CL.semantic_dedup(emb, threshold=1.5, n_planes=4, seed=7)
    assert out.count() == 100


def test_semantic_dedup_tolerates_leading_null_embedding(spark):
    """Dim inference skips NULL vectors (round-3 advice): a NULL
    embedding sorted first must not abort the job."""
    emb = _emb(spark).limit(20)
    nulled = spark.createDataFrame(
        [(-1, None, "x")], schema="vec_id long, embedding array<double>, label string"
    )
    seeded = nulled.unionByName(
        emb.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
            "label",
        )
    )
    out = CL.semantic_dedup(seeded, threshold=0.99, n_planes=4, seed=7)
    assert out.count() >= 20


def test_semantic_dedup_all_null_still_raises(spark):
    import pytest as _pytest

    nulled = spark.createDataFrame(
        [(1, None, "x")], schema="vec_id long, embedding array<double>, label string"
    )
    with _pytest.raises(ValueError, match="cannot infer vector dim"):
        CL.semantic_dedup(nulled, threshold=0.99, n_planes=4, seed=7)


def test_kmeans_null_first_vector_does_not_abort(spark):
    """Round-4 advice: a NULL embedding holding the LOWEST id must not
    abort the fit — the seed skips it, the NULL row comes back with a
    NULL cluster, and every real row is assigned normally."""
    rows = [(0, None)] + [
        (i, [float(i % 3), float((i * 7) % 5), 1.0, 0.5]) for i in range(1, 30)
    ]
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<double>")

    seeds = CL.initial_centroids(df, k=3)
    assert len(seeds) == 3 and all(len(c) == 4 for c in seeds)
    # seeds are ids 1, 2, 3 — the NULL id-0 row was skipped
    assert seeds[0] == [1.0, 2.0, 1.0, 0.5]

    out = CL.kmeans_fit_predict(df, k=3, iters=2).collect()
    by_id = {r["vec_id"]: r["cluster"] for r in out}
    assert by_id[0] is None
    assert all(by_id[i] is not None for i in range(1, 30))


def test_kmeans_all_null_raises(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, None), (2, None)], schema="vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="no non-NULL"):
        CL.initial_centroids(df, k=2)


def test_pq_codebooks_null_first_vector_does_not_abort(spark):
    from etl_cortex_spark.operators import pq as PQ

    rows = [(0, None)] + [
        (i, [float(i), 1.0, float(i % 2), 0.0]) for i in range(1, 10)
    ]
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<double>")
    books = PQ.deterministic_codebooks(df, m=2, k=4)
    assert len(books) == 2 and len(books[0]) == 4
    assert books[0][0] == [1.0, 1.0]  # id 1, not the NULL id 0


# --- bucketed semantic decontamination (round 13) ----------------------------


def _sem_lsh_fixture(spark):
    from etl_cortex_spark.inventory.tier_d_prep import _sem_lsh_bench_train

    return _sem_lsh_bench_train(spark, SF_SMOKE)


def test_semantic_contamination_lsh_recall_and_no_false_positives(spark):
    """The bucketed decontamination sibling: (a) candidates are a
    subset of all pairs, so the bucketed max_cosine can never EXCEED
    the exact one — no false positives by construction; (b) on the
    perturbed seeding the radius-1 multi-probe catches every exact
    flag (measured recall 1.0 at all three SFs, deterministic for
    fixed data+planes); (c) one output row per benchmark id, misses
    flagged false rather than dropped."""
    from etl_cortex_spark.operators import llmprep as LP

    bench, train = _sem_lsh_fixture(spark)
    exact = {
        r.bench_id: (r.max_cosine, r.contaminated)
        for r in LP.semantic_contamination(train, bench, threshold=0.99).collect()
    }
    approx = {
        r.bench_id: (r.max_cosine, r.contaminated)
        for r in LP.semantic_contamination_lsh(
            train, bench, threshold=0.99, probe_radius=1
        ).collect()
    }
    assert set(approx) == set(exact)  # every bench id present
    for bid, (mc, flag) in approx.items():
        emc, eflag = exact[bid]
        if mc is not None:
            assert mc <= emc  # bucketed candidates ⊆ all pairs
        if flag:
            assert eflag  # no false positives
    exact_flagged = {b for b, (_, f) in exact.items() if f}
    caught = {b for b, (_, f) in approx.items() if f}
    assert exact_flagged, "seeding must plant contamination"
    assert len(exact_flagged & caught) / len(exact_flagged) >= 0.95


def test_semantic_contamination_lsh_multiprobe_monotone(spark):
    """Raising probe_radius can only ADD candidates: radius-2 flags a
    superset of radius-1, which flags a superset of radius-0."""
    from etl_cortex_spark.operators import llmprep as LP

    bench, train = _sem_lsh_fixture(spark)
    sets = []
    for r in (0, 1, 2):
        out = LP.semantic_contamination_lsh(
            train, bench, threshold=0.99, probe_radius=r
        )
        sets.append({x.bench_id for x in out.filter("contaminated").collect()})
    assert sets[0] <= sets[1] <= sets[2]


def test_semantic_contamination_lsh_empty_benchmark_raises(spark):
    from etl_cortex_spark.operators import llmprep as LP

    bench, train = _sem_lsh_fixture(spark)
    with pytest.raises(ValueError, match="cannot infer vector dim"):
        LP.semantic_contamination_lsh(train, bench.filter("bench_id < 0"))
