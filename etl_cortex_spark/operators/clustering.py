"""Distributed embedding clustering and SemDeDup-style semantic dedup.

The reference app has no ML surface; these extend the tier-D
similarity/dedup families (SURVEY §2 D2/D3) with the cluster-then-
prune pipeline (SemDeDup: Abbas et al. 2023) a pretraining corpus
runs over its embedding table.

Scale design:
- ``kmeans_fit_predict`` is Lloyd's with the model kept driver-side
  (k×dim floats — model state, the same thing MLlib's KMeans
  collects), while ALL data movement stays declarative: assignment is
  a shuffle-free projection against a flat centroid-literal column
  (round 20: the argmin expression references the column, so its tree
  is O(1) in k·dim and Lloyd iterations reuse one parsed plan), the
  centroid update is one (cluster, dim-position) partial-aggregated
  shuffle per iteration. Per-iteration cost at 100 TB = one scan +
  one narrow agg; the assignment output is re-derived at the end
  rather than persisted per iteration.
- ``semantic_dedup`` buckets by deterministic sign-LSH, so the
  pairwise cosine check is a within-bucket self-join (O(Σ bucket²)
  with 2^n_planes buckets bounding bucket size), never all-pairs.
  Deterministic survivor rule: a vector is dropped iff some
  lower-id vector in its bucket is ≥ threshold similar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_cortex_spark.operators.similarity import (
    as_double,
    dot,
    hyperplanes,
    lsh_bucket,
    norm_sq_expr,
)


def _render_double(x: float) -> str:
    """One double as SQL text, bit-identical under re-parse: shortest-
    roundtrip repr + D suffix for finite values; non-finite values
    (inf/nan — e.g. a degenerate data-derived centroid) render as the
    explicit CASTs because ``infD``/``nanD`` do not parse (round-20,
    the r19 ADVICE guard)."""
    x = float(x)
    if x != x:
        return "CAST('NaN' AS DOUBLE)"
    if x == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if x == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return f"{x!r}D"


def _safe_ident(name: str) -> str:
    """Backtick-quote an identifier for SQL-text interpolation,
    escaping embedded backticks (round-20 — the r19 ADVICE hole:
    internal callers always pass ``__v``, but a user column named
    with a backtick must not silently break the expression)."""
    return "`" + name.replace("`", "``") + "`"


def _sq_dist_sql(vec_sql: str, centroid: list[float]) -> str:
    """Σ (v[i]-c[i])^2 against a LITERAL centroid, as the zip_with/
    aggregate fold over a literal array — rendered as SQL TEXT. Round 9
    unrolled this to an element_at chain on a single slope-window
    measurement; the round-10 interleaved A/B (similarity.py block
    comment) refuted that — at 64 dims the fold's one tight loop beats
    the giant unrolled expression at every SF, and k centroids multiply
    the expression size here. Round 19 renders the fold as a parsed
    string (one py4j call per assignment instead of ~6 driver
    round-trips per centroid per operator node — the _lit_array
    measurement): the parsed tree is the same functions in the same
    order, so distances stay bit-identical and the d24 oracle is
    unaffected (shortest-roundtrip repr + D suffix re-parses each
    codeword to the same double)."""
    arr = "array(" + ",".join(_render_double(c) for c in centroid) + ")"
    return (
        f"aggregate(zip_with({vec_sql}, {arr}, (x, c) -> (x - c) * (x - c)), "
        f"0.0D, (s, x) -> s + x)"
    )


def _assign(
    centroids: list[list[float]], vec_col: str, precision: int = 6
):
    """Nearest-centroid assignment as a pure projection: an array of
    (dist, idx) structs, array_min = lexicographic min → deterministic
    argmin with the lowest cluster index on ties. Distances are
    rounded to ``precision`` decimals before the argmin so the tie
    rule (not libm ULP) decides near-equidistant points — the SAME
    precision the quantized fit and its SQL oracle round at (round-8
    ADVICE: a hardcoded 6 here silently broke the cross-engine
    contract for any quantize != 6). A NULL vector assigns to a
    NULL cluster explicitly — struct comparison against NULL distances
    would otherwise pick an arbitrary-looking (if deterministic)
    cluster for rows that carry no vector at all.

    Round 19: the whole projection is built as TWO parsed SQL
    expressions instead of ~k·dim·6 py4j Column calls (k-means builds
    a fresh assignment per iteration, so driver-side construction cost
    multiplies); the parsed tree — named_struct/array_min/CASE — is
    operation-identical to the Column form it replaces (same fold,
    same round, same lexicographic min, same NULL guard), pinned by
    the argmin/determinism pytests and the d24 oracles.

    Round 20: this literal-embedding form is the REFERENCE the
    equivalence pin compares against; the production paths
    (`assign_centroids`, `kmeans_fit_predict`) use the join form
    (`_cents_frame` + `_assign_cols`) whose expression tree is O(1)
    in k·dim. The unused ``df`` parameter is gone (r19 ADVICE)."""
    v_sql = f"transform({_safe_ident(vec_col)}, x -> CAST(x AS DOUBLE))"
    structs = ", ".join(
        f"named_struct('dist', round({_sq_dist_sql(v_sql, c)}, {precision}), "
        f"'idx', {j})"
        for j, c in enumerate(centroids)
    )
    best = f"array_min(array({structs}))"
    notnull = f"{v_sql} IS NOT NULL"
    return (
        F.expr(f"CASE WHEN {notnull} THEN {best}.idx END").alias("cluster"),
        F.expr(f"CASE WHEN {notnull} THEN {best}.dist END").alias("sq_dist"),
    )


def _cents_lit(centroids: list[list[float]]):
    """The centroid MODEL as ONE flat ``array<array<double>>`` literal
    column (round 20 — the r19 verdict's "assignment against a
    centroid frame", resolved by measurement): the assignment
    EXPRESSION references this column instead of embedding k·dim
    literals inside every fold, so `_assign_cols`' text is O(1)-sized
    and parsed once per fit, and the only per-iteration driver work is
    this flat literal — ~½ the text and a fraction of the tree of the
    fold-structured form. A broadcast one-row-frame variant was ALSO
    measured (crossJoin + column reference): equal analysis win but
    ~1.3× slower update-job execution (BroadcastNestedLoopJoin +
    unsafe nested-array reads) and an extra job per iteration for the
    broadcast build — the plain literal column keeps the projection
    shuffle-free and whole-stage-friendly, and its codegen source is
    iteration-invariant (complex-type literals travel in references),
    so the compiled plan is reused across Lloyd iterations."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_render_double(c) for c in cw) + ")"
            for cw in centroids
        )
        + ")"
    )


def _assign_cols(
    k: int, vec_col: str, cents_col: str, precision: int = 6
):
    """(cluster, sq_dist) against a centroid COLUMN (see
    `_cents_lit`): operation-identical to `_assign` — the same
    zip_with/aggregate fold per centroid in the same element order,
    the same round-to-``precision`` before the argmin, the same
    lexicographic (dist, idx) array_min tie rule, the same NULL-vector
    guard — so distances and assignments are bit-identical (pinned by
    test_assignment_join_form_equals_literal_reference and the d24
    oracles). The expression text is independent of the centroid
    VALUES, so one parsed pair serves every Lloyd iteration."""
    v_sql = f"transform({_safe_ident(vec_col)}, x -> CAST(x AS DOUBLE))"
    best = (
        f"array_min(zip_with({_safe_ident(cents_col)}, sequence(0, {k - 1}), "
        f"(c, j) -> named_struct("
        f"'dist', round(aggregate(zip_with({v_sql}, c, "
        f"(x, cc) -> (x - cc) * (x - cc)), 0.0D, (s, x) -> s + x), {precision}), "
        f"'idx', CAST(j AS INT))))"
    )
    notnull = f"{v_sql} IS NOT NULL"
    return (
        F.expr(f"CASE WHEN {notnull} THEN {best}.idx END").alias("cluster"),
        F.expr(f"CASE WHEN {notnull} THEN {best}.dist END").alias("sq_dist"),
    )


def initial_centroids(
    df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """Deterministic seed: the k lowest-id NON-NULL vectors (no runtime
    RNG, so every engine and every run agrees; NULL embeddings are
    skipped — a stray NULL row must degrade to "not a seed", never
    abort the fit)."""
    rows = (
        df.where(F.col(vec_col).isNotNull())
        .select(id_col, as_double(F.col(vec_col)).alias("v"))
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if not rows:
        raise ValueError(
            f"initial_centroids: no non-NULL {vec_col!r} vectors to seed from"
        )
    return [[float(x) for x in r.v] for r in rows]


def assign_centroids(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Lloyd's assignment step as a DataFrame: (id, cluster,
    sq_dist) against the broadcast centroid frame — the
    oracle-checkable workhorse the iterative fit repeats."""
    base = df.select(id_col, as_double(F.col(vec_col)).alias("__v"))
    cluster, dist = _assign_cols(len(centroids), "__v", "__cents")
    return base.withColumn("__cents", _cents_lit(centroids)).select(
        id_col, cluster, dist
    )


def kmeans_fit_predict(
    df: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int | None = None,
) -> DataFrame:
    """Lloyd's k-means; returns (id, cluster, sq_dist) for the final
    model. Each iteration collects only the k×dim centroid model (the
    sanctioned driver-side state); data-side work is one scan + one
    (cluster, position) partial-agg shuffle.

    ``quantize=q`` makes the whole fit CROSS-ENGINE DETERMINISTIC (the
    d92 integer-moment discipline, added round 8 so d24_kmeans_sizes
    can carry a full DuckDB oracle): input coordinates are rounded to
    q decimals, and each centroid update sums SCALED INTEGERS (exact
    in any order — no float partial-agg order dependence) before two
    IEEE divisions, (s / n) / 10^q, replayed with the identical
    expression shape in SQL. Distances then depend only on these
    bit-identical inputs. Default None keeps the plain float-avg path
    (one aggregate expression, marginally cheaper)."""
    base = df.select(id_col, as_double(F.col(vec_col)).alias("__v"))
    precision = 6
    if quantize is not None:
        scale = float(10**quantize)
        precision = quantize  # distances round where the inputs do
        base = df.select(
            id_col,
            F.transform(as_double(F.col(vec_col)), lambda x: F.round(x, quantize)).alias(
                "__v"
            ),
        )
    # round 19: every iteration's update job (and the final assign)
    # re-read the scan + quantize projection; a lazy per-instance
    # localCheckpoint materializes (id, __v) once at the first job and
    # the k-means loop iterates over the snapshot — the standard
    # iterative-ML posture (MLlib persists its input the same way),
    # with no cross-run cache (each fit gets its own checkpoint).
    base = base.localCheckpoint(eager=False)
    centroids = initial_centroids(base, k, id_col, "__v")

    dim = len(centroids[0])
    # round 20 (the r19 verdict's #3): the assignment runs against a
    # centroid COLUMN (`_cents_lit`), so the projection's expression
    # text — and the 65-column update aggregate below — are parsed and
    # analyzed over an O(1)-sized tree ONCE here and reused every
    # iteration; only the flat centroid literal is rebuilt per round.
    # Bit-exactness is untouched: _assign_cols replays the literal
    # form's fold/round/argmin op-for-op (equivalence pin in
    # tests/test_clustering.py, plus the d24 oracles).
    cluster, dist = _assign_cols(k, "__v", "__cents", precision)
    if quantize is None:
        agg_cols = [
            F.expr(f"avg(element_at(__v, {i + 1})) AS m{i}") for i in range(dim)
        ]
    else:
        agg_cols = [
            F.expr(
                f"sum(CAST(round(element_at(__v, {i + 1}) * "
                f"{scale!r}D) AS BIGINT)) AS s{i}"
            )
            for i in range(dim)
        ]
    for _ in range(iters):
        assigned = base.withColumn("__cents", _cents_lit(centroids)).select(
            id_col, "__v", cluster
        )
        # Centroid update as ONE narrow k-row aggregate over dim
        # unrolled per-dimension columns (round 9: the posexplode form
        # inflated the scan's shuffle output dim-fold — 64x the rows —
        # for the same k*dim cells; the unrolled projection is codegen
        # and the partial agg compresses to k rows per task). The
        # quantized path's cells are INTEGER sums — exact in any
        # aggregation order — so the d24 oracle is unaffected; the
        # float path's per-dim avg is the same Spark avg aggregate it
        # always was (no oracle depends on its accumulation order).
        # expr-string aggregate columns (round 19): one parsed call per
        # dimension instead of ~6 py4j round-trips each — the update
        # plan is rebuilt per iteration, so construction cost
        # multiplies; parsed trees are the identical sum/round/cast
        # (or avg) expressions.
        if quantize is None:
            new_rows = assigned.groupBy("cluster").agg(*agg_cols).collect()
            updated = {
                r["cluster"]: [float(r[f"m{i}"]) for i in range(dim)]
                for r in new_rows
                if r["cluster"] is not None
            }
        else:
            sums = assigned.groupBy("cluster").agg(
                F.count(F.lit(1)).alias("n"), *agg_cols
            ).collect()
            updated = {
                r["cluster"]: [(r[f"s{i}"] / r["n"]) / scale for i in range(dim)]
                for r in sums
                if r["cluster"] is not None
            }
        # empty clusters keep their previous centroid
        centroids = [updated.get(j, centroids[j]) for j in range(k)]

    return base.withColumn("__cents", _cents_lit(centroids)).select(
        id_col, cluster, dist
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 6,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style pruning: bucket by deterministic sign-LSH, then
    drop every vector that has a lower-id bucket-mate with cosine ≥
    ``threshold``. Returns the surviving rows plus their bucket.

    Greedy-within-bucket (not transitive like ``dedup.near_dedup``):
    mirrors SemDeDup's keep-one-per-ball rule, and the bucket key is a
    partition key at scale (same IVF layout as similarity.lsh_topk)."""
    # Infer dim from the first NON-NULL vector (round-3 advice): a
    # stray NULL embedding landing first must not abort the job when
    # every other row carries a valid vector.
    first = (
        df.where(F.col(vec_col).isNotNull())
        .select(F.size(F.col(vec_col)))
        .first()
    )
    if first is None or first[0] is None or first[0] < 0:
        raise ValueError(
            f"semantic_dedup: cannot infer vector dim — input is empty "
            f"or {vec_col!r} is NULL in every row"
        )
    dim = first[0]
    planes = hyperplanes(dim, n=n_planes, seed=seed)
    v = as_double(F.col(vec_col))
    # Per-vector norm computed ONCE before the quadratic bucket join
    # (round 9: `cosine(va, vb)` re-derived BOTH norms per PAIR — at
    # O(Σ bucket²) pairs that tripled the dominant cost; measured
    # d25 at sf1 54 s → ~20 s). norm_sq_expr keeps l2norm's fold
    # order, so every rounded cosine is bit-identical and the oracle
    # is unaffected.
    e = df.withColumn("bucket", lsh_bucket(v, planes))
    norm = F.sqrt(norm_sq_expr(as_double(F.col(vec_col)), dim))
    a = e.select(
        F.col(id_col).alias("id_a"),
        F.col("bucket"),
        as_double(F.col(vec_col)).alias("va"),
        norm.alias("na"),
    )
    b = e.select(
        F.col(id_col).alias("id_b"),
        F.col("bucket"),
        as_double(F.col(vec_col)).alias("vb"),
        norm.alias("nb"),
    )
    losers = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        # the pair dot stays the HOF fold ON PURPOSE: the predicate is
        # evaluated in the join's interpreted context (not codegen),
        # where one composite fold with a tight internal loop beats an
        # unrolled chain of 2*dim element_at calls — measured 26 s vs
        # 90 s at sf1. The unroll wins only in codegen projections
        # (cosine_lit / _sq_dist).
        .filter(
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            )
            >= threshold
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return e.join(losers, id_col, "left_anti")


def inertia(assigned: DataFrame) -> float:
    """Σ sq_dist of an assignment — the Lloyd's objective (test hook)."""
    return float(assigned.agg(F.sum("sq_dist")).first()[0])
