"""Embedding similarity search (tier D / BASELINE.json: "similarity
search over an embedding column").

Two paths, per the scale contract:

- **cosine_topk** — exact brute force: one scan, dot/norm as builtin
  HOFs (zip_with + aggregate fold), TakeOrdered top-k. At 100 TB this
  is the per-query baseline and the verifier for the ANN path; the
  scan parallelizes perfectly and the top-k needs no full sort
  (Catalyst plans TakeOrderedAndProject).
- **lsh_topk** — random-hyperplane LSH: H fixed signed projections →
  2^H buckets; only the query's bucket is scanned for candidates. The
  hyperplanes are deterministic literals (seeded off-line), so results
  are reproducible across engines and runs — and the bucketing column
  can be precomputed and used as a partition key at scale (IVF-style:
  partition pruning turns a 100 TB scan into one bucket's worth).

Norm conventions: vectors are cast float→double before any
arithmetic; fold order is left-to-right in both our HOFs and the
oracle SQL so cross-engine sums agree bit-for-bit at round(6).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def l2norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


# --- literal-vector fast path --------------------------------------------------
#
# Higher-order-function lambdas (zip_with/aggregate) are evaluated
# INTERPRETED per row — they sit outside whole-stage codegen, so every
# scored vector pays a per-element closure call. When one operand is a
# LITERAL (the query vector, an LSH hyperplane, a centroid), the fold
# unrolls into `dim` plain multiply-adds that codegen compiles like any
# arithmetic (round 9; measured d03 sf1 0.24 s -> 0.15 s). The unroll
# keeps the HOF's exact left-to-right order — ((0+t1)+t2)+... — so
# every value is BIT-IDENTICAL to the fold it replaces and all round(6)
# oracles are unaffected. Scope caveat, also measured: the unroll wins
# ONLY in codegen projection contexts. In interpreted contexts (a join
# predicate evaluating pairwise dots) a chain of 2*dim element_at
# calls is ~3.5x SLOWER than the HOF's one tight internal loop — so
# pairwise column-column dots (semantic_dedup) deliberately keep the
# fold form and hoist the norms instead.


def dot_lit(v: Column, q: list[float]) -> Column:
    """dot(v, literal q), unrolled (codegen path; order == HOF fold).

    Guarded on ``size(v) == len(q)`` (round-9 ADVICE): the bare unroll
    silently truncated LONGER vectors to len(q) and threw
    INVALID_ARRAY_INDEX (ANSI ``element_at`` OOB) on SHORTER ones —
    both diverging from the zip_with fold's NULL-degrade. CaseWhen
    evaluates its value branch lazily, so mismatched rows yield NULL
    (the fold's exact behavior: zip_with pads with NULL → NULL sum)
    without ever touching an OOB index, and the size check itself is
    O(1) on the codegen path. Matched rows get the identical unrolled
    expression — all round(6) oracle values are unaffected."""
    out: Column = F.lit(0.0)
    for i, x in enumerate(q):
        out = out + F.element_at(v, i + 1) * F.lit(float(x))
    return F.when(F.size(v) == F.lit(len(q)), out)


def norm_sq_expr(v: Column, dim: int) -> Column:
    """Σ v[i]^2 over a known dim, unrolled (order == l2norm's fold);
    NULL on dim mismatch (same guard + rationale as ``dot_lit``)."""
    out: Column = F.lit(0.0)
    for i in range(dim):
        e = F.element_at(v, i + 1)
        out = out + e * e
    return F.when(F.size(v) == F.lit(dim), out)


def cosine_lit(v: Column, q: list[float]) -> Column:
    """cosine(v, literal q) on the codegen path. The query norm is a
    driver-side constant: Python floats ARE IEEE doubles and the fold
    order matches l2norm's, so the constant is bit-identical to the
    HOF value it replaces.

    ``SPARK_GRAFT_NO_UNROLL`` serves the HOF-fold formulation instead
    (identical values: both sides are left-to-right IEEE folds) — the
    measurement escape hatch for the unroll-vs-fold interleaved A/B,
    same pattern as ``SPARK_GRAFT_NO_BUCKET`` in layout.py."""
    import math
    import os

    if os.environ.get("SPARK_GRAFT_NO_UNROLL"):
        return cosine(v, F.array(*[F.lit(float(x)) for x in q]))
    qn = 0.0
    for x in q:
        qn += float(x) * float(x)
    return dot_lit(v, q) / (F.sqrt(norm_sq_expr(v, len(q))) * F.lit(math.sqrt(qn)))


def hyperplanes(dim: int, n: int = 8, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (literals, no runtime
    RNG) for sign-LSH. Gaussian via random.Random for portability."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n)]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit j set iff dot(vec, plane_j) > 0."""
    out = F.lit(0)
    for j, plane in enumerate(planes):
        out = out + F.when(dot_lit(vec, plane) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out.cast("int")


def query_bucket(query_vec: list[float], planes: list[list[float]]) -> int:
    """Driver-side twin of ``lsh_bucket`` for a literal query vector —
    ONE definition of the sign convention (strict > 0), shared by the
    full-scan and IVF paths so index and query can never disagree."""
    return sum(
        (1 << j)
        for j, plane in enumerate(planes)
        if sum(a * b for a, b in zip(query_vec, plane)) > 0
    )


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.
    Deterministic total order: (cosine desc, id asc)."""
    v = as_double(F.col(vec_col))
    return (
        df.select(F.col(id_col), F.round(cosine_lit(v, query_vec), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ann_brp_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_length: float = 2.0,
    n_tables: int = 3,
) -> DataFrame:
    """The MLlib path for ANN (SURVEY D3: ``BucketedRandomProjectionLSH``):
    Euclidean-LSH bucketing + ``approxNearestNeighbors`` for the top-k,
    re-scored with exact cosine for a comparable output contract
    (vec_id, cosine). The hashing is engine-specific; since round 9 the
    d03_ann_brp_topk registry entry wraps this in an EPSILON-RECALL
    oracle (recall@5 vs the exact euclidean top-5 ≥ 4/5), and the
    pytest suite pins rank-consistency against the brute-force baseline.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.linalg import Vectors

    feat = df.select(
        F.col(id_col), array_to_vector(as_double(F.col(vec_col))).alias("__vec")
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="__vec",
        outputCol="__hashes",
        bucketLength=bucket_length,
        numHashTables=n_tables,
        seed=7,
    )
    model = brp.fit(feat)
    hits = model.approxNearestNeighbors(
        feat, Vectors.dense([float(v) for v in query_vec]), k, distCol="__dist"
    )
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    vec_arr = F.transform("__vec_arr", lambda x: x.cast("double"))
    from pyspark.ml.functions import vector_to_array

    return (
        hits.withColumn("__vec_arr", vector_to_array("__vec"))
        .select(
            F.col(id_col),
            F.round(cosine(vec_arr, q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
    )


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    seed: int = 7,
) -> DataFrame:
    """ANN top-k: candidates = vectors in the query's sign-LSH bucket,
    ranked by exact cosine. Recall < 1 by design; the planes being
    literals makes the result deterministic and oracle-checkable."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qbucket = query_bucket(query_vec, planes)
    v = as_double(F.col(vec_col))
    return (
        df.withColumn("__bucket", lsh_bucket(v, planes))
        .filter(F.col("__bucket") == qbucket)
        .select(F.col(id_col), F.round(cosine_lit(v, query_vec), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def write_ivf_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    seed: int = 7,
    dim: int | None = None,
) -> None:
    """Materialize the IVF-style ANN index: precompute the sign-LSH
    bucket and write parquet PARTITIONED BY the bucket — one directory
    per cell. At 100 TB this is what turns `lsh_topk`'s bucket filter
    into partition pruning: the query reads 1/2^n_planes of the corpus
    and the other cells are never listed, let alone scanned
    (demonstrated in tests/test_plans.py::test_ivf_partition_pruning).

    ``dim`` is peeked from the first row when not given (one tiny
    eager action, writer-side only).
    """
    if dim is None:
        # first NON-NULL vector (round-3 advice, same as semantic_dedup)
        first = (
            df.where(F.col(vec_col).isNotNull())
            .select(F.size(F.col(vec_col)))
            .first()
        )
        if first is None or first[0] is None or first[0] < 0:
            raise ValueError(
                f"write_ivf_index: cannot infer vector dim — input is "
                f"empty or {vec_col!r} is NULL in every row; pass dim "
                f"explicitly"
            )
        dim = first[0]
    planes = hyperplanes(dim, n_planes, seed)
    out = df.withColumn("__bucket", lsh_bucket(as_double(F.col(vec_col)), planes))
    out.write.mode("overwrite").partitionBy("__bucket").parquet(path)


def lsh_topk_ivf(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    seed: int = 7,
) -> DataFrame:
    """ANN top-k against a ``write_ivf_index`` table: the bucket
    equality predicate prunes to ONE partition directory, then exact
    cosine ranks the cell. Same contract and (given the same planes)
    same result as ``lsh_topk`` — minus the full scan.
    """
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qbucket = query_bucket(query_vec, planes)
    v = as_double(F.col(vec_col))
    return (
        spark.read.parquet(path)
        .filter(F.col("__bucket") == qbucket)
        .select(F.col(id_col), F.round(cosine_lit(v, query_vec), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


# --- int8 quantization (the ANN storage path at corpus scale) -----------------


def quantize_embedding(vec: Column, bits: int = 8) -> Column:
    """Symmetric per-vector int quantization: ``struct(scale double,
    q array<tinyint>)`` with ``scale = max(|v|)/qmax`` so dequantized
    values are ``q * scale``. 4× smaller than float32 on disk and in
    shuffle — at corpus scale the index fits where floats wouldn't.
    All-zero vectors quantize to all-zero with scale 0 (no division)."""
    qmax = float(2 ** (bits - 1) - 1)
    v = as_double(vec)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(qmax)
    q = F.transform(
        v,
        lambda x: F.when(scale == 0.0, F.lit(0))
        .otherwise(F.round(x / scale))
        .cast("tinyint"),
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_embedding(q: Column, scale: Column) -> Column:
    """Inverse of ``quantize_embedding``: ``array<double>`` ≈ original."""
    return F.transform(q, lambda x: x.cast("double") * scale)


def quantized_centroid_outliers(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1000,
    topk: int = 20,
) -> DataFrame:
    """Embedding-space outlier audit: the top-k vectors farthest from
    the corpus centroid — the standard pre-index hygiene pass (corrupt
    encodes, all-zero rows, wrong-modality strays) before ANN indexing
    or semantic dedup.

    The float-sum trap, and why the centroid is computed in INTEGER
    space: a double centroid `avg(x_i)` is summation-order-dependent
    (Spark's partial aggregates vs any single-threaded engine differ in
    the last ULP), and an outlier CUT on a noisy threshold is not
    reproducible. Instead each component is quantized once —
    ``q = floor(x*scale + 0.5)`` is a single deterministic rounding of
    the exact float32→double value — and the per-dimension SUMS of q
    are exact BIGINTs (order-free). The squared distance then uses the
    exact integer residual ``n·q_i − S_i`` (distance to the mean
    without ever dividing): cast to double, squared, summed in index
    order — every operation identical on any engine, so the ranking is
    bit-reproducible. Overflow headroom: |n·q| ≤ n·scale·max|x|; at
    1e9 vectors and |x|≤10 that is 1e13 — exact in a double and far
    inside BIGINT.

    Plan shape: one agg pass (dim per-component sums + count, map-side
    combined) → 1-row broadcast → column-side distance → TakeOrdered
    top-k. The vectors are never shuffled.

    Returns (id_col, dist) with dist = sqrt(Σ residual²)/(scale·n) —
    the actual Euclidean distance to the centroid, rounded at 6dp.
    """
    q = emb.select(
        F.col(id_col),
        F.transform(
            as_double(vec_col), lambda x: F.floor(x * scale + F.lit(0.5)).cast("long")
        ).alias("__q"),
    )
    sums = q.agg(
        F.array(*[F.sum(F.col("__q")[i]) for i in range(dim)]).alias("__s"),
        F.count(F.lit(1)).alias("__n"),
    )
    resid2 = F.aggregate(
        F.zip_with(
            "__q",
            "__s",
            lambda qi, si: ((F.col("__n") * qi - si).cast("double"))
            * ((F.col("__n") * qi - si).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        q.crossJoin(F.broadcast(sums))
        .select(
            id_col,
            F.round(
                F.sqrt(resid2) / (F.lit(float(scale)) * F.col("__n")), 6
            ).alias("dist"),
            resid2.alias("__d2"),
        )
        .orderBy(F.desc("__d2"), id_col)
        .limit(topk)
        .select(id_col, "dist")
    )
