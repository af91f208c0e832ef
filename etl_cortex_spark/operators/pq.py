"""Product quantization (PQ) for embedding compression + ANN.

The IVF index (`similarity.write_ivf_index`) answers "which cells to
scan"; PQ answers "how to store a billion vectors cheaply and score
them without decompressing": split each dim-``d`` vector into ``m``
subvectors, quantize every subvector to one of ``k`` codewords learned
per subspace, store only the ``m`` uint8 codes (d·4 bytes → m bytes),
and score queries against a per-query lookup table (asymmetric
distance, ADC) — the Jégou et al. 2011 design every large-scale vector
store builds on, composed here from pure column expressions:

- encoding is a codegen projection against codeword literals — the
  exact shape of ``clustering._assign``, once per subspace;
- ADC scoring is ``m`` array lookups + a sum, no vector math at query
  time, so the scan stays whole-stage-codegen'd and a top-k is
  TakeOrderedAndProject;
- training is Lloyd's per subspace over a sub-vector projection —
  reuses ``clustering.kmeans_fit_predict``'s machinery shape (model
  state = m·k·(d/m) floats, driver-side like any fitted model).

Deterministic codebooks (the k lowest-id vectors' subvectors, no RNG)
make encode/ADC fully oracle-checkable in DuckDB — same pattern as
``d24_centroid_assign``; trained codebooks are engine state and their
quality is pinned by reconstruction-error tests instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_cortex_spark.operators.similarity import as_double


def _sub(v: Column, j: int, d_sub: int) -> Column:
    """1-indexed slice of subspace j (j = 0..m-1)."""
    return F.slice(v, j * d_sub + 1, d_sub)


def _sq_dist_lit(sub: Column, codeword: list[float]) -> Column:
    # zip_with/aggregate fold against the literal codeword (round 10:
    # the interleaved A/B refuted round 9's element_at unroll even in
    # this small-subspace regime — encode evaluates m×k of these per
    # row, so the combined tree is huge either way, and the fold
    # measured d37_pq_encode 1.14 s → 0.25 s at sf0.1; see
    # BASELINE.md round-10). Same left-to-right order as the unroll
    # it replaces → distances bit-identical, round(6) oracles
    # unaffected.
    from etl_cortex_spark.operators.similarity import _lit_array

    carr = _lit_array([float(x) for x in codeword])
    return F.aggregate(
        F.zip_with(sub, carr, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda s, x: s + x,
    )


def deterministic_codebooks(
    df: DataFrame,
    m: int,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """codebooks[j][c] = subvector j of the c-th lowest-id NON-NULL
    vector — deterministic across engines/runs (same rule as
    ``clustering.initial_centroids``, including the NULL skip: a stray
    NULL embedding must not abort codebook construction), which is
    what makes the encode step oracle-checkable. Real deployments
    replace this with ``train_codebooks``."""
    rows = (
        df.where(F.col(vec_col).isNotNull())
        .select(id_col, as_double(F.col(vec_col)).alias("v"))
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if not rows:
        raise ValueError("deterministic_codebooks: empty input")
    dim = len(rows[0].v)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m
    return [
        [[float(x) for x in r.v[j * d_sub : (j + 1) * d_sub]] for r in rows]
        for j in range(m)
    ]


def train_codebooks(
    df: DataFrame,
    m: int,
    k: int,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Lloyd's per subspace, seeded with the deterministic codebooks.
    One (code, position) partial-agg shuffle per subspace per
    iteration over sub-vectors only — each subspace's training is an
    independent small k-means."""
    books = deterministic_codebooks(df, m, k, id_col, vec_col)
    d_sub = len(books[0][0])
    base = df.select(id_col, as_double(F.col(vec_col)).alias("__v"))
    for j in range(m):
        sub = base.select(id_col, _sub(F.col("__v"), j, d_sub).alias("__s"))
        cb = books[j]
        for _ in range(iters):
            code = _argmin_code(F.col("__s"), cb).alias("__c")
            new_rows = (
                sub.select("__s", code)
                .select("__c", F.posexplode("__s").alias("pos", "x"))
                .groupBy("__c", "pos")
                .agg(F.avg("x").alias("mean"))
                .groupBy("__c")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "mean"))
                    ).alias("pm")
                )
                .select("__c", F.transform("pm", lambda s: s["mean"]).alias("cw"))
                .collect()
            )
            updated = {r["__c"]: [float(x) for x in r.cw] for r in new_rows}
            cb = [updated.get(c, cb[c]) for c in range(k)]
        books[j] = cb
    return books


def _argmin_code(sub: Column, codebook: list[list[float]]) -> Column:
    pairs = F.array(
        *[
            F.struct(
                F.round(_sq_dist_lit(sub, cw), 6).alias("dist"),
                F.lit(c).alias("idx"),
            )
            for c, cw in enumerate(codebook)
        ]
    )
    return F.array_min(pairs)["idx"]


def pq_codes_expr(
    codebooks: list[list[list[float]]], vec_col: str = "embedding"
) -> Column:
    """The ``array<int>`` PQ-code expression for one vector column —
    one argmin projection per subspace against codeword literals.
    Shared by ``pq_encode`` and ``write_ivfpq_index`` so the stored
    and ad-hoc codes can never disagree."""
    d_sub = len(codebooks[0][0])
    v = as_double(F.col(vec_col))
    return F.array(
        *[
            _argmin_code(_sub(v, j, d_sub), codebooks[j])
            for j in range(len(codebooks))
        ]
    )


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — one argmin projection per subspace,
    ties to the lowest code (6-decimal rounding so the tie rule, not
    libm ULP, decides). Pure codegen; no shuffle, no Python."""
    return df.select(
        F.col(id_col), pq_codes_expr(codebooks, vec_col).alias("codes")
    )


def pq_adc_topk(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    query: list[float],
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k: precompute the m×k lookup table of
    squared distances from the query's subvectors to every codeword
    (driver-side floats → literals), then score each row as m array
    lookups + a sum. The scan never touches a float vector — this is
    what makes a billion-row PQ scan CPU-cheap — and top-k compiles to
    TakeOrderedAndProject."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    if len(query) != m * d_sub:
        raise ValueError("query dim mismatch")
    lut = [
        [
            sum(
                (query[j * d_sub + i] - cw[i]) ** 2 for i in range(d_sub)
            )
            for cw in codebooks[j]
        ]
        for j in range(m)
    ]
    lut_cols = [F.array(*[F.lit(float(x)) for x in row]) for row in lut]
    dist = None
    for j in range(m):
        term = F.element_at(lut_cols[j], F.col("codes")[j] + 1)
        dist = term if dist is None else dist + term
    return (
        codes_df.select(id_col, F.round(dist, 6).alias("adc_dist"))
        .orderBy("adc_dist", id_col)
        .limit(topk)
    )


# --- IVF × PQ: the composed billion-vector serving path -----------------------


def write_ivfpq_index(
    df: DataFrame,
    path: str,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    seed: int = 7,
) -> None:
    """Materialize the composed index: sign-LSH cell as the PARTITION
    key (the IVF half, `similarity.write_ivf_index`) and PQ codes as
    the PAYLOAD (this module) — the layout of every large-scale vector
    store (IVFADC, Jégou et al. 2011): a query prunes to its cell's
    directory, then scores m-byte codes instead of d-float vectors.
    The stored rows are (id, codes) only — the float vectors never
    enter the index, which is the entire storage win (d·4 bytes → m).

    Cell assignment and codes come from the same shared expressions as
    the standalone paths (`lsh_bucket`, `pq_codes_expr`), so index and
    query can never disagree on either half. Repartitioned by the cell
    before the write (the `append_ivf_index` discipline, round 19) so
    each cell directory holds ONE file instead of one per scan task —
    O(tasks × 2^n_planes) few-KB files otherwise (guide §6)."""
    from etl_cortex_spark.operators.similarity import hyperplanes, lsh_bucket

    dim = len(codebooks) * len(codebooks[0][0])
    planes = hyperplanes(dim, n_planes, seed)
    out = df.select(
        F.col(id_col),
        pq_codes_expr(codebooks, vec_col).alias("codes"),
        lsh_bucket(as_double(F.col(vec_col)), planes).alias("__bucket"),
    )
    out.repartition("__bucket").write.mode("overwrite").partitionBy(
        "__bucket"
    ).parquet(path)


def ivfpq_adc_topk(
    spark,
    path: str,
    codebooks: list[list[list[float]]],
    query: list[float],
    topk: int = 10,
    id_col: str = "vec_id",
    n_planes: int = 6,
    seed: int = 7,
) -> DataFrame:
    """ANN top-k against a ``write_ivfpq_index`` table: prune to the
    query's cell (partition pruning — only that directory is listed
    and scanned, asserted in tests/test_plans.py), then ADC-score the
    surviving codes via the per-query lookup table. The scan touches
    m int codes per row and never a float vector; top-k is
    TakeOrderedAndProject. Recall < 1 by design (single-probe IVF);
    the recall pytest pins it against the exact `cosine_topk` scan."""
    from etl_cortex_spark.operators.similarity import hyperplanes, query_bucket

    planes = hyperplanes(len(query), n_planes, seed)
    qbucket = query_bucket(query, planes)
    codes_df = spark.read.parquet(path).filter(F.col("__bucket") == qbucket)
    return pq_adc_topk(codes_df, codebooks, query, topk=topk, id_col=id_col)
