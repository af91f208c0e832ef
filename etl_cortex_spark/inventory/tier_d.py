"""Tier D inventory — LLM-data-pipeline operators (SURVEY §2 D1-D9,
BASELINE.json north star): dedup (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding), similarity search (brute force + LSH),
text analysis, multimodal plumbing, streaming.

Oracle notes: tokenization, shingling, jaccard, quality arithmetic and
fingerprints are reproduced in DuckDB SQL operator-for-operator.
Engine-specific hashing (xxhash64 in MinHash/SimHash) and streaming
are rows-only by contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cortex_spark.operators import dedup as DD
from etl_cortex_spark.operators import multimodal as MM
from etl_cortex_spark.operators import similarity as SIM
from etl_cortex_spark.operators import textops as TX
from etl_cortex_spark.operators.localframe import local_df
from etl_cortex_spark.queries import T, query

# shared oracle SQL fragments (DuckDB): whitespace words + k-shingles,
# mirroring textops.words / textops.shingles exactly.
_WORDS = r"list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')"


def _shingles_sql(k: int) -> str:
    return (
        f"list_distinct(list_transform(range(1, greatest(len({_WORDS}) - {k - 2}, 2)), "
        f"i -> array_to_string(array_slice({_WORDS}, i, i + {k - 1}), ' ')))"
    )


# --- D1: exact dedup ----------------------------------------------------------


@query(
    "d01_exact_dedup",
    oracle="""
    SELECT doc_id, lang, n_copies FROM (
      SELECT doc_id, lang,
             count(*) OVER (PARTITION BY md5(text)) AS n_copies,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def d01(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    return DD.exact_dedup(docs, keep=["lang"]).select("doc_id", "lang", "n_copies")


# --- D2: near-dup dedup -------------------------------------------------------


def _mutated_corpus(spark: SparkSession, sf_dir: str, mutate: str = "prefix") -> DataFrame:
    """The shared self-seeded near-dup corpus: the %10 document slice
    plus one mutated copy of each (id + 10_000_000). ONE definition —
    five queries and their DuckDB oracle strings (offset, 'mutated '
    prefix) depend on these exact constants staying in sync."""
    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    mutated_text = (
        F.concat(F.lit("mutated "), F.col("text"))
        if mutate == "prefix"
        else F.concat(F.col("text"), F.lit(" suffix"))
    )
    mutated = docs.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), mutated_text.alias("text")
    )
    return docs.select("doc_id", "text").unionByName(mutated)


@query("d02_minhash_lsh_pairs")  # rows-only: xxhash64 minhashing is engine-specific
def d02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs. The testdata word soup has no real
    near-dups, so the query self-seeds them: a mutated copy (one
    prepended word) of every 10th document must pair with its source.
    Verified jaccard filtering makes output independent of LSH noise
    up to recall; the pytest suite checks recall against the exact
    quadratic baseline."""
    base = _mutated_corpus(spark, sf_dir)
    return DD.minhash_lsh_pairs(base, threshold=0.5).orderBy("id_a", "id_b")


@query(
    "d02_lsh_recall_audit",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 10000000 AS doc_id, 'mutated ' || text AS text
      FROM documents WHERE doc_id % 10 = 0
    ),
    d AS (SELECT doc_id, {_shingles_sql(3)} AS sh FROM base),
    ex AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM d a, d b
      WHERE a.doc_id < b.doc_id
        AND round(len(list_intersect(a.sh, b.sh)) /
              greatest(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 1), 6)
            >= 0.8
    )
    SELECT CAST(count(*) AS BIGINT) AS n_exact_high, true AS recall_ok FROM ex
    """,
)
def d02ra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPSILON-RECALL audit for the MinHash-LSH candidate family (the
    d03-BRP pattern applied to d02, round 9): `minhash_lsh_pairs`'s
    banding (8 bands × 4 rows over xxhash64 minhashes) is
    engine-specific, so the entry pins the PROPERTY instead of the
    pairs — recall over the exact-Jaccard ≥ 0.8 pair set (computed by
    the repo's own quadratic baseline on the self-seeded mutated
    corpus) must be ≥ 0.95. ``n_exact_high`` is data-derived on both
    sides, so the audit provably measured the same ground-truth set
    the oracle counted; a hashing/banding regression flips
    ``recall_ok`` to false and the hash compare fails. Measured
    recall: 1.0 at sf0.001/0.01, 0.981 at sf0.1 (10/524 missed — the
    theoretical banding curve at s≈0.8, which is exactly why the
    bound is 0.95 and not 1.0; precision is 1.0 by construction since
    candidates are exact-Jaccard verified). Driver-side state is two
    counts."""
    base = _mutated_corpus(spark, sf_dir)
    exact = (
        DD.ngram_jaccard_pairs(base, min_jaccard=0.8)
        .select("id_a", "id_b")
    )
    lsh = DD.minhash_lsh_pairs(base, threshold=0.5).select("id_a", "id_b")
    n_exact = exact.count()
    missed = exact.join(lsh, ["id_a", "id_b"], "left_anti").count()
    ok = n_exact > 0 and (n_exact - missed) / n_exact >= 0.95
    return local_df(
        spark, [(n_exact, ok)], "n_exact_high bigint, recall_ok boolean"
    )


@query(
    "d02_ngram_jaccard_topk",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_shingles_sql(3)} AS sh
      FROM documents WHERE doc_id % 10 = 0
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.sh, b.sh)) /
                 greatest(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 1), 6)
             AS jaccard
    FROM d a, d b WHERE a.doc_id < b.doc_id
    ORDER BY jaccard DESC, id_a, id_b LIMIT 20
    """,
)
def d02b(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return (
        DD.ngram_jaccard_pairs(docs)
        .orderBy(F.desc("jaccard"), "id_a", "id_b")
        .limit(20)
    )


@query(
    "d02_group_rep_pairs",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 20000000, 'mutated ' || text FROM documents WHERE doc_id % 10 = 0
    ),
    reps AS (
      SELECT min(doc_id) AS doc_id, text, CAST(count(*) AS BIGINT) AS n_copies
      FROM base GROUP BY text
    ),
    d AS (SELECT doc_id, n_copies, {_shingles_sql(3)} AS sh FROM reps)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.sh, b.sh)) /
                 greatest(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 1), 6)
             AS jaccard,
           a.n_copies AS n_copies_a, b.n_copies AS n_copies_b
    FROM d a, d b
    WHERE a.doc_id < b.doc_id
      AND round(len(list_intersect(a.sh, b.sh)) /
                greatest(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 1), 6)
          >= 0.5
    ORDER BY id_a, id_b
    """,
)
def d02gr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup.group_rep_near_pairs — the production composition for
    verbatim-heavy corpora (round 10): exact-dup collapse to min-id
    representatives (carrying n_copies), then the EXACT AllPairs
    prefix-filter pair set among representatives. Self-seeded corpus:
    every 10th doc + a VERBATIM copy (+1e7 ids, collapsed by the
    exact pass) + a mutated copy (+2e7 ids, caught by the near-dup
    pass). Guaranteed recall makes the whole pipeline a full oracle —
    the DuckDB twin replays the text-group collapse and brute-forces
    the rep pairs. Motivation measured at sf10 (BASELINE.md): the raw
    pair-list contract is Ω(group²) per duplicate group; collapsing
    first keeps the quadratic-risk stage on the distinct-text corpus."""
    docs = (
        T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
    )
    verbatim = docs.select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    mutated = docs.select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.concat(F.lit("mutated "), F.col("text")).alias("text"),
    )
    base = docs.unionByName(verbatim).unionByName(mutated)
    return DD.group_rep_near_pairs(base, threshold=0.5).repartition(
        1
    ).sortWithinPartitions("id_a", "id_b")


@query(
    "d02_group_rep_survivors",
    oracle=f"""
    WITH RECURSIVE base AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 20000000, 'mutated ' || text FROM documents WHERE doc_id % 10 = 0
    ),
    reps AS (
      SELECT min(doc_id) AS doc_id, text, CAST(count(*) AS BIGINT) AS n_copies
      FROM base GROUP BY text
    ),
    d AS (SELECT doc_id, n_copies, {_shingles_sql(3)} AS sh FROM reps),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM d a, d b
      WHERE a.doc_id < b.doc_id
        AND round(len(list_intersect(a.sh, b.sh)) /
                  greatest(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 1), 6)
            >= 0.5
    ),
    e AS (SELECT id_a AS src, id_b AS dst FROM p
          UNION ALL SELECT id_b, id_a FROM p),
    cc AS (
      SELECT doc_id AS node, doc_id AS label FROM d
      UNION
      SELECT e.dst, cc.label FROM cc JOIN e ON cc.node = e.src
    ),
    lab AS (SELECT node, min(label) AS label FROM cc GROUP BY node)
    SELECT lab.label AS doc_id, CAST(sum(d.n_copies) AS BIGINT) AS n_docs
    FROM lab JOIN d ON lab.node = d.doc_id
    GROUP BY lab.label ORDER BY doc_id
    """,
)
def d02gs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup.group_rep_survivors — the composed END-TO-END production
    near-dedup for verbatim-heavy corpora (round-10 verdict #6): exact
    collapse → exact AllPairs rep pairs → connected components → one
    min-id survivor per cluster with ``n_docs`` = the original-corpus
    documents it represents. Every stage is deterministic (guaranteed-
    recall prefix filter, min-label CC), so the FULL pipeline is
    hash-verified against a DuckDB twin (text-group collapse +
    brute-force pairs + recursive-CTE clustering). Same self-seeded
    corpus as d02_group_rep_pairs: each surviving cluster here is
    {source, verbatim copy, mutated copy} → n_docs = 3 per survivor.
    This is the registry's certification that the 80× sf10 win
    (BASELINE.md round 10) is the DEFAULT posture, not a side path."""
    docs = (
        T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
    )
    verbatim = docs.select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    mutated = docs.select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.concat(F.lit("mutated "), F.col("text")).alias("text"),
    )
    base = docs.unionByName(verbatim).unionByName(mutated)
    return DD.group_rep_survivors(base, threshold=0.5).orderBy("doc_id")


@query("d02_minhash_lsh_ml_pairs")  # rows-only: MLlib hashing is engine-specific
def d02ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MLlib MinHashLSH variant of d02 — same self-seeded mutated
    corpus, same (id_a, id_b, jaccard) contract."""
    base = _mutated_corpus(spark, sf_dir)
    return DD.minhash_lsh_pairs_ml(base, threshold=0.5).orderBy("id_a", "id_b")


@query("d02_simhash_candidates")  # rows-only: xxhash64-based signature
def d02c(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _mutated_corpus(spark, sf_dir, mutate="suffix")
    return DD.simhash_candidates(base, max_hamming=3).orderBy("id_a", "id_b")


@query(
    "d02_simhash_recall_audit",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 10000000 AS doc_id, text || ' suffix' AS text
      FROM documents WHERE doc_id % 10 = 0
    ),
    d AS (SELECT doc_id, {_shingles_sql(3)} AS sh FROM base),
    ex AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM d a, d b
      WHERE a.doc_id < b.doc_id
        AND round(len(list_intersect(a.sh, b.sh)) /
              greatest(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 1), 6)
            >= 0.8
    )
    SELECT CAST(count(*) AS BIGINT) AS n_exact_high, true AS recall_ok FROM ex
    """,
)
def d02sr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPSILON-RECALL audit for the SimHash candidate path — the last
    unaudited near-dup family member (round-10 verdict #3; minhash got
    `d02_lsh_recall_audit`, SemDeDup got `d25r`). The 16-bit xxhash64
    signature is engine-specific, so the entry pins the PROPERTY:
    candidate-set recall over the exact-Jaccard ≥ 0.8 pair set (the
    repo's own quadratic baseline on the suffix-mutated corpus —
    d02_simhash_candidates' corpus) must be ≥ 0.95. The BANDING is
    lossless by pigeonhole (hamming ≤ 3 under 4 bands, pinned in
    tests/test_tier_d.py), so what this audits is the SEMANTIC step —
    that high-Jaccard pairs land within hamming 3 of each other in
    16-bit signature space. Measured: 0.983 at sf0.001 (1/58 missed),
    1.0 at sf0.01, 0.990 at sf0.1 (5/523) — misses are the expected
    tail of a 16-bit sketch at j≈0.8, which is why the bound is 0.95.
    ``n_exact_high`` is data-derived on both sides, so a regression in
    hashing, banding, or the Jaccard baseline flips the hash compare.
    Driver-side state is two counts."""
    base = _mutated_corpus(spark, sf_dir, mutate="suffix")
    exact = (
        DD.ngram_jaccard_pairs(base, min_jaccard=0.8)
        .select("id_a", "id_b")
    )
    cand = DD.simhash_candidates(base, max_hamming=3).select("id_a", "id_b")
    n_exact = exact.count()
    missed = exact.join(cand, ["id_a", "id_b"], "left_anti").count()
    ok = n_exact > 0 and (n_exact - missed) / n_exact >= 0.95
    return local_df(
        spark, [(n_exact, ok)], "n_exact_high bigint, recall_ok boolean"
    )


@query(
    "d02_near_dedup_survivors",
    oracle=f"""
    WITH RECURSIVE base AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 10000000, 'mutated ' || text
      FROM documents WHERE doc_id % 10 = 0
    ),
    d AS (SELECT doc_id, {_shingles_sql(3)} AS sh FROM base),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM d a, d b
      WHERE a.doc_id < b.doc_id
        AND round(len(list_intersect(a.sh, b.sh)) /
                  greatest(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 1), 6)
            >= 0.5
    ),
    e AS (SELECT id_a AS src, id_b AS dst FROM p
          UNION ALL SELECT id_b, id_a FROM p),
    cc AS (
      SELECT doc_id AS node, doc_id AS label FROM d
      UNION
      SELECT e.dst, cc.label FROM cc JOIN e ON cc.node = e.src
    ),
    lab AS (SELECT node, min(label) AS label FROM cc GROUP BY node)
    SELECT node AS doc_id FROM lab WHERE node = label ORDER BY doc_id
    """,
)
def d02e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 completed end-to-end: pairs → connected components → one
    min-id survivor per cluster (VERDICT r1 next-round #3). Pairing
    here is the DETERMINISTIC exact-Jaccard baseline so the whole
    pipeline is oracle-checkable (the DuckDB oracle mirrors the
    clustering with a recursive CTE); the production LSH pairing is
    exercised by d02_near_dedup_minhash and pytest."""
    base = _mutated_corpus(spark, sf_dir)
    pairs = DD.ngram_jaccard_pairs(base, max_rows=None, min_jaccard=0.5)
    return DD.near_dedup(base, pairs=pairs).select("doc_id").orderBy("doc_id")


@query("d02_near_dedup_minhash")  # rows-only: LSH pairing is engine-specific
def d02f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production near-dedup path: MinHash-LSH pairs feed the same
    clustering. Rows-only (LSH recall is engine-specific); recall vs
    the exact path is pinned in tests/test_tier_d.py."""
    base = _mutated_corpus(spark, sf_dir)
    return DD.near_dedup(base, threshold=0.5).select("doc_id").orderBy("doc_id")


@query(
    "d02_embedding_near_dup",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE vec_id % 5 = 0
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v) /
                 (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
             AS cosine
    FROM e a, e b
    WHERE a.vec_id < b.vec_id
      AND round(list_dot_product(a.v, b.v) /
                (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.3
    """,
)
def d02d(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    return DD.embedding_near_dup_pairs(emb, min_cosine=0.3)


# --- D3: similarity search ----------------------------------------------------


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        T(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0).select("embedding").first()
    )
    return [float(x) for x in row[0]]


@query(
    "d03_cosine_topk",
    oracle="""
    WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
               FROM embeddings WHERE vec_id = 0),
         e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings WHERE vec_id <> 0)
    SELECT vec_id,
           round(list_dot_product(v, qv) /
                 (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cosine
    FROM e, q
    ORDER BY cosine DESC, vec_id LIMIT 10
    """,
)
def d03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-k — the verifier baseline for ANN."""
    qv = _query_vec(spark, sf_dir)
    emb = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    return SIM.cosine_topk(emb, qv, k=10)


def _bucket_sql(vec_expr: str) -> str:
    """Sign-LSH bucket of a SQL vector expression, with the SAME
    literal hyperplanes the Spark side uses (similarity.hyperplanes,
    dim=64, n=6, seed=7) — data-independent literals, so one oracle
    string works at every scale factor."""
    planes = SIM.hyperplanes(64, n=6, seed=7)
    return " + ".join(
        f"(CASE WHEN list_dot_product({vec_expr}, [{', '.join(repr(x) for x in p)}]) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j, p in enumerate(planes)
    )


@query(
    "d03_ann_lsh_topk",
    oracle=f"""
    WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
               FROM embeddings WHERE vec_id = 0),
         e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings WHERE vec_id <> 0)
    SELECT vec_id,
           round(list_dot_product(v, qv) /
                 (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cosine
    FROM e, q
    WHERE ({_bucket_sql("v")}) = ({_bucket_sql("qv")})
    ORDER BY cosine DESC, vec_id LIMIT 5
    """,
)
def d03b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via sign-LSH bucket pruning; deterministic literal
    hyperplanes (IVF-style: at scale the bucket is a partition key and
    this becomes partition pruning)."""
    qv = _query_vec(spark, sf_dir)
    emb = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    return SIM.lsh_topk(emb, qv, k=5, n_planes=6, seed=7)


@query(
    "d03_ann_batch_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
               FROM embeddings WHERE vec_id < 5),
         e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings WHERE vec_id >= 5),
         j AS (
           SELECT q.query_id, e.vec_id,
                  round(list_dot_product(v, qv) /
                        (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6)
                    AS cosine
           FROM q JOIN e ON ({_bucket_sql("v")}) = ({_bucket_sql("qv")})
         )
    SELECT query_id, vec_id, cosine FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS rn
      FROM j
    ) WHERE rn <= 5
    """,
)
def d03batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH ANN serving (round 11 — the shape an embedding service
    actually runs): exact-cosine top-5 PER QUERY for a whole batch of
    query vectors (vec_id < 5) against the corpus (vec_id ≥ 5), in ONE
    corpus scan — `similarity.lsh_topk_batch` broadcasts the bucketed
    query batch and hash-joins on the sign-LSH bucket id, so each
    corpus row is scored only against the queries sharing its cell;
    a query-partitioned row_number keeps k. The hyperplanes are the
    same deterministic literals as d03_ann_lsh_topk, so the DuckDB
    twin replays the identical bucketing + ranking — a full-strength
    oracle. Scale shape: zero corpus shuffle (broadcast join + window
    partitioned by the batch-sized query id); against a
    `write_ivf_index` layout the bucket equality becomes per-query
    partition pruning."""
    emb = T(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    return SIM.lsh_topk_batch(corpus, queries, k=5, n_planes=6, seed=7)


@query(
    "d03_ann_brp_topk",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(5 AS INT) AS k,
           true AS recall_ok
    FROM embeddings WHERE vec_id <> 0
    """,
)
def d03c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via MLlib BucketedRandomProjectionLSH, under an
    EPSILON-RECALL oracle (round-8 verdict #6 — closes the d03 family):
    MLlib's hashing is engine-specific, so instead of asserting WHICH
    ids come back, the entry asserts the property that makes an ANN
    index fit for service — recall@5 against the EXACT euclidean top-5
    (BRP's own metric, computed by a plain column-expression scan) of
    at least 4/5. ``recall_ok`` is emitted from the measured overlap,
    so a hashing regression (recall < 0.8) flips it to false and the
    driver's hash compare fails; ``n_candidates`` is data-derived on
    both sides so the audit provably saw the corpus. The seeded BRP
    model (seed=7, 3 tables) is deterministic, and the measured recall
    at sf0.001/0.01/0.1 is 5/5 — the 4/5 bound leaves one-tie margin.
    The raw top-k rows stay available via ``similarity.ann_brp_topk``
    and the oracle-paired ``d03_ann_lsh_topk`` twin. Driver-side state
    is k-bounded (two 5-row collects + a count)."""
    qv = _query_vec(spark, sf_dir)
    emb = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    ann_ids = {
        r["vec_id"] for r in SIM.ann_brp_topk(emb, qv, k=5).select("vec_id").collect()
    }
    q = SIM._lit_array([float(v) for v in qv])
    v = SIM.as_double(F.col("embedding"))
    d2 = F.aggregate(
        F.zip_with(v, q, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    exact = (
        emb.select(F.col("vec_id"), F.round(d2, 6).alias("__d2"))
        .orderBy("__d2", "vec_id")
        .limit(5)
        .collect()
    )
    hits = len(ann_ids & {r["vec_id"] for r in exact})
    n = emb.count()
    return local_df(
        spark, [(n, 5, hits >= 4)], "n_candidates bigint, k int, recall_ok boolean"
    )


def _ivfpq_oracle(m: int = 4, k: int = 8, d_sub: int = 16, topk: int = 10) -> str:
    """DuckDB replay of the composed IVF×PQ serving path: candidates =
    the query's sign-LSH cell (same literal hyperplanes as
    ``_bucket_sql``), per-candidate PQ code per subspace (same argmin
    as ``tier_d_ext._pq_oracle``), ADC distance = sum over subspaces of
    the squared distance from the query's subvector to the CHOSEN
    codeword — exactly the lookup the Spark side does via its literal
    LUT. One generator emits both halves' constants, so the engines
    can only diverge if the algorithm itself does."""
    parts = [
        "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
        "      FROM embeddings)",
        "cb AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cidx,"
        f"              v AS cv FROM e ORDER BY vec_id LIMIT {k})",
        "q AS (SELECT v AS qv FROM e WHERE vec_id = 0)",
        "cand AS (SELECT vec_id, v FROM e, q WHERE vec_id <> 0 "
        f"AND ({_bucket_sql('v')}) = ({_bucket_sql('qv')}))",
    ]
    for j in range(m):
        lo, hi = j * d_sub + 1, (j + 1) * d_sub
        parts.append(
            f"s{j} AS (SELECT cand.vec_id, cb.cidx, "
            f"round(list_sum(list_transform(cand.v[{lo}:{hi}], "
            f"(x, i) -> (x - cb.cv[{lo}:{hi}][i]) * (x - cb.cv[{lo}:{hi}][i]))), 6) AS d "
            f"FROM cand, cb)"
        )
        parts.append(
            f"c{j} AS (SELECT vec_id, cidx FROM ("
            f"SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cidx) AS rn "
            f"FROM s{j}) WHERE rn = 1)"
        )
        parts.append(
            f"t{j} AS (SELECT c{j}.vec_id, "
            f"list_sum(list_transform(q.qv[{lo}:{hi}], "
            f"(x, i) -> (x - cb.cv[{lo}:{hi}][i]) * (x - cb.cv[{lo}:{hi}][i]))) AS t "
            f"FROM c{j} JOIN cb USING (cidx), q)"
        )
    frm = " JOIN ".join(["t0"] + [f"t{j} USING (vec_id)" for j in range(1, m)])
    adc = " + ".join(f"t{j}.t" for j in range(m))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT vec_id, round({adc}, 6) AS adc_dist FROM {frm} "
        f"ORDER BY adc_dist, vec_id LIMIT {topk}"
    )


@query("d03_ann_ivfpq_topk", oracle=_ivfpq_oracle())
def d03d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed billion-vector serving path (pq.write_ivfpq_index +
    pq.ivfpq_adc_topk): build the IVF×PQ index — sign-LSH cell as the
    partition key, PQ codes (m=4 × k=8 deterministic codebooks) as the
    only payload — then answer the query by pruning to ONE cell
    directory and ADC-scoring its codes against the per-query LUT.
    Partition pruning + recall are pinned in tests/test_pq.py and
    tests/test_plans.py; this entry pins the VALUES end-to-end against
    the SQL replay. Index path carries the pid so concurrent harness
    runs never collide (round-4 advice on d08d)."""
    import hashlib
    import os
    import tempfile

    from etl_cortex_spark.operators.pq import (
        deterministic_codebooks,
        ivfpq_adc_topk,
        write_ivfpq_index,
    )

    emb = T(spark, sf_dir, "embeddings")
    books = deterministic_codebooks(emb, m=4, k=8)
    qv = _query_vec(spark, sf_dir)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_ivfpq_{tag}_{os.getpid()}"
    )
    write_ivfpq_index(emb.filter(F.col("vec_id") != 0), path, books)
    return ivfpq_adc_topk(spark, path, books, qv, topk=10)


@query(
    "d03_ivf_incremental",
    oracle=f"""
    WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
               FROM embeddings WHERE vec_id = 0),
         e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings WHERE vec_id <> 0)
    SELECT vec_id,
           round(list_dot_product(v, qv) /
                 (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cosine,
           n_indexed
    FROM e, q,
         (SELECT CAST(count(*) AS BIGINT) AS n_indexed FROM e) n
    WHERE ({_bucket_sql("v")}) = ({_bucket_sql("qv")})
    ORDER BY cosine DESC, vec_id LIMIT 5
    """,
)
def d03inc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance (round 13 — round-12 verdict
    #1, the last ANN production gap): the index is built over a BASE
    slice (vec_id % 7 != 3) with `similarity.write_ivf_index`, then a
    delta batch (the % 7 == 3 slice — new vectors arriving after the
    build) is appended BUCKET-ALIGNED with `similarity.append_ivf_index`
    — same deterministic hyperplanes ⇒ same cell assignment, one new
    file per touched cell, cells the delta misses never rewritten, NO
    index rebuild. The query then answers against the maintained index
    exactly as before: `lsh_topk_ivf` prunes to ONE partition directory
    (now multi-file), pinned in tests/test_plans.py. The oracle replays
    base ∪ delta as one fresh SQL index — identical bucketing + ranking
    — so a dropped or duplicated delta row in the query's cell breaks
    the top-k hash, and the piggybacked `n_indexed` count (1-row
    broadcast join, never a collect) breaks on ANY cell losing or
    doubling rows. At 100 TB: O(|delta|) shuffle per ingest batch
    instead of an O(corpus) re-shuffle; file accumulation is
    `layout.compact_parquet`'s job like any bucketed fact
    (`similarity.py:append_ivf_index`)."""
    import hashlib
    import os
    import tempfile

    emb = T(spark, sf_dir, "embeddings")
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_ivfinc_{tag}_{os.getpid()}"
    )
    corpus = emb.filter(F.col("vec_id") != 0)
    SIM.write_ivf_index(corpus.filter(F.col("vec_id") % 7 != 3), path)
    SIM.append_ivf_index(corpus.filter(F.col("vec_id") % 7 == 3), path)
    qv = _query_vec(spark, sf_dir)
    n = (
        spark.read.parquet(path)
        .groupBy()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_indexed"))
    )
    return SIM.lsh_topk_ivf(spark, path, qv, k=5).crossJoin(F.broadcast(n))


@query(
    "stream_ivf_ingest",
    oracle=f"""
    WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
               FROM embeddings WHERE vec_id = 0),
         e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings WHERE vec_id <> 0)
    SELECT vec_id,
           round(list_dot_product(v, qv) /
                 (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cosine,
           n_indexed
    FROM e, q,
         (SELECT CAST(count(*) AS BIGINT) AS n_indexed FROM e) n
    WHERE ({_bucket_sql("v")}) = ({_bucket_sql("qv")})
    ORDER BY cosine DESC, vec_id LIMIT 5
    """,
)
def d03stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING IVF-index maintenance through the snapshot protocol
    (round 14 — `streaming.ingest.foreach_batch_ivf` +
    `similarity.snapshot_ivf_topk`; with the postings twin this closes
    BOTH serving layouts' maintenance end-to-end: build r13, batch
    append r13, streaming append r14): the embeddings stream drains
    through foreachBatch, each micro-batch bucketed with the same
    deterministic hyperplanes as any batch build, committed as ONE
    snapshot version with its batch_id (crash-replay = manifest no-op)
    and per-file __bucket zone maps; the query computes its cell
    driver-side and plans from one manifest read, keeping only files
    whose bucket range covers that cell. The oracle replays the full
    corpus as a fresh SQL index — identical bucketing + ranking — so a
    dropped or doubled micro-batch row in the query's cell breaks the
    top-k hash and the piggybacked n_indexed count breaks on ANY cell
    losing or doubling rows, independent of where the engine cut the
    batches."""
    import hashlib
    import os
    import shutil
    import tempfile

    from etl_cortex_spark.streaming.events import read_table_stream
    from etl_cortex_spark.streaming.ingest import foreach_batch_ivf

    h = f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}_{os.getpid()}"
    base = os.path.join(tempfile.gettempdir(), "etl_cortex_spark_ivfstream", h)
    shutil.rmtree(base, ignore_errors=True)
    emb = read_table_stream(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") != 0
    )
    q = foreach_batch_ivf(
        emb,
        path=os.path.join(base, "table"),
        checkpoint_dir=os.path.join(base, "ckpt"),
    )
    q.awaitTermination()
    qv = _query_vec(spark, sf_dir)
    idx = os.path.join(base, "table")
    from etl_cortex_spark.operators.layout import snapshot_read

    n = (
        snapshot_read(spark, idx)
        .groupBy()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_indexed"))
    )
    return SIM.snapshot_ivf_topk(spark, idx, qv, k=5).crossJoin(F.broadcast(n))


# --- D4: text analysis --------------------------------------------------------


@query(
    "d04_token_stats",
    oracle=rf"""
    SELECT lang,
           count(*) AS n_docs,
           round(avg(len({_WORDS})), 4) AS avg_tokens,
           round(avg(length(regexp_extract_all(text, '{TX.BPE_TOKEN_RE}'))), 4) AS avg_bpe_tokens,
           round(avg(length(text)), 4) AS avg_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def d04(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang",
            TX.n_tokens("text").alias("nt"),
            TX.n_bpe_tokens("text").alias("nb"),
            F.length("text").cast("bigint").alias("nc"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("nt"), 4).alias("avg_tokens"),
            F.round(F.avg("nb"), 4).alias("avg_bpe_tokens"),
            F.round(F.avg("nc"), 4).alias("avg_chars"),
        )
        # |lang| rows: local sort == global order, no range exchange
        .coalesce(1)
        .sortWithinPartitions("lang")
    )


_SW = ", ".join(f"'{s}'" for s in TX.STOPWORDS)


@query(
    "d04_quality_score",
    oracle=rf"""
    SELECT doc_id,
           round(0.4 * least(length(text) / 500.0, 1.0)
               + 0.3 * (len(list_distinct({_WORDS})) / greatest(len({_WORDS}), 1))
               + 0.3 * (len(list_filter({_WORDS}, x -> list_contains([{_SW}], lower(x))))
                        / greatest(len({_WORDS}), 1)), 6) AS quality
    FROM documents WHERE doc_id % 5 = 0
    """,
)
def d04b(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return docs.select("doc_id", TX.quality_score("text").alias("quality"))


_M = {k: ", ".join(f"'{m}'" for m in v) for k, v in TX.LANG_MARKERS.items()}


@query(
    "d04_lang_id",
    oracle=rf"""
    WITH scored AS (
      SELECT doc_id, lang AS label,
             len(list_filter({_WORDS}, x -> list_contains([{_M["en"]}], lower(x)))) AS c_en,
             len(list_filter({_WORDS}, x -> list_contains([{_M["es"]}], lower(x)))) AS c_es,
             len(list_filter({_WORDS}, x -> list_contains([{_M["fr"]}], lower(x)))) AS c_fr
      FROM documents WHERE doc_id % 5 = 0
    )
    SELECT doc_id, label,
           CASE WHEN c_en = 0 AND c_es = 0 AND c_fr = 0 THEN 'und'
                WHEN c_fr >= c_es AND c_fr >= c_en THEN 'fr'
                WHEN c_es >= c_en THEN 'es'
                ELSE 'en' END AS lang_pred
    FROM scored
    """,
)
def d04c(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return docs.select(
        "doc_id", F.col("lang").alias("label"), TX.lang_id("text").alias("lang_pred")
    )


@query(
    "d04_fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_aggregate(list_transform(
             list_transform(range(1, greatest(len({_WORDS}) - 3, 2)),
                            i -> array_to_string(array_slice({_WORDS}, i, i + 4), ' ')),
             g -> md5(g)), 'min') AS fingerprint
    FROM documents WHERE doc_id % 5 = 0
    """,
)
def d04d(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return docs.select("doc_id", TX.kgram_fingerprint("text", k=5).alias("fingerprint"))


def _ngram_counts_sql(n: int) -> str:
    """list of per-distinct-gram occurrence counts for word n-grams."""
    grams = (
        f"CASE WHEN len({_WORDS}) >= {n} THEN "
        f"list_transform(range(1, len({_WORDS}) - {n} + 2), "
        f"i -> array_to_string(list_slice({_WORDS}, i, i + {n - 1}), ' ')) "
        f"ELSE [] END"
    )
    return grams


@query(
    "d04_repetition_signals",
    oracle=rf"""
    WITH g AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(text, chr(10)),
                         x -> trim(x)), x -> x <> '') AS L,
             {_ngram_counts_sql(2)} AS G2,
             {_ngram_counts_sql(3)} AS G3,
             {_ngram_counts_sql(5)} AS G5
      FROM documents
    ), c AS (
      SELECT doc_id, L, G2, G3, G5,
             list_transform(list_distinct(G2), gg -> len(list_filter(G2, x -> x = gg))) AS C2,
             list_transform(list_distinct(G3), gg -> len(list_filter(G3, x -> x = gg))) AS C3,
             list_transform(list_distinct(G5), gg -> len(list_filter(G5, x -> x = gg))) AS C5
      FROM g
    )
    SELECT doc_id,
           CASE WHEN len(L) > 0
                THEN 1.0 - len(list_distinct(L)) / len(L) ELSE 0.0 END AS dup_line_frac,
           COALESCE(list_max(C2) / greatest(len(G2), 1), 0.0) AS top2_frac,
           COALESCE(list_max(C3) / greatest(len(G3), 1), 0.0) AS top3_frac,
           COALESCE(list_sum(list_filter(C5, x -> x >= 2)), 0) / greatest(len(G5), 1) AS dup5_frac
    FROM c ORDER BY doc_id
    """,
)
def d04g(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops repetition signals (Gopher §A1.1 family): duplicate-line
    fraction, top-bigram/-trigram occurrence fraction, duplicate-5-gram
    fraction. Every signal is an exact integer quotient, so the raw
    doubles hash-match across engines unrounded. Per-row column
    expressions only — quadratic in each doc's distinct grams,
    embarrassingly parallel, zero shuffles before the ORDER BY (the
    same shuffle-free contract as the d04 family plan test)."""
    docs = T(spark, sf_dir, "documents")
    # round 19, two plan-level changes (bit-equal outputs, oracle
    # re-verified): (1) the token array is materialized ONCE and all
    # three gram widths derive from it — the interpreted split+filter
    # tokenizer was re-evaluated per signal (measured 1.8 s -> 0.9 s
    # at sf0.1); (2) the trailing global orderBy became a local sort —
    # its range-sampling pass re-executed the whole HOF chain
    # (3.3 s -> 1.8 s).
    w = F.col("__w")
    return (
        docs.select("doc_id", "text", TX.words("text").alias("__w"))
        .select(
            "doc_id",
            TX.dup_line_frac("text").alias("dup_line_frac"),
            TX.top_ngram_frac("text", 2, words_col=w).alias("top2_frac"),
            TX.top_ngram_frac("text", 3, words_col=w).alias("top3_frac"),
            TX.dup_ngram_frac("text", 5, words_col=w).alias("dup5_frac"),
        )
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


# --- D5: multimodal -----------------------------------------------------------


@query("multimodal_features")  # rows-only: mapInPandas pipeline, not SQL
def d05(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    assets = MM.synthesize_assets(docs)
    return MM.extract_features(assets)


@query(
    "d05_wav_decode_features",
    oracle="""
    WITH s AS (
      SELECT doc_id, i,
             (doc_id * 7919 + i * 104729) % 65536 - 32768 AS sample
      FROM documents, range(0, 2400) t(i)
      WHERE i < 800 + (doc_id % 5) * 400
    )
    SELECT doc_id AS asset_id,
           CAST(16000 AS INT) AS sample_rate,
           CAST(1 AS INT) AS n_channels,
           count(*) AS n_samples,
           count(*) / 16000.0 AS duration_s,
           sqrt(sum(sample * sample) / count(*)) AS rms,
           CAST(max(abs(sample)) AS INT) AS peak
    FROM s GROUP BY doc_id ORDER BY asset_id
    """,
)
def d05w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, cross-checked: the Spark side builds genuine
    RIFF/WAVE PCM16 containers (samples from an integer closed form)
    and DECODES THE BYTES — header magics, fmt chunk, numpy PCM frame
    decode — inside ``mapInPandas``; the oracle never sees the bytes
    and regenerates every sample from the closed form in SQL. A match
    therefore proves the container round-trip, not just the stats.
    ``rms`` is emitted unrounded (every step is bit-identical across
    engines: exact integer sums in double range, correctly-rounded
    sqrt). The only remaining decode stub is compressed codecs
    (``decode_image``), which genuinely need external libraries."""
    docs = T(spark, sf_dir, "documents")
    assets = MM.synthesize_wav_assets(docs)
    # repartition(1).sortWithinPartitions THRESHOLD (round-20, the r19
    # ADVICE): the local-sort pattern applies to outputs that fit one
    # task with headroom (~100 MB / ≲100k rows at any supported SF) —
    # k-row aggregates, sample-bounded frames, and the per-document
    # feature frames of this family (≤5k rows/SF-0.1). Corpus-sized
    # outputs (b17, b23, scale_*) keep the distributed range sort; at
    # true 100 TB per-document scale these entries would too.
    return MM.decode_wav_features(assets).repartition(1).sortWithinPartitions("asset_id")


@query(
    "d05_image_decode_features",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             15 + (doc_id % 4) * 8 AS w,
             12 + (doc_id % 3) * 4 AS h,
             i % (15 + (doc_id % 4) * 8) AS x,
             i // (15 + (doc_id % 4) * 8) AS y
      FROM documents, range(0, 800) t(i)
      WHERE i < (15 + (doc_id % 4) * 8) * (12 + (doc_id % 3) * 4)
    )
    SELECT doc_id AS asset_id,
           CAST(max(w) AS INT) AS width,
           CAST(max(h) AS INT) AS height,
           count(*) AS n_pixels,
           CAST(sum((doc_id * 23 + x * 3 + y * 19) % 256) AS DOUBLE) / count(*) AS mean_r,
           CAST(sum((doc_id * 17 + x * 5 + y * 11) % 256) AS DOUBLE) / count(*) AS mean_g,
           CAST(sum((doc_id * 31 + x * 7 + y * 13) % 256) AS DOUBLE) / count(*) AS mean_b,
           CAST((doc_id * 23) % 256 + (doc_id * 17) % 256 + (doc_id * 31) % 256
                AS INT) AS topleft_lum
    FROM p GROUP BY doc_id ORDER BY asset_id
    """,
)
def d05i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, cross-checked — the image leg of the d05-WAV
    proof (round-5 verdict stretch #8): the Spark side builds genuine
    24-bpp BMP containers (closed-form integer pixels) and DECODES THE
    BYTES — magic, both headers, 4-byte row padding, bottom-up row
    order, BGR interleave — inside ``mapInPandas``; the oracle never
    sees the bytes and regenerates every pixel from the closed form.
    ``topleft_lum`` reads pixel (0,0) in image coordinates, i.e. the
    LAST stored row, so orientation handling is part of the proof.
    Means are exact-integer-sum / count, emitted unrounded."""
    docs = T(spark, sf_dir, "documents")
    assets = MM.synthesize_bmp_assets(docs)
    return MM.decode_bmp_features(assets).repartition(1).sortWithinPartitions("asset_id")


@query(
    "d05_png_decode_features",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             17 + (doc_id % 4) * 8 AS w,
             9 + (doc_id % 3) * 5 AS h,
             i % (17 + (doc_id % 4) * 8) AS x,
             i // (17 + (doc_id % 4) * 8) AS y
      FROM documents, range(0, 800) t(i)
      WHERE i < (17 + (doc_id % 4) * 8) * (9 + (doc_id % 3) * 5)
    )
    SELECT doc_id AS asset_id,
           CAST(max(w) AS INT) AS width,
           CAST(max(h) AS INT) AS height,
           count(*) AS n_pixels,
           CAST(sum((doc_id * 23 + x * 3 + y * 19) % 256) AS DOUBLE) / count(*) AS mean_r,
           CAST(sum((doc_id * 17 + x * 5 + y * 11) % 256) AS DOUBLE) / count(*) AS mean_g,
           CAST(sum((doc_id * 31 + x * 7 + y * 13) % 256) AS DOUBLE) / count(*) AS mean_b,
           CAST((doc_id * 23) % 256 + (doc_id * 17) % 256 + (doc_id * 31) % 256
                AS INT) AS topleft_lum
    FROM p GROUP BY doc_id ORDER BY asset_id
    """,
)
def d05p(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode, cross-checked — the COMPRESSED
    container leg of the d05 proof family (round-8 verdict #2: the
    decoder shipped in r8 unregistered; this entry wires it): the
    Spark side builds genuine non-interlaced 8-bit RGB PNGs —
    CRC-32-carrying chunks, DEFLATE-compressed scanlines split across
    TWO IDAT chunks, row ``y`` filtered with type ``(doc_id + y) %
    5`` so all five PNG filters appear in every asset — and DECODES
    THE BYTES (chunk walk with CRC verification, zlib inflate, full
    None/Sub/Up/Average/Paeth unfiltering) inside ``mapInPandas``;
    the oracle never sees the bytes and regenerates every pixel from
    the shared closed form. ``topleft_lum`` reads pixel (0,0), the
    FIRST stored row — the opposite orientation proof from bottom-up
    BMP. The synthesizer reads dimensions from ``multimodal._png_dims``
    (distinct from the BMP set so the two image entries never share
    byte layouts); this oracle inlines the same closed form, and the
    sf0.001 oracle sweep pins the two together. Means are exact-
    integer-sum / count, emitted unrounded."""
    docs = T(spark, sf_dir, "documents")
    assets = MM.synthesize_png_assets(docs)
    return MM.decode_png_features(assets).repartition(1).sortWithinPartitions("asset_id")


@query(
    "d05_jpeg_decode_features",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             16 + (doc_id % 3) * 8 AS w,
             8 + (doc_id % 4) * 8 AS h,
             i % ((16 + (doc_id % 3) * 8) // 8) AS bx,
             i // ((16 + (doc_id % 3) * 8) // 8) AS by
      FROM documents, range(0, 16) t(i)
      WHERE i < ((16 + (doc_id % 3) * 8) // 8) * ((8 + (doc_id % 4) * 8) // 8)
    )
    SELECT doc_id AS asset_id,
           CAST(max(w) AS INT) AS width,
           CAST(max(h) AS INT) AS height,
           CAST(max(w) * max(h) AS BIGINT) AS n_pixels,
           CAST(sum(128 + ((doc_id * 7 + bx * 5 + by * 3) % 160 - 80)) AS DOUBLE)
             / count(*) AS mean_lum,
           CAST(128 + ((doc_id * 7) % 160 - 80) AS INT) AS topleft_lum
    FROM b GROUP BY doc_id ORDER BY asset_id
    """,
)
def d05j(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL entropy-coded image decode, cross-checked — the Huffman+DCT
    leg of the d05 proof family (round-9 verdict #7, retiring jpeg
    from the NotImplementedError contract): the Spark side builds
    genuine single-component baseline sequential JPEGs (T.81 segment
    grammar: DQT/SOF0/two DHTs/SOS, canonical-Huffman entropy scan
    with byte stuffing) and DECODES THE BYTES inside ``mapInPandas``
    with a general baseline decoder — DHT-driven canonical Huffman,
    the full AC run-length loop, dezigzag, dequantize, complete 2-D
    IDCT. The assets are DC-only by design so every decoded pixel is
    the exact integer ``128 + qDC`` (q[0]=8 makes dequant/IDCT cancel
    to the stored coefficient) and this oracle regenerates every
    block value from the shared closed form without trigonometry —
    the pixel mean over equal 64-px blocks equals the block-value
    mean, and the two engines' divisions agree bit-for-bit because
    the operands differ by an exact power of two. Dimensions come
    from ``multimodal._jpeg_dims`` (MCU-aligned multiples of 8,
    distinct from the BMP/PNG sets); ``topleft_lum`` is block (0,0)'s
    value. Means are exact-integer-sum / count, emitted unrounded."""
    docs = T(spark, sf_dir, "documents")
    assets = MM.synthesize_jpeg_assets(docs)
    return MM.decode_jpeg_features(assets).repartition(1).sortWithinPartitions("asset_id")


@query(
    "d05_color_jpeg_decode_features",
    oracle="""
    WITH yb AS (
      SELECT doc_id,
             16 + (doc_id % 3) * 16 AS w,
             16 + (doc_id % 2) * 16 AS h,
             i % ((16 + (doc_id % 3) * 16) // 8) AS bx,
             i // ((16 + (doc_id % 3) * 16) // 8) AS by
      FROM documents, range(0, 24) t(i)
      WHERE i < ((16 + (doc_id % 3) * 16) // 8) * ((16 + (doc_id % 2) * 16) // 8)
    ),
    ya AS (
      SELECT doc_id, max(w) AS w, max(h) AS h,
             CAST(sum(128 + ((doc_id*7 + bx*5 + by*3) % 160 - 80)) AS DOUBLE)
               / count(*) AS mean_y,
             CAST(sum(least(greatest(FLOOR(
                   (128 + ((doc_id*7 + bx*5 + by*3) % 160 - 80))
                 + 1.402e0 * ((doc_id*13 + (bx//2)*3 + (by//2)*7) % 120 - 60)
                 + 0.5), 0), 255)) AS DOUBLE) / count(*) AS mean_r
      FROM yb GROUP BY doc_id
    ),
    cm AS (
      SELECT doc_id,
             i % ((16 + (doc_id % 3) * 16) // 16) AS mx,
             i // ((16 + (doc_id % 3) * 16) // 16) AS my
      FROM documents, range(0, 6) t(i)
      WHERE i < ((16 + (doc_id % 3) * 16) // 16) * ((16 + (doc_id % 2) * 16) // 16)
    ),
    ca AS (
      SELECT doc_id,
             CAST(sum(128 + ((doc_id*11 + mx*5 + my*3) % 120 - 60)) AS DOUBLE)
               / count(*) AS mean_cb,
             CAST(sum(128 + ((doc_id*13 + mx*3 + my*7) % 120 - 60)) AS DOUBLE)
               / count(*) AS mean_cr
      FROM cm GROUP BY doc_id
    )
    SELECT ya.doc_id AS asset_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           mean_y, mean_cb, mean_cr, mean_r,
           CAST(least(greatest(FLOOR((128 + ((ya.doc_id*7) % 160 - 80))
             + 1.402e0 * ((ya.doc_id*13) % 120 - 60) + 0.5), 0), 255) AS INT)
             AS topleft_r,
           CAST(least(greatest(FLOOR((128 + ((ya.doc_id*7) % 160 - 80))
             - 0.344136e0 * ((ya.doc_id*11) % 120 - 60)
             - 0.714136e0 * ((ya.doc_id*13) % 120 - 60) + 0.5), 0), 255) AS INT)
             AS topleft_g,
           CAST(least(greatest(FLOOR((128 + ((ya.doc_id*7) % 160 - 80))
             + 1.772e0 * ((ya.doc_id*11) % 120 - 60) + 0.5), 0), 255) AS INT)
             AS topleft_b
    FROM ya JOIN ca ON ya.doc_id = ca.doc_id
    ORDER BY asset_id
    """,
)
def d05cj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COLOR image decode (round-10 verdict #7, retiring "color"
    from the NotImplementedError contract): the Spark side builds
    genuine 3-component baseline-sequential 4:2:0 YCbCr JPEGs (T.81:
    two quant tables, four DHT segments, interleaved MCU scan of four
    Y blocks + Cb + Cr with per-component DC predictors) and decodes
    the bytes inside ``mapInPandas`` with a general multi-component
    baseline decoder — per-component sampling/table selection, the
    full Huffman/AC/dezigzag/dequant/2-D-IDCT kernel per block,
    nearest-neighbor chroma upsampling, and the JFIF YCbCr→RGB
    conversion rounded as floor(x+0.5) so this oracle can replay the
    IDENTICAL IEEE expression in SQL. Assets are DC-only per
    component (the decoder still runs the general path), so each
    plane is block-uniform and every feature has a closed form:
    means are exact-integer-sum / count where the two engines'
    numerators and denominators differ by an exact power of two
    (64 px per luma block, 256 per chroma MCU) — bit-identical
    divisions. mean_r proves the color conversion across every
    block (R is uniform per 8×8 luma block because chroma is uniform
    per enclosing MCU); topleft_r/g/b pin all three channel formulas
    at full precision. Dimensions from ``_color_jpeg_dims``
    (16-aligned, distinct from every other asset family)."""
    docs = T(spark, sf_dir, "documents")
    assets = MM.synthesize_color_jpeg_assets(docs)
    return MM.decode_color_jpeg_features(assets).repartition(1).sortWithinPartitions("asset_id")


@query(
    "d05_image_resize_features",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             15 + (doc_id % 4) * 8 AS w,
             12 + (doc_id % 3) * 4 AS h
      FROM documents
    ),
    d AS (
      SELECT doc_id, w, h,
             greatest(w * 8 // greatest(w, h), 1) AS ow,
             greatest(h * 8 // greatest(w, h), 1) AS oh
      FROM s
    ),
    p AS (
      SELECT doc_id, w, h, ow, oh, i % ow AS x, i // ow AS y
      FROM d, range(0, 64) t(i) WHERE i < ow * oh
    )
    SELECT doc_id AS asset_id,
           CAST(max(ow) AS INT) AS width,
           CAST(max(oh) AS INT) AS height,
           count(*) AS n_pixels,
           CAST(sum((doc_id * 23 + ((x * w) // ow) * 3 + ((y * h) // oh) * 19) % 256)
                AS DOUBLE) / count(*) AS mean_r,
           CAST(sum((doc_id * 17 + ((x * w) // ow) * 5 + ((y * h) // oh) * 11) % 256)
                AS DOUBLE) / count(*) AS mean_g,
           CAST(sum((doc_id * 31 + ((x * w) // ow) * 7 + ((y * h) // oh) * 13) % 256)
                AS DOUBLE) / count(*) AS mean_b,
           CAST((doc_id * 23) % 256 + (doc_id * 17) % 256 + (doc_id * 31) % 256
                AS INT) AS topleft_lum
    FROM p GROUP BY doc_id ORDER BY asset_id
    """,
)
def d05rz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize (round 11 — retires the last fake pixel
    kernel): synthesize genuine BMPs, decode + NEAREST-NEIGHBOR
    downscale to max_side=8 with pure integer arithmetic + RE-ENCODE
    a valid bottom-up BMP (`multimodal.resize_bmp_nearest`), then run
    the resized payloads through the SAME `decode_bmp_features` the
    original-image entry uses — the round-trip proves the re-encoder
    writes files the decoder family accepts. Every resized pixel has
    a closed form (source pixel at sx = x·w // ow), so the oracle
    regenerates the downscaled image without seeing any bytes; the
    integer scale rule (ow = w·8 // max(w,h)) keeps the dimensions
    cross-engine exact where a float scale factor could flip."""
    docs = T(spark, sf_dir, "documents")
    assets = MM.synthesize_bmp_assets(docs)
    resized = MM.resize_bmp_nearest(assets, max_side=8)
    return (
        MM.decode_bmp_features(resized.select("asset_id", "payload"))
        .repartition(1)
        .sortWithinPartitions("asset_id")
    )


@query(
    "d05_avi_container_features",
    oracle="""
    WITH a AS (
      SELECT doc_id,
             160 + (doc_id % 4) * 80 AS w,
             120 + (doc_id % 3) * 60 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 24 ELSE 30000 END AS rate,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 1001 END AS scale,
             10 + doc_id % 16 AS n
      FROM documents
    ),
    f AS (
      SELECT doc_id, CAST(sum(64 + ((doc_id * 31 + i * 17) % 128)) AS BIGINT)
               AS movi_bytes
      FROM a, range(0, 26) t(i) WHERE i < n GROUP BY doc_id
    )
    SELECT a.doc_id AS asset_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(n AS INT) AS n_frames,
           CAST(rate AS DOUBLE) / scale AS fps,
           CAST(n * scale AS DOUBLE) / rate AS duration_s,
           f.movi_bytes,
           CAST(a.doc_id % 256 AS INT) AS first_frame_byte
    FROM a JOIN f ON a.doc_id = f.doc_id
    ORDER BY asset_id
    """,
)
def d05avi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container parse (round 11): the Spark side builds
    genuine minimal RIFF-AVI files (hdrl/avih + vids strh/strf +
    movi with one 00dc chunk per frame, odd sizes padded per RIFF)
    and PARSES THE BYTES back with a general RIFF walker — magic and
    size validation, padded tree walk, header/stream extraction, and
    a full movi walk that must agree with BOTH header frame counts or
    raise (the truncated-upload check a real video corpus needs).
    This moves video from "stub" to the honest production split: all
    container metadata a sharding/sampling pipeline uses is parsed
    for real; only the codec decode of the (deterministic fake) frame
    payloads remains the documented stub. fps and duration_s are
    exact integer-operand divisions — bit-identical across engines;
    movi_bytes replays the frame-size closed form with a range join."""
    docs = T(spark, sf_dir, "documents")
    assets = MM.synthesize_avi_assets(docs)
    return MM.parse_avi_features(assets).repartition(1).sortWithinPartitions("asset_id")


@query(
    "d05_avi_frame_decode",
    oracle="""
    WITH a AS (
      SELECT doc_id,
             6 + (doc_id % 3) * 5 AS w,
             5 + (doc_id % 2) * 4 AS h,
             3 + doc_id % 4 AS n
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, f.i AS f, x.i AS x, y.i AS y
      FROM a, range(0, 7) f(i), range(0, 16) x(i), range(0, 9) y(i)
      WHERE f.i < n AND x.i < w AND y.i < h
    ),
    m AS (
      SELECT doc_id, f, w, h,
             CAST(sum((doc_id*23 + x*3 + y*19 + f*37) % 256) AS DOUBLE) / (w*h) AS mean_r,
             CAST(sum((doc_id*17 + x*5 + y*11 + f*23) % 256) AS DOUBLE) / (w*h) AS mean_g,
             CAST(sum((doc_id*31 + x*7 + y*13 + f*29) % 256) AS DOUBLE) / (w*h) AS mean_b
      FROM px GROUP BY doc_id, f, w, h
    )
    SELECT doc_id AS asset_id, CAST(f AS INT) AS frame_idx,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           mean_r, mean_g, mean_b,
           CAST((doc_id*23 + f*37) % 256 AS INT) AS topleft_r,
           CAST((doc_id*17 + f*23) % 256 AS INT) AS topleft_g,
           CAST((doc_id*31 + f*29) % 256 AS INT) AS topleft_b
    FROM m ORDER BY asset_id, frame_idx
    """,
)
def d05avif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video FRAME-PIXEL decode (round 12 — the verdict-#2 stretch
    goal): the Spark side builds genuine RIFF-AVIs whose 00db chunks
    carry UNCOMPRESSED bottom-up BI_RGB DIB rows (stride-padded; 2 of
    3 width classes exercise real padding) and decodes EVERY frame's
    pixels back through the BMP row kernel — stride un-pad, bottom-up
    flip, BGR split — emitting exact per-channel means and the
    top-left pixel per frame. This retires the video-codec
    NotImplementedError for the uncompressed case; only COMPRESSED
    codecs (and mp3 sample decode) remain the documented stub
    (operators/multimodal.py decode_image). Channel means are integer
    sums exact in double → bit-identical across engines; the oracle
    replays the pixel ramps with a 3-way range join."""
    docs = T(spark, sf_dir, "documents")
    assets = MM.synthesize_dib_avi_assets(docs)
    return MM.decode_avi_frame_features(assets).repartition(1).sortWithinPartitions("asset_id", "frame_idx")


@query(
    "d05_mp3_frame_walk",
    oracle="""
    WITH a AS (
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                  ELSE 32000 END AS sr,
             20 + doc_id % 30 AS n
      FROM documents
    ),
    f AS (
      SELECT doc_id, sr, n,
             list_extract([32,40,48,56,64,80,96,112,128,160,192,224,256,320],
                          1 + ((doc_id * 7 + i * 13) % 14)) AS kbps,
             (doc_id + i) % 2 AS pad
      FROM a, range(0, 50) t(i) WHERE i < n
    )
    SELECT doc_id AS asset_id,
           CAST(max(n) AS INT) AS n_frames,
           CAST(max(sr) AS INT) AS samplerate,
           CAST(max(n) * 1152 AS DOUBLE) / max(sr) AS duration_s,
           CAST(sum((144000 * kbps) // sr + pad) AS BIGINT) AS total_bytes,
           CAST(sum(kbps) AS DOUBLE) / count(*) AS avg_bitrate_kbps,
           CAST(sum(pad) AS INT) AS n_padded
    FROM f GROUP BY doc_id ORDER BY asset_id
    """,
)
def d05mp3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP3 frame-header walk (round 11, the audio twin of the AVI
    container split): the Spark side builds genuine MPEG-1 Layer III
    frame sequences — a real ID3v2.4 tag with a SYNCSAFE size, then
    VBR frames whose 4-byte headers carry per-frame bitrate indices,
    the asset's sample-rate index, and padding bits, each followed by
    exactly the payload length the header declares — and walks the
    bytes back header by header: sync/version/layer validation,
    free/reserved index rejection, ID3 skip, length-driven
    advancement that desynchronizes loudly on any truncation. Sample
    decode stays the documented stub; duration, VBR average bitrate,
    and the padding census — what an audio corpus pipeline budgets
    on — are computed from the real headers. duration_s and
    avg_bitrate_kbps are exact integer-operand divisions; total_bytes
    replays the frame-length formula (144000·kbps // rate + pad) with
    a range join and the same 14-entry bitrate table."""
    docs = T(spark, sf_dir, "documents")
    assets = MM.synthesize_mp3_assets(docs)
    return MM.parse_mp3_features(assets).repartition(1).sortWithinPartitions("asset_id")


def _si_bits_sql(p: int, w: int) -> str:
    """DuckDB expression extracting the ``w``-bit field at fixed bit
    offset ``p`` of a Layer III side-info block whose byte j is the
    fixture closed form (j + d*5 + i*11) % 256 (columns d, i). Mono
    side info is a FIXED 136-bit layout (both branch arms of the
    granule tail are 22 bits), so every field lives at a constant
    offset — three consecutive bytes always cover rem+w ≤ 19 bits."""
    a, rem = divmod(p, 8)

    def b(x: int) -> str:
        return f"(({x} + d*5 + i*11) % 256)"

    return (
        f"(({b(a)}*65536 + {b(a + 1)}*256 + {b(a + 2)}) >> {24 - rem - w}) "
        f"& {(1 << w) - 1}"
    )


@query(
    "d05_mp3_sideinfo",
    oracle=f"""
    WITH f AS (
      SELECT doc_id AS d, i,
             list_extract([32,40,48,56,64,80,96,112,128,160,192,224,256,320],
                          1 + ((doc_id * 7 + i * 13) % 14)) AS kbps,
             (doc_id + i) % 2 AS pad,
             CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                  ELSE 32000 END AS sr
      FROM documents, range(0, 50) t(i) WHERE i < 20 + doc_id % 30
    ),
    sz AS (SELECT d, i, (144000 * kbps) // sr + pad AS size FROM f),
    si AS (
      SELECT d, i, size,
             {_si_bits_sql(0, 9)} AS mdb,
             ({_si_bits_sql(18, 12)}) + ({_si_bits_sql(77, 12)}) AS p23,
             ({_si_bits_sql(30, 9)}) + ({_si_bits_sql(89, 9)}) AS bv,
             ({_si_bits_sql(39, 8)}) + ({_si_bits_sql(98, 8)}) AS gg,
             {_si_bits_sql(51, 1)} AS wsf0, {_si_bits_sql(110, 1)} AS wsf1,
             {_si_bits_sql(52, 2)} AS bt0, {_si_bits_sql(111, 2)} AS bt1
      FROM sz
    ),
    res AS (
      SELECT *,
             coalesce(sum(size - 21) OVER (PARTITION BY d ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS donated
      FROM si
    )
    SELECT d AS asset_id,
           CAST(count(*) AS INT) AS n_frames,
           CAST(sum(mdb) AS BIGINT) AS sum_main_data_begin,
           CAST(sum(CASE WHEN mdb > donated THEN 1 ELSE 0 END) AS INT)
             AS n_reservoir_violations,
           CAST(sum(p23) AS BIGINT) AS sum_part23,
           CAST(sum(bv) AS BIGINT) AS sum_big_values,
           CAST(sum(gg) AS BIGINT) AS sum_global_gain,
           CAST(sum(wsf0 + wsf1) AS INT) AS n_window_switching,
           CAST(sum(wsf0 * (CASE WHEN bt0 = 2 THEN 1 ELSE 0 END)
                  + wsf1 * (CASE WHEN bt1 = 2 THEN 1 ELSE 0 END)) AS INT)
             AS n_short_blocks,
           CAST(sum(wsf0 * (CASE WHEN bt0 = 0 THEN 1 ELSE 0 END)
                  + wsf1 * (CASE WHEN bt1 = 0 THEN 1 ELSE 0 END)) AS INT)
             AS n_reserved_block_type
    FROM res GROUP BY d ORDER BY asset_id
    """,
)
def d05mp3si(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimodal.parse_mp3_sideinfo — REAL Layer III SIDE-INFO decode
    + bit-reservoir accounting (round 14; the boundary narrows again):
    the full ISO 11172-3 2.4.1.7 field walk over every frame's 17
    side-info bytes (main_data_begin, scfsi, and per-granule
    part2_3_length / big_values / global_gain / scalefac_compress /
    window-switching branch with block types and subblock gains), plus
    the decoder obligation no header walk sees — the BIT RESERVOIR:
    frame i may reach back main_data_begin bytes into capacity donated
    by previous frames (size − header − sideinfo each), and a frame
    claiming more than was ever donated is a hard decode error this
    census counts. After this, only tabulated spec data stays stubbed
    (Huffman Tables 3-B.7, synthesis window 3-B.3). FULL oracle: mono
    side info is a fixed 136-bit layout, so every field is a constant
    bit offset into the fixture's closed-form bytes — DuckDB replays
    each extraction with three-byte shift/mask arithmetic and the
    reservoir with a window sum. All outputs are order-free integer
    censuses (operators/multimodal.py:parse_mp3_sideinfo)."""
    docs = T(spark, sf_dir, "documents")
    assets = MM.synthesize_mp3_assets(docs)
    return MM.parse_mp3_sideinfo(assets).repartition(1).sortWithinPartitions("asset_id")


@query(
    "d05_mjpeg_frame_decode",
    oracle="""
    WITH a AS (
      SELECT doc_id,
             16 + (doc_id % 3) * 8 AS w,
             8 + (doc_id % 4) * 8 AS h,
             2 + doc_id % 3 AS nf
      FROM documents
    ),
    b AS (
      SELECT doc_id, w, h, fr.f,
             i % (w // 8) AS bx,
             i // (w // 8) AS by
      FROM a, range(0, 4) fr(f), range(0, 16) t(i)
      WHERE fr.f < nf AND i < (w // 8) * (h // 8)
    )
    SELECT doc_id AS asset_id,
           CAST(f AS INT) AS frame_idx,
           CAST(max(w) AS INT) AS width,
           CAST(max(h) AS INT) AS height,
           CAST(sum(128 + ((doc_id * 7 + bx * 5 + by * 3 + f * 11) % 160 - 80))
                AS DOUBLE) / (max(w) * max(h) / 64) AS mean_lum,
           CAST(128 + ((doc_id * 7 + f * 11) % 160 - 80) AS INT) AS topleft_lum
    FROM b GROUP BY doc_id, f ORDER BY asset_id, frame_idx
    """,
)
def d05mjpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COMPRESSED-video frame decode (round 13 — the first
    compressed codec retired from the stub, and the proof that the
    boundary was table data and libraries, never machinery): the Spark
    side builds genuine MOTION-JPEG AVIs — real RIFF grammar, fourcc
    MJPG, every ``00dc`` chunk a complete baseline JPEG with real
    Huffman entropy coding and byte stuffing — and decodes every
    frame's pixels back through the SAME module-level T.81 kernel the
    still-image leg uses (`multimodal.baseline_jpeg_pixels`, shared
    since the round-13 refactor: one kernel, two containers). Frames
    are DC-only by fixture design so each decoded block is exactly
    128 + qDC and this oracle replays per-frame means from the closed
    form with a frames×blocks range join — no trigonometry, the
    d05_jpeg pattern extended with the frame index. The remaining
    video stub is the INTER-FRAME family (H.26x/VPx/AV1: motion
    compensation + arithmetic coders — reference-library territory),
    stated in `multimodal.decode_image`. Wrong-codec routing and
    truncation raise loudly (pytest twins, tests/test_multimodal_wav.py)."""
    docs = T(spark, sf_dir, "documents")
    assets = MM.synthesize_mjpeg_avi_assets(docs)
    return MM.decode_mjpeg_frame_features(assets).repartition(1).sortWithinPartitions("asset_id", "frame_idx")


@query(
    "d05_rle8_delta_decode",
    oracle="""
    WITH a AS (
      SELECT doc_id,
             8 + (doc_id % 3) * 4 AS w,
             6 + (doc_id % 2) * 3 AS h,
             3 + doc_id % 3 AS nf
      FROM documents
    ),
    fy AS (
      SELECT doc_id, w, h, nf, t1.f, t2.y
      FROM a, range(0, 5) t1(f), range(0, 9) t2(y)
      WHERE t1.f < nf AND t2.y < h
    ),
    upd AS (
      SELECT fy.doc_id, fy.f, fy.y, fy.w, fy.h, max(g.f2) AS fstar
      FROM fy LEFT JOIN range(1, 5) g(f2)
        ON g.f2 <= fy.f AND g.f2 < fy.nf
       AND ((fy.doc_id + g.f2 * 5) % fy.h) = fy.y
      GROUP BY fy.doc_id, fy.f, fy.y, fy.w, fy.h
    ),
    px AS (
      SELECT doc_id, f, y, w, h,
             CASE WHEN fstar IS NULL THEN (doc_id * 13 + y * 7) % 256
                  ELSE (doc_id * 11 + fstar * 17) % 256 END AS val
      FROM upd
    )
    SELECT doc_id AS asset_id, CAST(f AS INT) AS frame_idx,
           CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
           CAST(sum(val) * max(w) AS DOUBLE) / (max(w) * max(h)) AS mean_gray,
           CAST(max(CASE WHEN y = h - 1 THEN val END) AS INT) AS topleft_gray
    FROM px GROUP BY doc_id, f ORDER BY asset_id, frame_idx
    """,
)
def d05rle8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL INTER-FRAME video decode (round 13 — Microsoft BI_RLE8,
    the second compressed codec retired and the first with CROSS-FRAME
    STATE): frame 0 paints every row, each later frame DELTA-skips to
    one row and repaints only it, so every skipped pixel must be
    CARRIED from the previous frame's buffer — the inter-frame carry
    law MJPEG (independent frames) never exercises. The decoder
    (`multimodal.decode_rle8_frame_features`) maintains the mutable
    frame buffer, reads the file's REAL 256-entry RGBQUAD palette, and
    handles runs, absolute mode, EOL/EOS, and delta escapes with loud
    bounds checks. The oracle replays the carry law declaratively:
    last-repainting-frame per (frame, row) via a range anti/max join,
    then the closed-form row values — no buffer simulation in SQL,
    which is exactly the point (the imperative carry semantics reduce
    to a max-over-updates rule the hash check can pin). After this
    round the video stub is ONLY the motion-compensated family
    (H.26x/VPx/AV1 — reference-library territory,
    multimodal.decode_image)."""
    docs = T(spark, sf_dir, "documents")
    assets = MM.synthesize_rle8_avi_assets(docs)
    return MM.decode_rle8_frame_features(assets).repartition(1).sortWithinPartitions("asset_id", "frame_idx")


@query(
    "d05_mp2_sample_decode",
    oracle="""
    WITH f AS (SELECT doc_id, 3 + doc_id % 4 AS nf FROM documents),
    sfe AS (
      SELECT d.doc_id, s.sb, pp.p,
        CASE ((d.doc_id + s.sb) % 4)
          WHEN 0 THEN (d.doc_id + s.sb + pp.p) % 4
          WHEN 1 THEN (d.doc_id + s.sb + CASE WHEN pp.p < 2 THEN 0 ELSE 1 END) % 4
          WHEN 2 THEN (d.doc_id + s.sb) % 4
          ELSE        (d.doc_id + s.sb + CASE WHEN pp.p = 0 THEN 0 ELSE 1 END) % 4
        END AS e
      FROM documents d, (VALUES (0), (1), (2)) s(sb), (VALUES (0), (1), (2)) pp(p)
    ),
    sft AS (
      SELECT d.doc_id,
             CAST(sum(3 * ((d.doc_id + s.sb + tt.t) % 4)) AS BIGINT) AS per_frame
      FROM documents d, (VALUES (0), (1), (2)) s(sb), range(0, 3) tt(t)
      WHERE tt.t < CASE ((d.doc_id + s.sb) % 4)
                     WHEN 0 THEN 3 WHEN 1 THEN 2 WHEN 2 THEN 1 ELSE 2 END
      GROUP BY d.doc_id
    ),
    samp AS (
      SELECT f.doc_id, f.nf,
        CASE s.sb
          WHEN 0 THEN 8.0  * (((f.doc_id * 7 + q.fr * 5 + w.g * 3 + kk.k) % 15) - 7)
          WHEN 1 THEN 40.0 * (((f.doc_id + q.fr + w.g + kk.k) % 3) - 1)
          ELSE        24.0 * (((f.doc_id * 3 + q.fr + w.g * 2 + kk.k) % 5) - 2)
        END * power(2.0, 1 - sfe.e) AS term
      FROM f, range(0, 7) q(fr), range(0, 12) w(g),
           (VALUES (0), (1), (2)) s(sb), range(0, 3) kk(k)
      JOIN sfe ON sfe.doc_id = f.doc_id AND sfe.sb = s.sb
              AND sfe.p = w.g // 4
      WHERE q.fr < f.nf
    )
    SELECT samp.doc_id AS asset_id,
           CAST(max(samp.nf) AS INT) AS n_frames,
           CAST(48000 AS INT) AS samplerate,
           CAST(8 AS INT) AS sblimit,
           CAST(max(samp.nf) * 108 AS BIGINT) AS n_alloc_slots,
           CAST(sum(samp.term) AS BIGINT) AS sum_scaled_x60,
           CAST(max(samp.nf) * max(sft.per_frame) AS BIGINT) AS sum_sfidx,
           2.0 * (((samp.doc_id * 7) % 15) - 7) / 15
               * power(2.0, 1 - (samp.doc_id % 4)) AS first_sample
    FROM samp JOIN sft ON sft.doc_id = samp.doc_id
    GROUP BY samp.doc_id ORDER BY asset_id
    """,
)
def d05mp2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MPEG-1 LAYER II audio SAMPLE decode (round 13 — the
    round-12 verdict #5 alternative path, taken: Layer II's subband
    machinery first, the contract narrowed honestly): the Spark side
    builds genuine mono 48 kHz / 48 kbps Layer II streams (ID3v2.4 tag
    with syncsafe size, 144-byte frames, low-rate Table 3-B.2c
    allocation, scfsi-shared scalefactors, GROUPED 3/5-step triplet
    codes and ungrouped 15-step codes) and decodes the BYTES back in
    ``mapInPandas``: bit-exact allocation/scfsi/scalefactor reads,
    grouped base-steps digit unpacking, forbidden-code detection, and
    the ISO requantization algebra s' = sf·C·(s'''+D) in its exact
    rational form. Scalefactor indices are multiples of 3 by fixture
    construction, so every decoded sample is a dyadic rational and
    ``sum_scaled_x60`` — the sum of 60·sample over all 108 allocated
    slots per frame — is an exact integer this oracle replays with
    range joins and power-of-two arithmetic (the audio twin of the
    DC-only JPEG closed-form trick). ``sum_sfidx`` pins the
    scfsi→transmitted-count logic, ``first_sample`` the bitstream-
    first requantized value (identical single-division arithmetic).
    What remains stubbed (multimodal.decode_image, narrowed this
    round): the subband→PCM synthesis WINDOW (ISO Table 3-B.3: 512
    numerically-designed tabulated coefficients, unavailable offline),
    Layer III (Huffman Tables 3-B.7, same class of spec data), and
    compressed-video codecs. Grouped/edge corners carry pytest twins
    (tests/test_mp2.py)."""
    docs = T(spark, sf_dir, "documents")
    assets = MM.synthesize_mp2_assets(docs)
    return MM.decode_mp2_subband_features(assets).repartition(1).sortWithinPartitions("asset_id")


@query(
    "d05_tar_shard_manifest",
    oracle="""
    WITH a AS (SELECT doc_id, 4 + doc_id % 6 AS n FROM documents),
    m AS (
      SELECT doc_id, i, 0 AS kind,
             lpad(CAST(i AS VARCHAR), 6, '0') || '.jpg' AS member_name,
             400 + ((doc_id * 13 + i * 29) % 600) AS size
      FROM a, range(0, 10) t(i) WHERE i < n
      UNION ALL
      SELECT doc_id, i, 1,
             lpad(CAST(i AS VARCHAR), 6, '0') || '.json',
             80 + ((doc_id * 7 + i * 11) % 90)
      FROM a, range(0, 10) t(i) WHERE i < n
    )
    SELECT doc_id AS asset_id, member_name, CAST(size AS BIGINT) AS size,
           CAST(512 + coalesce(sum(512 + ((size + 511) // 512) * 512) OVER (
             PARTITION BY doc_id ORDER BY i * 2 + kind
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS data_offset
    FROM m ORDER BY asset_id, data_offset
    """,
)
def d05tar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WebDataset-shard manifest (round 11): multimodal training
    corpora ship as tar shards of (jpg, json) sample pairs; the
    shards here are written by the stdlib tarfile writer
    (USTAR_FORMAT) and walked back by a HAND-WRITTEN ustar header
    walker — 512-byte blocks, octal size fields, the chksum-as-spaces
    header checksum verified per member, end-of-archive zero-block
    stop, overrun/corruption raises — so the parse is independent of
    the writer. Output is the manifest a shard loader range-reads by:
    (member_name, size, exact data byte offset), payloads never
    materialized. The oracle regenerates names/sizes from the closed
    forms and replays the offset arithmetic (header + 512-padded
    payload running sum) as a window over the member sequence."""
    docs = T(spark, sf_dir, "documents")
    assets = MM.synthesize_tar_shards(docs)
    return MM.tar_shard_manifest(assets).repartition(1).sortWithinPartitions("asset_id", "data_offset")


@query(
    "d05_progressive_jpeg_decode_features",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             24 + (doc_id % 2) * 8 AS w,
             16 + (doc_id % 3) * 8 AS h,
             i % ((24 + (doc_id % 2) * 8) // 8) AS bx,
             i // ((24 + (doc_id % 2) * 8) // 8) AS by
      FROM documents, range(0, 16) t(i)
      WHERE i < ((24 + (doc_id % 2) * 8) // 8) * ((16 + (doc_id % 3) * 8) // 8)
    )
    SELECT doc_id AS asset_id,
           CAST(max(w) AS INT) AS width,
           CAST(max(h) AS INT) AS height,
           CAST(max(w) * max(h) AS BIGINT) AS n_pixels,
           CAST(sum(128 + ((doc_id * 7 + bx * 5 + by * 3) % 160 - 80)) AS DOUBLE)
             / count(*) AS mean_lum,
           CAST(128 + ((doc_id * 7) % 160 - 80) AS INT) AS topleft_lum
    FROM b GROUP BY doc_id ORDER BY asset_id
    """,
)
def d05pj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PROGRESSIVE JPEG decode (round 11 — retires "progressive"
    from the image contract): the Spark side writes genuine SOF2
    multi-scan files (DC successive approximation split across a
    Huffman first pass at Al=1 and a raw-bit refinement scan, then an
    AC spectral-selection scan over the 1-63 band closed with EOB
    codes) and decodes them with a general multi-scan kernel —
    per-scan (Ss, Se, Ah, Al) dispatch, cross-scan coefficient
    accumulation, the full EOBn block-run machinery, IDCT only at
    EOI. Assets are DC-only so every decoded pixel is the exact
    integer 128 + qDC (the high bits arrive in scan 1, the low bit in
    scan 2 — both engines' values agree because the arithmetic-shift
    split reconstructs qDC exactly); pytest proves a nonzero-AC
    progressive payload decodes through the same kernel. Supported
    pytest also drives AC successive-approximation REFINEMENT scans
    (correction bits, newly-significant insertions, EOB-run
    corrections) — the image contract is now fully decoded; only
    mp3-sample and video-codec decode remain stubbed."""
    docs = T(spark, sf_dir, "documents")
    assets = MM.synthesize_progressive_jpeg_assets(docs)
    return MM.decode_progressive_jpeg_features(assets).repartition(1).sortWithinPartitions("asset_id")


# --- D6-D8: streaming ---------------------------------------------------------


@query(
    "stream_tumbling_counts",
    oracle="""
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS win_start,
           event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events GROUP BY win_start, event_type
    """,
)
def d06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling windows — batch-equivalent on a bounded
    replay, so it IS oracle-checkable (1-day tumbling == date_trunc)."""
    from etl_cortex_spark.streaming.events import tumbling_counts

    return tumbling_counts(spark, sf_dir)


@query(
    "stream_sliding_counts",
    oracle="""
    WITH base AS (
      SELECT CAST(to_timestamp(floor(epoch(CAST(ts AS TIMESTAMP)) / 43200) * 43200)
                  AS TIMESTAMP) AS b
      FROM events
    )
    SELECT win_start, count(*) AS n FROM (
      SELECT unnest([b - INTERVAL 12 HOUR, b]) AS win_start FROM base
    ) GROUP BY win_start
    """,
)
def d07b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 sliding windows (1 day / 12 h): every event lands in exactly
    two windows — the oracle enumerates both via the 12h-floor."""
    from etl_cortex_spark.streaming.events import sliding_counts

    return sliding_counts(spark, sf_dir)


@query(
    "stream_session_windows",
    oracle="""
    WITH base AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT min(ts) AS sess_start, user_id, count(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def d07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 session windows, oracle-grade (round-3 verdict #3): on a
    bounded replay Spark's session assembly equals batch
    gaps-and-islands — the same rule as the b16 twin, including the
    boundary: measured empirically (tests/test_streaming_ts.py), an
    event landing EXACTLY ``gap`` after the previous one still merges
    into the session, so the island break is strict ``>``."""
    from etl_cortex_spark.streaming.events import session_windows

    return session_windows(spark, sf_dir)


@query(
    "stream_stateful_profile",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           round(sum(coalesce(value, 0)), 2) AS total_value,
           max(CAST(ts AS TIMESTAMP)) AS last_ts
    FROM events GROUP BY user_id
    """,
)
def d08b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    profile state flushed on a bounded replay == batch groupBy."""
    from etl_cortex_spark.streaming.events import stateful_user_profile

    return stateful_user_profile(spark, sf_dir)


@query(
    "stream_dedup_watermark",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM (SELECT DISTINCT ON (event_id) event_id, event_type FROM events)
    GROUP BY event_type
    """,
)
def d08(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_cortex_spark.streaming.events import dedup_within_watermark

    return dedup_within_watermark(spark, sf_dir)


# --- D9 is covered by c46_json_funcs and the flagship silver stage. ----------


@query(
    "d04_tfidf_topk",
    oracle="""
    WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
    tok AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                x -> x <> '')) AS term
      FROM corpus
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT count(*) AS n FROM corpus),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
      FROM scored
    )
    SELECT doc_id, term, tfidf FROM ranked WHERE rn <= 3
    """,
)
def d04_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 tf-idf: whitespace tokens, raw-count tf, ln(N/df) idf, top-3
    terms per document. Two shuffles (tf groupBy, df groupBy) + one
    broadcast of the 1-row corpus count; ranking uses the ROUNDED score
    so libm ULP drift between engines cannot flip tie order."""
    from pyspark.sql import Window

    from etl_cortex_spark.operators.textops import words

    corpus = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tok = corpus.select(
        "doc_id", F.explode(words(F.lower(F.col("text")))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = corpus.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )


def _tws_available() -> bool:
    """``transformWithStateInPandas`` runs a protobuf-based state
    server; gate registration on the dependency actually importing
    (this container ships a broken google.protobuf)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


if _tws_available():

    @query(
        "stream_tws_user_stats",
        oracle="""
        SELECT user_id,
               count(*) AS n_events,
               round(sum(coalesce(value, 0)), 2) AS total_value,
               round(max(value), 2) AS max_value
        FROM events GROUP BY user_id
        """,
    )
    def d08c(spark: SparkSession, sf_dir: str) -> DataFrame:
        """D8 via the Spark-4 ``transformWithStateInPandas`` API (typed
        ValueState through the processor handle) — bounded replay
        equals the batch groupBy, so it IS oracle-checkable."""
        from etl_cortex_spark.streaming.events import tws_user_value_stats

        return tws_user_value_stats(spark, sf_dir)


# --- D4+: Gopher-style quality/repetition gate --------------------------------

_GOPHER_SUM = "coalesce(list_aggregate(list_transform(ws, x -> length(x)), 'sum'), 0)"
_GOPHER_ALPHA = "len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))"
_GOPHER_SYM = r"len(regexp_extract_all(text, '#|\.\.\.'))"
_GOPHER_TOP = (
    "coalesce(list_aggregate(list_transform(list_distinct(ws), "
    "d -> len(list_filter(ws, x -> x = d))), 'max'), 0)"
)
_GOPHER_STOP = f"len(list_filter(ws, x -> list_contains([{_SW}], lower(x))))"


@query(
    "d14_gopher_quality_flags",
    oracle=rf"""
    WITH w AS (
      SELECT doc_id, text, {_WORDS} AS ws
      FROM documents WHERE doc_id % 5 = 0
    )
    SELECT doc_id,
           len(ws) AS n_words,
           round({_GOPHER_SUM} / greatest(len(ws), 1), 4) AS mean_word_len,
           round({_GOPHER_ALPHA} / greatest(len(ws), 1), 4) AS alpha_word_ratio,
           round({_GOPHER_SYM} / greatest(len(ws), 1), 4) AS symbol_word_ratio,
           round({_GOPHER_TOP} / greatest(len(ws), 1), 4) AS top_word_frac,
           {_GOPHER_STOP} AS stopword_hits,
           (len(ws) BETWEEN 5 AND 100000)
             AND ({_GOPHER_SUM} / greatest(len(ws), 1) BETWEEN 3.0 AND 10.0)
             AND ({_GOPHER_ALPHA} / greatest(len(ws), 1) >= 0.8)
             AND ({_GOPHER_SYM} / greatest(len(ws), 1) <= 0.1)
             AND ({_GOPHER_TOP} / greatest(len(ws), 1) <= 0.2)
             AND ({_GOPHER_STOP} >= 1) AS keep
    FROM w ORDER BY doc_id
    """,
)
def d14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document-quality gate (Rae et al. 2021 MassiveText
    rules, adapted thresholds): word-count bounds, mean word length,
    alphabetic-word ratio, symbol ratio, top-word repetition fraction,
    stopword presence — every signal a pure column expression
    (whole-stage codegen, zero shuffle), so the gate runs at scan
    speed on any corpus size."""
    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return docs.select(
        "doc_id",
        F.size(TX.words("text")).cast("bigint").alias("n_words"),
        F.round(TX.mean_word_length("text"), 4).alias("mean_word_len"),
        F.round(TX.alpha_word_ratio("text"), 4).alias("alpha_word_ratio"),
        F.round(TX.symbol_word_ratio("text"), 4).alias("symbol_word_ratio"),
        F.round(TX.top_word_frac("text"), 4).alias("top_word_frac"),
        TX.stopword_hits("text").alias("stopword_hits"),
        TX.gopher_pass("text").alias("keep"),
    ).repartition(1).sortWithinPartitions("doc_id")


# --- D3+: int8 embedding quantization -----------------------------------------


@query(
    "d16_embedding_quantize_int8",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             list_aggregate(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE))), 'max') / 127 AS scale,
             embedding
      FROM embeddings WHERE vec_id % 10 = 0
    ), qq AS (
      SELECT vec_id, scale,
             list_transform(embedding, x -> CAST(
                 CASE WHEN scale = 0 THEN 0
                      ELSE round(CAST(x AS DOUBLE) / scale) END AS TINYINT)) AS qvec,
             embedding
      FROM q
    )
    SELECT vec_id, round(scale, 6) AS scale,
           array_to_string(qvec, ',') AS qvec_str,
           (list_aggregate(list_transform(embedding,
               (x, i) -> pow(CAST(x AS DOUBLE) - qvec[i] * scale, 2)), 'sum')
               / greatest(len(embedding), 1)) < 1e-5 AS mse_below_tol
    FROM qq ORDER BY vec_id
    """,
)
def d16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3+: symmetric int8 quantization of the embedding column with
    per-vector scale and reconstruction MSE — the 4×-smaller storage
    format an ANN index ships at corpus scale. Pure array expressions;
    the reconstruction-error audit is emitted as a tolerance boolean
    (raw MSE ~3e-7 rounds unstably across engines at any fixed decimal)."""
    emb = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    qs = SIM.quantize_embedding(F.col("embedding"))
    v = SIM.as_double(F.col("embedding"))
    out = emb.select("vec_id", qs.getField("scale").alias("scale"),
                     qs.getField("q").alias("qvec"), v.alias("v"))
    deq = SIM.dequantize_embedding(F.col("qvec"), F.col("scale"))
    err = F.zip_with(F.col("v"), deq, lambda a, b: F.pow(a - b, F.lit(2.0)))
    return out.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.array_join(F.col("qvec"), ",").alias("qvec_str"),
        (
            (
                F.aggregate(err, F.lit(0.0), lambda acc, x: acc + x)
                / F.greatest(F.size("v"), F.lit(1))
            )
            < 1e-5
        ).alias("mse_below_tol"),
    ).repartition(1).sortWithinPartitions("vec_id")


# --- D4+: corpus-trained trigram LM quality score -----------------------------


@query(
    "d17_trigram_lm_score",
    oracle="""
    WITH docs AS (
      SELECT doc_id, lower(text) AS t FROM documents WHERE doc_id % 10 = 0
    ), tg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(length(t) - 1, 1)),
                                   i -> substr(t, i, 3))) AS tg
      FROM docs
    ), counts AS (
      SELECT tg, count(*) AS n FROM tg GROUP BY tg
    ), lm AS (
      SELECT tg, ln(n / (SELECT sum(n) FROM counts)) AS lp FROM counts
    )
    SELECT doc_id, round(avg(lp), 4) AS mean_logprob, count(*) AS n_trigrams
    FROM tg JOIN lm USING (tg)
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def d17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4+: KenLM-style quality screening with a corpus-trained
    character-trigram LM — no external model, two keyed shuffles, the
    logprob table broadcasts (vocab bounded by charset³)."""
    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    out = TX.trigram_lm_scores(docs, "doc_id", "text")
    return out.select(
        "doc_id",
        F.round("mean_logprob", 4).alias("mean_logprob"),
        "n_trigrams",
        # scored slice: local sort, no sampling re-execution
    ).repartition(1).sortWithinPartitions("doc_id")


@query(
    "stream_foreach_batch_upsert",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_id AS latest_event_id, ts AS latest_ts,
           value AS latest_value
    FROM ranked WHERE rn = 1
    """,
)
def d08d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 sink-side pattern: ``foreachBatch`` upsert into a keyed
    per-user latest-event table (idempotent per batch_id; atomic
    swap). On a bounded replay the merged table equals the batch
    keep-latest argmax — the oracle. The multi-micro-batch ordering
    and crash-replay idempotence are pinned separately in
    tests/test_streaming_latedata.py."""
    import hashlib
    import os
    import shutil
    import tempfile

    from etl_cortex_spark.streaming.events import read_events_stream
    from etl_cortex_spark.streaming.ingest import (
        foreach_batch_upsert,
        read_upsert_table,
    )

    # pid in the path (round-4 advice): two concurrent harness runs
    # over the same sf_dir must not delete each other's in-flight
    # upsert table/checkpoint
    h = f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}_{os.getpid()}"
    base = os.path.join(tempfile.gettempdir(), "etl_cortex_spark_upsert", h)
    # fresh run each call: the checkpoint identifies the source batches
    shutil.rmtree(base, ignore_errors=True)
    ev = read_events_stream(spark, sf_dir).select(
        "user_id", "event_id", "ts", "value"
    )
    q = foreach_batch_upsert(
        ev,
        table_dir=os.path.join(base, "table"),
        checkpoint_dir=os.path.join(base, "ckpt"),
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
    )
    q.awaitTermination()
    return read_upsert_table(spark, os.path.join(base, "table")).select(
        "user_id",
        F.col("event_id").alias("latest_event_id"),
        F.col("ts").alias("latest_ts"),
        F.col("value").alias("latest_value"),
    )


@query(
    "stream_snapshot_ingest",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(sum(value), 2) AS total_value
    FROM events
    """,
)
def d08e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming APPEND-ONLY ingest into the D102 manifest snapshot
    table (round 13 — `streaming.ingest.foreach_batch_snapshot`): the
    events stream commits one snapshot version per micro-batch, each
    manifest tagged with its batch_id so crash-replays are lookup
    no-ops (pinned in tests/test_layout.py), and the final read
    resolves the LATEST manifest — which must contain exactly every
    event once, independent of where the engine cut the micro-batches
    (append is additive; the oracle is the plain batch aggregate).
    This is the streaming-writes-while-training-reads posture of a
    100 TB corpus store: ingest keeps committing versions while any
    reader stays pinned to the snapshot it resolved."""
    import hashlib
    import os
    import shutil
    import tempfile

    from etl_cortex_spark.operators.layout import snapshot_read
    from etl_cortex_spark.streaming.events import read_events_stream
    from etl_cortex_spark.streaming.ingest import foreach_batch_snapshot

    h = f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}_{os.getpid()}"
    base = os.path.join(tempfile.gettempdir(), "etl_cortex_spark_snapstream", h)
    shutil.rmtree(base, ignore_errors=True)
    ev = read_events_stream(spark, sf_dir).select("user_id", "event_id", "value")
    q = foreach_batch_snapshot(
        ev,
        path=os.path.join(base, "table"),
        checkpoint_dir=os.path.join(base, "ckpt"),
    )
    q.awaitTermination()
    return (
        snapshot_read(spark, os.path.join(base, "table"))
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "stream_snapshot_wap",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(sum(value), 2) AS total_value
    FROM events
    """,
)
def d08wap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING WRITE-AUDIT-PUBLISH (round 16 —
    `streaming.ingest.foreach_batch_wap`, composing the round-15 WAP
    protocol with the exactly-once micro-batch ledger): every events
    micro-batch stages on its own branch, the audit (no NULL user_id,
    no absurd value) validates the rows READ BACK from the staged
    files, and the batch publishes atomically — then a DETERMINISTIC
    poisoned batch (value = −9.9e9, a synthetic batch_id outside the
    stream's range) flows through the same commit path and is audited
    OUT: discarded without trace, nothing at head, no orphan files.
    The audit holds for every real event, so the published head equals
    the full corpus NO MATTER where the engine cut the micro-batches —
    which is what makes the plain batch aggregate a full-strength
    oracle: a hash match proves zero audited-out rows reached head.
    Replay no-ops and publish-conflict restaging are pinned in
    tests/test_streaming_ts.py. At 100 TB this is the quality gate
    running INSIDE ingest instead of as mop-up deletes after bad data
    already served readers."""
    import hashlib
    import os
    import shutil
    import tempfile

    from etl_cortex_spark.operators.layout import snapshot_read
    from etl_cortex_spark.streaming.events import read_events_stream
    from etl_cortex_spark.streaming.ingest import (
        foreach_batch_wap,
        wap_commit_batch,
    )

    h = f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}_{os.getpid()}"
    base = os.path.join(tempfile.gettempdir(), "etl_cortex_spark_snapwap", h)
    shutil.rmtree(base, ignore_errors=True)
    table = os.path.join(base, "table")

    def audit(staged: DataFrame) -> bool:
        return staged.filter(
            F.col("user_id").isNull() | (F.col("value") < -1e8)
        ).isEmpty()

    ev = read_events_stream(spark, sf_dir).select("user_id", "event_id", "value")
    q = foreach_batch_wap(
        ev, path=table, checkpoint_dir=os.path.join(base, "ckpt"), audit=audit
    )
    q.awaitTermination()
    poison = (
        T(spark, sf_dir, "events")
        .limit(5)
        .select(
            "user_id",
            (F.col("event_id") + 90_000_000).alias("event_id"),
            F.lit(-9.9e9).alias("value"),
        )
    )
    outcome = wap_commit_batch(
        spark, poison, table, batch_id=10**9, audit=audit
    )
    assert outcome == "discarded", outcome
    return (
        snapshot_read(spark, table)
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "d02_prefix_probe_pairs",
    oracle=f"""
    WITH newb AS (
      SELECT doc_id + 20000000 AS doc_id, 'mutated ' || text AS text
      FROM documents WHERE doc_id % 20 = 0
    ),
    ne AS (SELECT doc_id, {_shingles_sql(3)} AS sh FROM newb),
    ex AS (SELECT doc_id, {_shingles_sql(3)} AS sh FROM documents)
    SELECT ne.doc_id AS new_id, ex.doc_id AS existing_id,
           round(len(list_intersect(ne.sh, ex.sh)) /
                 greatest(len(ne.sh) + len(ex.sh) - len(list_intersect(ne.sh, ex.sh)), 1), 6)
             AS jaccard
    FROM ne, ex
    WHERE round(len(list_intersect(ne.sh, ex.sh)) /
                greatest(len(ne.sh) + len(ex.sh) - len(list_intersect(ne.sh, ex.sh)), 1), 6)
          >= 0.5
    ORDER BY new_id, existing_id
    """,
)
def d02pp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The d02 probe with a DETERMINISTIC verified core (round-5
    verdict #5): prefix-filter candidate generation
    (dedup.prefix_filter_probe, the AllPairs/PPJoin bound) has
    guaranteed 100% recall for pairs ≥ threshold, so — unlike the
    banded-LSH probe, whose candidate set is engine-specific and
    probabilistically lossy (measured: 7 of 277 pairs missed at
    sf0.1) — the output equals the exact bipartite pair set and the
    DuckDB string-gram twin is a full-strength oracle. Same ingest
    shape as d02_incremental_lsh_probe: a new batch of mutated copies
    of every 20th doc probed against the whole existing corpus.

    Trailing sort (round 11, interleaved A/B at sf0.1): the output is
    batch-bounded tiny (~280 rows), so `repartition(1) +
    sortWithinPartitions` replaces the global orderBy — one hash
    exchange of the final rows instead of a range exchange plus its
    sampling job, while upstream stages keep full parallelism
    (best 0.45 s vs 0.80 s, every rep faster). NOT `coalesce(1)`:
    with no shuffle boundary it would absorb the verify join into a
    single task (measured 1.28 s — worse than the orderBy)."""
    docs = T(spark, sf_dir, "documents")
    existing = docs.select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.concat(F.lit("mutated "), F.col("text")).alias("text"),
    )
    return (
        DD.prefix_filter_probe(existing, new, threshold=0.5)
        .repartition(1)
        .sortWithinPartitions("new_id", "existing_id")
    )


@query(
    "d02_incremental_lsh_probe",
    oracle=f"""
    WITH newb AS (
      SELECT doc_id + 20000000 AS doc_id, 'mutated ' || text AS text
      FROM documents WHERE doc_id % 20 = 0
    ),
    ne AS (SELECT doc_id, {_shingles_sql(3)} AS sh FROM newb),
    ex AS (SELECT doc_id, {_shingles_sql(3)} AS sh FROM documents)
    SELECT ne.doc_id AS new_id, ex.doc_id AS existing_id,
           round(len(list_intersect(ne.sh, ex.sh)) /
                 greatest(len(ne.sh) + len(ex.sh) - len(list_intersect(ne.sh, ex.sh)), 1), 6)
             AS jaccard
    FROM ne, ex
    WHERE round(len(list_intersect(ne.sh, ex.sh)) /
                greatest(len(ne.sh) + len(ex.sh) - len(list_intersect(ne.sh, ex.sh)), 1), 6)
          >= 0.5
    ORDER BY new_id, existing_id
    """,
)
def d02g(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup maintenance: a NEW ingest batch (mutated
    copies of every 20th doc, plus fresh never-seen docs) probed
    against the EXISTING corpus index — bipartite LSH, no
    corpus-wide re-pairing. Mutants must pair with their sources;
    the fresh docs must not.

    Oracle-paired since round 8 (r7 verdict #5): candidates still come
    from engine-side banded buckets (xxhash64 — not SQL-replayable),
    but every candidate is verified with the EXACT shingle jaccard, so
    the only gap vs the exact bipartite pair set is banding recall.
    Run recall-first (bands = num_hashes, i.e. one minhash per band):
    a pair at jaccard j collides in some band with prob 1-(1-j)^32, so
    a true ≥0.5 pair is missed with prob ≤ 2.4e-10 — the output IS the
    exact set, and the DuckDB string-gram twin (same SQL as
    d02_prefix_probe_pairs) is a full-strength oracle. The price of
    r=1 banding is more candidates to verify (the recall/verify-cost
    dial every production LSH exposes); candidate count stays bucketed
    — never all-pairs — and the bipartite (no new×new) contract and
    recall-vs-exact are additionally pinned in pytest."""
    docs = T(spark, sf_dir, "documents")
    existing = docs.select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.concat(F.lit("mutated "), F.col("text")).alias("text"),
    )
    return DD.minhash_lsh_probe(
        existing, new, threshold=0.5, num_hashes=32, bands=32
    ).repartition(1).sortWithinPartitions("new_id", "existing_id")


@query(
    "stream_cms_sketch",
    oracle="""
    SELECT user_id, count(*) AS exact_cnt,
           true AS overestimate_ok, true AS within_eps
    FROM events WHERE user_id BETWEEN 0 AND 9
    GROUP BY user_id ORDER BY user_id
    """,
)
def d08e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 state-side pattern: an always-on Count-Min frequency monitor
    maintained by ``foreachBatch`` (`streaming/ingest.foreach_batch_cms`)
    — each micro-batch's sketch merges into the stored ≤ depth·width-row
    state under the same versioned commit protocol as the upsert sink.
    CMS merge is associative+commutative, so the drained sketch equals
    the one-batch build (pinned in pytest), and the batch entry's
    epsilon contract transfers verbatim: per probe key the estimate
    never undercounts and lands within eps·N — flags the oracle pins
    true against exact counts it computes itself."""
    import hashlib
    import os
    import shutil
    import tempfile

    from etl_cortex_spark.operators.sketch import cms_estimate, cms_params
    from etl_cortex_spark.streaming.events import read_events_stream
    from etl_cortex_spark.streaming.ingest import (
        foreach_batch_cms,
        read_upsert_table,
    )

    eps, delta = 5e-4, 1e-2
    width, depth = cms_params(eps, delta)
    h = f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}_{os.getpid()}"
    base = os.path.join(tempfile.gettempdir(), "etl_cortex_spark_cms", h)
    shutil.rmtree(base, ignore_errors=True)
    ev = read_events_stream(spark, sf_dir).select("user_id")
    q = foreach_batch_cms(
        ev,
        table_dir=os.path.join(base, "table"),
        checkpoint_dir=os.path.join(base, "ckpt"),
        key_col="user_id",
        width=width,
        depth=depth,
    )
    q.awaitTermination()
    sketch = read_upsert_table(spark, os.path.join(base, "table"))

    events = T(spark, sf_dir, "events")
    probes = events.filter(F.col("user_id").between(0, 9))
    exact = probes.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = cms_estimate(sketch, probes.select("user_id"), "user_id", width, depth)
    n_total = events.agg(F.count(F.lit(1)).alias("__n"))
    return (
        exact.join(est, "user_id")
        .crossJoin(F.broadcast(n_total))
        .select(
            "user_id",
            "exact_cnt",
            (F.col("est") >= F.col("exact_cnt")).alias("overestimate_ok"),
            (F.col("est") <= F.col("exact_cnt") + F.lit(eps) * F.col("__n")).alias(
                "within_eps"
            ),
        )
        .orderBy("user_id")
    )


@query(
    "stream_hll_distinct",
    oracle="""
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           true AS within_5pct
    FROM events
    """,
)
def d08h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 state-side pattern, round 11 — the DISTINCT-count member of
    the always-on sketch family (CMS = frequencies, Bloom =
    membership, HLL = cardinality): ``foreach_batch_hll`` unions each
    micro-batch's Datasketches HLL into a ONE-ROW stored sketch under
    the versioned exactly-once commit protocol. HLL union is register-
    wise max — associative, commutative, idempotent — so the drained
    sketch equals the one-batch build (pinned in pytest) and estimates
    are replay-safe. Estimates are engine-specific, so the oracle-
    checkable contract is the c19/HLL-rollup epsilon pattern: the
    query computes the exact COUNT(DISTINCT) itself and emits whether
    the streamed sketch's estimate lands within 5% (lg_k=12 ⇒ σ≈1.6%,
    5% is >3σ); the oracle pins the flag. Driver-side state: none —
    the comparison is one broadcast of a 1-row sketch."""
    import hashlib
    import os
    import shutil
    import tempfile

    from etl_cortex_spark.streaming.events import read_events_stream
    from etl_cortex_spark.streaming.ingest import (
        foreach_batch_hll,
        read_upsert_table,
    )

    h = f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}_{os.getpid()}"
    base = os.path.join(tempfile.gettempdir(), "etl_cortex_spark_hll", h)
    shutil.rmtree(base, ignore_errors=True)
    ev = read_events_stream(spark, sf_dir).select("user_id")
    q = foreach_batch_hll(
        ev,
        table_dir=os.path.join(base, "table"),
        checkpoint_dir=os.path.join(base, "ckpt"),
        key_col="user_id",
        lg_k=12,
    )
    q.awaitTermination()
    sketch = read_upsert_table(spark, os.path.join(base, "table"))

    events = T(spark, sf_dir, "events")
    exact = events.agg(F.countDistinct("user_id").alias("exact_distinct"))
    est = sketch.select(F.hll_sketch_estimate("sketch").alias("est"))
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_distinct",
        (
            F.abs(F.col("est") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            <= 0.05
        ).alias("within_5pct"),
    )


@query(
    "stream_kmv_quantile",
    oracle="""
    WITH sk AS (
      SELECT value,
             row_number() OVER (
               ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
             ) AS rk
      FROM events
    )
    SELECT (list_sort(list(value)))[CAST(floor((count(*) - 1) * 0.5) AS INT) + 1]
             AS p50_value,
           CAST(count(*) AS BIGINT) AS sample_size
    FROM sk WHERE rk <= 64
    """,
)
def d08k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 state-side pattern, round 11 — the QUANTILE member closes
    the sketch×streaming matrix (CMS/Bloom/HLL/KMV all maintained by
    the same versioned exactly-once protocol): ``foreach_batch_kmv``
    re-ranks each micro-batch's bottom-64 md5-priority sample into the
    stored ≤64-row state. Unlike the probabilistic members this one is
    FULLY hash-exact: the sample is a deterministic function of the
    keys, so the oracle replays the identical bottom-64 selection and
    discrete median in SQL — no epsilon gate. The emitted p50 is an
    actual data point (bit-portable double); sample_size pins that the
    drained state is the full k."""
    import hashlib
    import os
    import shutil
    import tempfile

    from etl_cortex_spark.operators.sketch import bottomk_quantile
    from etl_cortex_spark.streaming.events import read_events_stream
    from etl_cortex_spark.streaming.ingest import (
        foreach_batch_kmv,
        read_upsert_table,
    )

    h = f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}_{os.getpid()}"
    base = os.path.join(tempfile.gettempdir(), "etl_cortex_spark_kmv", h)
    shutil.rmtree(base, ignore_errors=True)
    ev = read_events_stream(spark, sf_dir).select("event_id", "value")
    q = foreach_batch_kmv(
        ev,
        table_dir=os.path.join(base, "table"),
        checkpoint_dir=os.path.join(base, "ckpt"),
        value_col="value",
        key_col="event_id",
        k=64,
    )
    q.awaitTermination()
    sketch = read_upsert_table(spark, os.path.join(base, "table"))
    return bottomk_quantile(sketch, ["__g"], "value", 0.5).select(
        "p50_value", "sample_size"
    )


@query(
    "d87_incremental_exact_dedup",
    oracle="""
    WITH newb AS (
      SELECT doc_id + 30000000 AS doc_id, text
      FROM documents WHERE doc_id % 30 = 0
      UNION ALL
      SELECT doc_id + 20000000, 'fresh ' || text
      FROM documents WHERE doc_id % 20 = 0
      UNION ALL
      SELECT doc_id + 40000000, 'fresh ' || text
      FROM documents WHERE doc_id % 40 = 0
    ),
    seen AS (SELECT DISTINCT sha256(text) AS digest FROM documents),
    batch_first AS (
      SELECT sha256(text) AS digest, min(doc_id) AS doc_id
      FROM newb GROUP BY sha256(text)
    )
    SELECT doc_id, digest FROM batch_first
    WHERE digest NOT IN (SELECT digest FROM seen)
    ORDER BY doc_id
    """,
)
def d87(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental EXACT dedup (dedup.incremental_exact_dedup) — the
    per-batch maintenance path of D1, completing the probe family
    (exact here, LSH in d59, prefix-filter in D59b): verbatim copies
    of every 30th doc must be dropped against the existing digest
    index, 'fresh '-prefixed copies of every 20th doc survive, and the
    %40 slice seeds IN-batch duplicates of those (same fresh text, two
    new ids) where only the min id survives. The existing side reduces
    to distinct digests — the persisted dedup index at scale."""
    docs = T(spark, sf_dir, "documents")
    new = (
        docs.filter(F.col("doc_id") % 30 == 0)
        .select((F.col("doc_id") + 30_000_000).alias("doc_id"), "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 20 == 0).select(
                (F.col("doc_id") + 20_000_000).alias("doc_id"),
                F.concat(F.lit("fresh "), F.col("text")).alias("text"),
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 40 == 0).select(
                (F.col("doc_id") + 40_000_000).alias("doc_id"),
                F.concat(F.lit("fresh "), F.col("text")).alias("text"),
            )
        )
    )
    return DD.incremental_exact_dedup(docs, new).orderBy("doc_id")


@query(
    "d88_distinctive_terms",
    oracle=f"""
    WITH gt AS (
      SELECT source, unnest({_WORDS}) AS term
      FROM documents
    ),
    cnts AS (SELECT source, term, count(*) AS cnt FROM gt GROUP BY source, term),
    g_tot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS g_tot FROM cnts GROUP BY source),
    t_tot AS (SELECT term, CAST(sum(cnt) AS BIGINT) AS t_tot FROM cnts GROUP BY term),
    c_tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS c_tot FROM cnts),
    lifted AS (
      SELECT c.source, c.term, c.cnt,
             (c.cnt / g_tot.g_tot) / (t_tot.t_tot / c_tot.c_tot) AS lift
      FROM cnts c JOIN g_tot USING (source) JOIN t_tot USING (term) CROSS JOIN c_tot
      WHERE c.cnt >= 5
    ),
    ranked AS (
      SELECT source, term, cnt, lift,
             CAST(row_number() OVER (PARTITION BY source ORDER BY lift DESC, term)
                  AS INT) AS rank
      FROM lifted
    )
    SELECT source, term, cnt, lift, rank FROM ranked WHERE rank <= 5
    ORDER BY source, rank
    """,
)
def d88(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinctive vocabulary (textops.distinctive_terms) —
    the log-free core of c-TF-IDF: lift = in-group term share over
    corpus term share, top-5 per source. Counts are exact integers;
    lift is a quotient of two IEEE divisions emitted UNROUNDED (a
    round() would be the one cross-engine divergence). Corpus totals
    derive FROM the group counts — one scan; the top-k rank window is
    per-source (WindowGroupLimit)."""
    docs = T(spark, sf_dir, "documents")
    return TX.distinctive_terms(docs, "source", "text", k=5, min_count=5).orderBy(
        "source", "rank"
    )


@query(
    "d89_winnowing_fingerprints",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             list_transform(
               list_transform(range(1, greatest(len({_WORDS}) - 1, 2)),
                              i -> array_to_string(array_slice({_WORDS}, i, i + 2), ' ')),
               g -> substr(md5(g), 1, 16)) AS hashes
      FROM documents WHERE doc_id % 10 = 0
    ),
    sel AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(hashes) - 2, 2)),
               i -> list_min(array_slice(hashes, i, i + 3)))) AS fps
      FROM h
    )
    SELECT DISTINCT doc_id, unnest(fps) AS fingerprint
    FROM sel ORDER BY doc_id, fingerprint
    """,
)
def d89(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (textops.winnowing_fingerprints — the
    MOSS algorithm, Schleimer et al. SIGMOD 2003): window-minimum
    selection over the k-gram hash sequence guarantees any shared run
    of >= window+k-1 grams shares a fingerprint at ~2/(window+1)
    density — the bounded signature set for plagiarism/overlap
    detection. Pure HOFs per document (zero shuffles before the
    dedup); md5-prefix hashing so the oracle selects the IDENTICAL
    fingerprints."""
    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    # bounded fingerprint frame: local sort — orderBy's sampling pass
    # would re-execute the whole HOF fingerprint chain (r19)
    return TX.winnowing_fingerprints(docs, k=3, window=4).repartition(
        1
    ).sortWithinPartitions("doc_id", "fingerprint")


_D92_SUMS = ", ".join(f"sum(qv[{i}])" for i in range(1, 65))


@query(
    "d92_embedding_outliers",
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qv
      FROM embeddings
    ),
    s AS (SELECT count(*) AS n, [{_D92_SUMS}] AS sv FROM q),
    d AS (
      SELECT vec_id, s.n AS n,
             list_sum(list_transform(range(1, 65),
               i -> CAST(s.n * qv[i] - s.sv[i] AS DOUBLE)
                    * CAST(s.n * qv[i] - s.sv[i] AS DOUBLE))) AS d2
      FROM q, s
    )
    SELECT vec_id, round(sqrt(d2) / (1000.0 * n), 6) AS dist
    FROM d ORDER BY d2 DESC, vec_id LIMIT 20
    """,
)
def d92(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D92: embedding outlier audit (similarity.quantized_centroid_
    outliers) — top-20 vectors farthest from the corpus centroid, the
    hygiene pass that catches corrupt encodes before they poison an
    ANN index or a semantic-dedup pass. The centroid moments are
    integer-quantized so they are exact and summation-ORDER-FREE
    (a double avg() differs between Spark's partial aggregates and
    any single-threaded oracle in the last ULP — a cut on that noise
    is unreproducible); the distance uses the exact residual n·q−S,
    never dividing until the final display value. One moment-agg pass
    → 1-row broadcast → column-side distance → TakeOrdered: the
    vectors are never shuffled at any scale."""
    return SIM.quantized_centroid_outliers(
        T(spark, sf_dir, "embeddings"), dim=64, scale=1000, topk=20
    )


@query(
    "stream_bloom_membership",
    oracle="""
    WITH keys AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS k FROM events),
    banks AS (
      SELECT list(DISTINCT substr(md5(k), 1, 4)) AS s0,
             list(DISTINCT substr(md5(k), 9, 4)) AS s1,
             list(DISTINCT substr(md5(k), 17, 4)) AS s2
      FROM keys
    ),
    probes AS (
      SELECT CAST(user_id AS VARCHAR) AS probe_key, true AS present
      FROM (SELECT DISTINCT user_id FROM events WHERE user_id BETWEEN 0 AND 9)
      UNION ALL
      SELECT CAST(x AS VARCHAR), false FROM range(9000001, 9000011) t(x)
    )
    SELECT probe_key, present,
           (list_contains(b.s0, substr(md5(probe_key), 1, 4)) AND
            list_contains(b.s1, substr(md5(probe_key), 9, 4)) AND
            list_contains(b.s2, substr(md5(probe_key), 17, 4))) AS might_contain
    FROM probes, banks b
    ORDER BY probe_key
    """,
)
def d08f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 state-side pattern, membership member: an always-on Bloom
    seen-set maintained by ``foreachBatch``
    (`streaming/ingest.foreach_batch_bloom`) — each micro-batch's keys
    OR into the stored 3·65536-bit bitset under the same versioned
    commit protocol as the upsert/CMS sinks. OR is associative,
    commutative AND idempotent, so the drained filter equals the
    one-batch build (pinned in pytest) and crash-replay cannot even
    double-count. Probes: every streamed user id must test positive
    (zero false negatives — the hard guarantee), and ten never-seen
    ids get whatever the deterministic md5 arithmetic says — the
    oracle replays the membership bit-for-bit on BOTH probe classes,
    so false-positive behavior is verified too, not just assumed
    rare. This is the seen-set of a 100 TB ingest (first-seen
    detection, dedup gating, decontamination): constant state, O(1)
    probes, no join."""
    import hashlib
    import os
    import shutil
    import tempfile

    from etl_cortex_spark.operators.sketch import bloom_might_contain
    from etl_cortex_spark.streaming.events import read_events_stream
    from etl_cortex_spark.streaming.ingest import (
        foreach_batch_bloom,
        read_upsert_table,
    )

    h = f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}_{os.getpid()}"
    base = os.path.join(tempfile.gettempdir(), "etl_cortex_spark_bloomstream", h)
    shutil.rmtree(base, ignore_errors=True)
    ev = read_events_stream(spark, sf_dir).select(
        F.col("user_id").cast("string").alias("uid")
    )
    q = foreach_batch_bloom(
        ev,
        table_dir=os.path.join(base, "table"),
        checkpoint_dir=os.path.join(base, "ckpt"),
        key_col="uid",
    )
    q.awaitTermination()
    filt = read_upsert_table(spark, os.path.join(base, "table"))

    events = T(spark, sf_dir, "events")
    present = (
        events.filter(F.col("user_id").between(0, 9))
        .select(F.col("user_id").cast("string").alias("probe_key"))
        .distinct()
        .withColumn("present", F.lit(True))
    )
    absent = spark.range(9_000_001, 9_000_011).select(
        F.col("id").cast("string").alias("probe_key"), F.lit(False).alias("present")
    )
    return (
        present.unionByName(absent)
        .crossJoin(F.broadcast(filt))
        .select(
            "probe_key",
            "present",
            bloom_might_contain(F.col("probe_key")).alias("might_contain"),
        )
        .orderBy("probe_key")
    )


@query(
    "d110_warc_ingest",
    oracle="""
    SELECT doc_id AS asset_id,
           'http://example.com/doc/' || doc_id AS target_uri,
           200 AS http_status,
           CAST(45 + strlen(text) AS BIGINT) AS content_length,
           md5(text) AS text_md5
    FROM documents ORDER BY asset_id
    """,
)
def d110warc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WARC/WET web-archive ingest (round 15 — the container
    every web-scale training corpus arrives in; ISO 28500 + the
    Common Crawl member-gzip layout): the Spark side builds genuine
    WARC/1.0 archives — warcinfo + response records, Content-Length
    framing, each record an independent RFC 1952 gzip member — and
    the parser walks them back with zlib multi-member decompression
    (gunzip-once readers would silently drop every record after the
    first), verified record framing, and HTTP status/header splitting.
    The response block carries each document's ACTUAL text, so the
    emitted md5 proves byte-exact text recovery against the source
    column; URI/status/length replay from closed forms. This is the
    pipeline stage upstream of every tier-D text operator — raw crawl
    bytes to (uri, text) rows — and it is embarrassingly parallel per
    shard at 100 TB (mapInPandas, the sanctioned escape hatch).
    Framing/magic/truncation violations raise loudly (pytest)."""
    docs = T(spark, sf_dir, "documents")
    assets = MM.synthesize_warc_assets(docs)
    return MM.parse_warc_responses(assets).repartition(1).sortWithinPartitions("asset_id")


@query(
    "d05_gif_decode_features",
    oracle="""
    WITH a AS (
      SELECT doc_id,
             10 + (doc_id % 4) * 5 AS w,
             8 + (doc_id % 3) * 4 AS h,
             CASE doc_id % 3 WHEN 0 THEN 4 WHEN 1 THEN 8 ELSE 16 END AS P
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, P,
             (doc_id * 7 + x.x * 3 + y.y * 5) % P AS i
      FROM a, range(0, 25) x(x), range(0, 16) y(y)
      WHERE x.x < w AND y.y < h
    )
    SELECT doc_id AS asset_id,
           CAST(max(w) AS INT) AS width,
           CAST(max(h) AS INT) AS height,
           CAST(max(w) * max(h) AS BIGINT) AS n_pixels,
           CAST(sum((doc_id * 5 + i * 11) % 256) AS DOUBLE)
             / (max(w) * max(h)) AS mean_r,
           CAST(sum((doc_id * 3 + i * 7) % 256) AS DOUBLE)
             / (max(w) * max(h)) AS mean_g,
           CAST(sum((doc_id * 7 + i * 13) % 256) AS DOUBLE)
             / (max(w) * max(h)) AS mean_b,
           CAST((doc_id * 5 + ((doc_id * 7) % P) * 11) % 256
              + (doc_id * 3 + ((doc_id * 7) % P) * 7) % 256
              + (doc_id * 7 + ((doc_id * 7) % P) * 13) % 256 AS INT)
             AS topleft_lum
    FROM px GROUP BY doc_id, P ORDER BY asset_id
    """,
)
def d05gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode (round 15 — the LZW/dictionary-coding member of
    the codec family, next to PNG's DEFLATE and JPEG's DCT entropy
    coding): the Spark side writes genuine GIF89a payloads — screen
    descriptor, global color table, a Graphic Control Extension (so
    extension SKIPPING is load-bearing), and a real variable-width
    LZW index stream (clear/EOI codes, LSB-first packing, dictionary
    growth to 12 bits) — and decodes them back with a from-scratch
    LZW decoder (`multimodal.gif_lzw_decode`, including the KwKwK
    case) plus palette mapping. Features are exact integer sums
    divided once, replayed here from the closed pixel/palette forms
    with a range join; the decoder is additionally pinned in pytest
    against the CLASSIC public 1×1 GIF byte string (a fixture this
    repo's encoder did not produce, breaking writer/reader bug
    symmetry). Interlace and local color tables raise loudly — the
    stated boundary. Per-asset Python in mapInPandas: embarrassingly
    parallel at 100 TB, the sanctioned escape hatch."""
    docs = T(spark, sf_dir, "documents")
    assets = MM.synthesize_gif_assets(docs)
    return MM.decode_gif_features(assets).repartition(1).sortWithinPartitions("asset_id")


@query(
    "d05_mp3_scalefactor_decode",
    oracle="""
    WITH fr AS (
      SELECT doc_id AS d, i
      FROM documents, range(0, 11) t(i) WHERE i < 6 + doc_id % 5
    ),
    gb AS (
      SELECT d, i, gg.g, bb.b,
             (d + 2*i + gg.g) % 16 AS sc,
             (d + 2*i) % 16 AS sc0,
             (d + i) % 16 AS scfsi
      FROM fr, range(0, 2) gg(g), range(0, 21) bb(b)
    ),
    x AS (
      SELECT *,
        CASE WHEN b <= 10
          THEN list_extract([0,0,0,0,3,1,1,1,2,2,2,3,3,3,4,4], 1 + sc)
          ELSE list_extract([0,1,2,3,0,1,2,3,1,2,3,1,2,3,2,3], 1 + sc)
        END AS slen_g,
        CASE WHEN b <= 10
          THEN list_extract([0,0,0,0,3,1,1,1,2,2,2,3,3,3,4,4], 1 + sc0)
          ELSE list_extract([0,1,2,3,0,1,2,3,1,2,3,1,2,3,2,3], 1 + sc0)
        END AS slen_0,
        CASE WHEN b <= 5 THEN 0 WHEN b <= 10 THEN 1
             WHEN b <= 15 THEN 2 ELSE 3 END AS grp
      FROM gb
    ),
    y AS (
      SELECT d, i, g, b,
        CASE WHEN g = 1 AND ((scfsi >> (3 - grp)) & 1) = 1
             THEN 1 ELSE 0 END AS reused,
        CASE WHEN g = 1 AND ((scfsi >> (3 - grp)) & 1) = 1
          THEN (3*d + 5*i + 11*b) % CAST(power(2, slen_0) AS BIGINT)
          ELSE (3*d + 5*i + 7*g + 11*b) % CAST(power(2, slen_g) AS BIGINT)
        END AS sf,
        CASE WHEN g = 1 AND ((scfsi >> (3 - grp)) & 1) = 1
             THEN 0 ELSE slen_g END AS bits,
        CASE WHEN b = 0 THEN (5*d + 7*i + 3*g) % 256 ELSE 0 END AS gg_part
      FROM x
    )
    SELECT d AS asset_id,
           CAST(count(DISTINCT i) AS INT) AS n_frames,
           CAST(sum(sf) AS BIGINT) AS sum_scalefac,
           CAST(max(sf) AS INT) AS max_scalefac,
           CAST(sum(reused) AS BIGINT) AS n_reused_bands,
           CAST(sum(bits) AS BIGINT) AS sum_part2_bits,
           CAST(0 AS BIGINT) AS sum_part3_bits,
           CAST(sum(gg_part) AS BIGINT) AS sum_global_gain
    FROM y GROUP BY d ORDER BY asset_id
    """,
)
def d05mp3scf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Layer III SCALEFACTOR (part2) decode (round 15 — the next
    boundary move after r14's side info: main data is now real bits up
    to the Huffman spectrum): genuine mono frames whose main data
    carries actual scalefactor bitstreams — slen1/slen2 from
    scalefac_compress (ISO 11172-3 2.4.2.7), 21 long-block bands per
    granule, and the scfsi REUSE rule exercised for real (granule 1
    transmits only groups with a 0 bit and CARRIES granule 0's values
    elsewhere — stateful across granules). The part2/part3 split is
    enforced at the zero boundary (part2_3_length == part2, spectrum
    silent), so the leftover Huffman bit budget sums to exactly 0 in
    both engines. After this entry the Layer III stub is precisely
    two blocks of spec-table DATA: Huffman codeword tables 3-B.7 and
    synthesis window 3-B.3 — named in `multimodal.decode_image`'s
    contract; every surrounding mechanism (framing, reservoir law,
    side info, scalefactors, budget split) is decoded and
    oracle-pinned."""
    docs = T(spark, sf_dir, "documents")
    assets = MM.synthesize_mp3_scf_assets(docs)
    return MM.decode_mp3_scalefactors(assets).repartition(1).sortWithinPartitions("asset_id")


@query(
    "d03_matryoshka_recall",
    oracle="""
    WITH q AS (SELECT vec_id AS qid,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
               FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE vec_id >= 8),
    ms(m) AS (VALUES (8), (16), (32)),
    scored AS (
      SELECT ms.m, q.qid, c.vec_id,
             round(list_dot_product(list_slice(v, 1, ms.m), list_slice(qv, 1, ms.m))
                   / (sqrt(list_dot_product(list_slice(v, 1, ms.m), list_slice(v, 1, ms.m)))
                      * sqrt(list_dot_product(list_slice(qv, 1, ms.m), list_slice(qv, 1, ms.m)))),
                   6) AS s
      FROM c, q, ms
    ),
    fscored AS (
      SELECT q.qid, c.vec_id,
             round(list_dot_product(v, qv)
                   / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
                   6) AS s
      FROM c, q
    ),
    topm AS (
      SELECT m, qid, vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY m, qid ORDER BY s DESC, vec_id) AS rn
        FROM scored) WHERE rn <= 10
    ),
    topf AS (
      SELECT qid, vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY qid ORDER BY s DESC, vec_id) AS rn
        FROM fscored) WHERE rn <= 10
    )
    SELECT m, 8 AS n_queries, CAST(count(*) AS BIGINT) AS hits,
           CAST(count(*) AS DOUBLE) / 80 AS recall_at_k
    FROM topm JOIN topf USING (qid, vec_id)
    GROUP BY m ORDER BY m
    """,
)
def d03matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATRYOSHKA TRUNCATION recall audit (round 15 —
    `similarity.matryoshka_recall_audit`): recall@10 of prefix-cosine
    retrieval at 8/16/32 of 64 dimensions vs the full-dimension exact
    top-10, over 8 query vectors — the measured basis for the
    shorten-the-vector serving knob (4× shorter = 4× less ANN I/O),
    held to the same discipline as the LSH/PQ ε-recall twins: a lossy
    path ships with its recall number or not at all. Both engines
    rank by 6dp-rounded scores with an id tiebreak over identical
    left-to-right dot folds, so the hit COUNTS are exact integers and
    this is a full hash oracle, not an ε bound. The measured recalls
    are LOW here by construction (0.12–0.36): the synthetic embeddings
    are random, and random vectors don't front-load information —
    which is precisely the finding the audit exists to surface (only
    Matryoshka-TRAINED embeddings may be served truncated; an
    untrained table fails its audit and keeps full-width serving)."""
    emb = T(spark, sf_dir, "embeddings")
    from etl_cortex_spark.operators.similarity import matryoshka_recall_audit

    return matryoshka_recall_audit(emb)


@query(
    "d05_rice_residual_decode",
    oracle="""
    WITH a AS (
      SELECT doc_id AS d, 64 + doc_id % 64 AS n, 2 + doc_id % 3 AS k
      FROM documents
    ),
    s AS (
      SELECT d, n, k, i.i, 100 + 3*i.i + ((7*d + 11*i.i) % 5) AS sv
      FROM a, range(0, 128) i(i) WHERE i.i < n
    ),
    e AS (
      SELECT d, n, k, i, sv,
             sv - 2 * lag(sv, 1) OVER w + lag(sv, 2) OVER w AS ev
      FROM s WINDOW w AS (PARTITION BY d ORDER BY i)
    ),
    u AS (
      SELECT *,
             CASE WHEN i < 2 THEN NULL
                  WHEN ev >= 0 THEN 2 * ev ELSE -2 * ev - 1 END AS uz
      FROM e
    )
    SELECT d AS asset_id,
           CAST(max(n) AS INT) AS n_samples,
           CAST(max(k) AS INT) AS k,
           CAST(sum(sv) AS BIGINT) AS sum_samples,
           CAST(max(sv) AS INT) AS max_sample,
           CAST(sum(CASE WHEN i >= 2 THEN abs(ev) ELSE 0 END) AS BIGINT)
             AS sum_abs_residual,
           CAST(max(CASE WHEN i >= 2 THEN abs(ev) END) AS INT)
             AS max_abs_residual,
           CAST(12 + (sum(CASE WHEN i >= 2 THEN (uz >> k) + 1 + k
                               ELSE 0 END) + 7) // 8 AS INT)
             AS payload_bytes
    FROM u GROUP BY d ORDER BY asset_id
    """,
)
def d05rice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Rice/Golomb residual decode + fixed-predictor
    reconstruction (round 15 — the lossless-audio core FLAC/Shorten/
    ALAC build on, `multimodal.decode_rice_audio_features`): order-2
    fixed prediction (ŝᵢ = 2sᵢ₋₁ − sᵢ₋₂, FLAC's public predictor
    family) + Rice coding of the residuals (unary quotient, k binary
    remainder bits, FLAC's zigzag sign fold), decoded bit-for-bit and
    reconstructed through the inverse recurrence — lossless coding,
    so the oracle replays EVERY sample from the closed signal form,
    the residual censuses from its second differences, and even the
    payload byte size from the Rice bit-length arithmetic
    Σ((u>>k)+1+k) — the entropy coder's cost model is part of the
    oracle, not just its output. Container framing is a minimal
    private header by design (the claim is the coding machinery;
    FLAC's container is framing, not math). Bad magic / stream
    overrun / unsupported order raise loudly (pytest)."""
    docs = T(spark, sf_dir, "documents")
    assets = MM.synthesize_rice_audio_assets(docs)
    return MM.decode_rice_audio_features(assets).repartition(1).sortWithinPartitions("asset_id")


@query(
    "stream_snapshot_upsert",
    oracle="""
    WITH fin AS (
        SELECT CAST(event_id AS BIGINT) AS k, 'final' AS status,
               value FROM events
    ), seeds AS (
        SELECT CAST(-i AS BIGINT) AS k, 'pending' AS status,
               0.0 AS value
        FROM range(1, 51) t(i)
    ), tbl AS (
        SELECT * FROM fin UNION ALL SELECT * FROM seeds
    )
    SELECT status,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT k) AS BIGINT) AS n_keys,
           round(sum(value), 2) AS total_value
    FROM tbl GROUP BY status ORDER BY status
    """,
)
def d08up(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming EXACTLY-ONCE MERGE-ON-READ UPSERT into the snapshot
    table (round 17 — `streaming.ingest.foreach_batch_merge_mor`, the
    CDC-upsert sink between D102c's append-only ingest and D132's
    WAP): the table is SEEDED with 'pending' rows — one per event key
    divisible by 7 (value 0) plus 50 synthetic negative keys no event
    will ever carry — then the events stream upserts every event as a
    'final' row keyed by its globally unique event_id. Each
    micro-batch commits through `snapshot_merge_mor(batch_id=...)`:
    batch files + one equality-delete entry scoped to pre-merge files,
    O(|batch|) per commit, manifest stamped for ledger-no-op replays.
    The drained table must hold every event exactly once as 'final'
    (seeded keys UPDATED through the anti-join, unseeded keys
    INSERTED) and exactly the 50 never-streamed seeds as 'pending' —
    independent of where the engine cut the micro-batches, because
    every streamed key arrives exactly once. The oracle replays that
    end state as plain SQL over events; the two MOR delete families'
    maintenance story (compact applies and clears) is pinned in
    tests/test_layout.py."""
    import hashlib
    import os
    import shutil
    import tempfile

    from etl_cortex_spark.operators.layout import snapshot_append, snapshot_read
    from etl_cortex_spark.streaming.events import read_events_stream
    from etl_cortex_spark.streaming.ingest import foreach_batch_merge_mor

    h = f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}_{os.getpid()}"
    base = os.path.join(tempfile.gettempdir(), "etl_cortex_spark_morup", h)
    shutil.rmtree(base, ignore_errors=True)
    path = os.path.join(base, "table")
    ev_batch = T(spark, sf_dir, "events")
    seeds = (
        ev_batch.filter(F.col("event_id") % 7 == 0)
        .select(
            F.col("event_id").cast("long").alias("k"),
            F.lit("pending").alias("status"),
            F.lit(0.0).alias("value"),
        )
        .unionByName(
            spark.range(1, 51).select(
                (-F.col("id")).cast("long").alias("k"),
                F.lit("pending").alias("status"),
                F.lit(0.0).alias("value"),
            )
        )
    )
    snapshot_append(spark, seeds, path)
    ev = read_events_stream(spark, sf_dir).select(
        F.col("event_id").cast("long").alias("k"),
        F.lit("final").alias("status"),
        F.col("value"),
    )
    q = foreach_batch_merge_mor(
        ev, path, checkpoint_dir=os.path.join(base, "ckpt"), key_cols="k"
    )
    q.awaitTermination()
    return (
        snapshot_read(spark, path)
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("k").alias("n_keys"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .coalesce(1)
        .sortWithinPartitions("status")
    )


@query(
    "d02_containment_pairs",
    oracle=f"""
    WITH q0 AS (
      SELECT doc_id,
             substring(text, 1,
                       greatest(CAST(floor(length(text) * 0.4) AS INT), 20))
               AS text
      FROM documents WHERE doc_id % 7 = 0
    ), q AS (
      SELECT doc_id, {_shingles_sql(3)} AS sh FROM q0
    ), d AS (
      SELECT doc_id, {_shingles_sql(3)} AS sh FROM documents
    )
    SELECT q.doc_id AS new_id, d.doc_id AS existing_id,
           round(len(list_intersect(q.sh, d.sh))
                 / greatest(len(q.sh), 1), 6) AS containment
    FROM q, d
    WHERE round(len(list_intersect(q.sh, d.sh))
                / greatest(len(q.sh), 1), 6) >= 0.5
    """,
)
def d02cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTAINMENT near-dup detection (round 17 —
    `dedup.prefix_filter_probe(metric="containment")`, the asymmetric
    sibling of the AllPairs Jaccard probe): |Sa∩Sb| / |Sa| ≥ t finds
    "a lives inside b" — quotes, excerpts, benchmark snippets hidden
    in crawl documents — which resemblance structurally misses (a
    short quote in a long article has Jaccard ≈ 0, containment ≈ 1).
    The fixture makes the ground truth mechanical: every 7th
    document's 40%-character PREFIX plays the quote side, probed
    against the full corpus — each quote is near-fully contained in
    its own source (the broken tail shingle keeps it just under 1.0),
    plus whatever cross-document containments the shared vocabulary
    produces. Same guaranteed-recall prefix lemma (no shared prefix
    token ⇒ |a∩b| < t·|Sa|), same persisted inverted index; the
    length filter keeps only its lower bound (the containing side may
    be arbitrarily larger — that is the point). The oracle is the
    brute-force all-pairs replay, so the hash match proves the filter
    is lossless, not just plausible."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    quotes = docs.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        F.expr(
            "substring(text, 1, greatest(CAST(floor(length(text) * 0.4) "
            "AS INT), 20))"
        ).alias("text"),
    )
    return DD.prefix_filter_probe(
        existing=docs, new=quotes, k=3, threshold=0.5, metric="containment"
    )


@query(
    "stream_snapshot_tail",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(sum(value), 2) AS total_value
    FROM events
    """,
)
def d08tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT TABLE AS A STREAMING SOURCE (round 18 —
    `layout.snapshot_tail`, the Delta readStream-on-a-table analog):
    the sinks made the snapshot table writable from a stream
    (D102c/D132/D143); this closes the other half, making it READABLE
    as one. An upstream table lands the events in three appended
    slices; a checkpointed consumer drains it in two pulls with an
    append arriving in between, committing each pull downstream via
    `snapshot_append(batch_id=to_version)` — and before acking the
    first pull, the entry REPLAYS it (the crash-before-ack path): the
    re-delivered window hits the downstream batch ledger and resolves
    to a no-op, which is exactly-once by the same composition the
    foreachBatch sinks use. Per-pull planning is O(new versions + new
    segments) driver JSON — a 100 TB table's incremental consumer
    pays for its deltas, never the table — so the drained downstream
    equals the full corpus independent of where the pulls cut the
    version history: the plain batch aggregate is the oracle, and a
    hash match proves no row was lost, doubled, or delivered twice
    across the replay."""
    import hashlib
    import os
    import shutil
    import tempfile

    from etl_cortex_spark.operators.layout import (
        snapshot_append,
        snapshot_read,
        snapshot_tail,
    )

    ev = T(spark, sf_dir, "events").select("user_id", "event_id", "value")
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    base = os.path.join(
        tempfile.gettempdir(), f"spark_graft_tail_{tag}_{os.getpid()}"
    )
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "src")
    dst = os.path.join(base, "dst")
    state = os.path.join(base, "cursor.json")
    os.makedirs(base)
    snapshot_append(spark, ev.filter(F.col("event_id") % 3 == 0), src)
    snapshot_append(spark, ev.filter(F.col("event_id") % 3 == 1), src)
    # pull 1: versions (0, 2]
    df, _, hi, ack = snapshot_tail(spark, src, state)
    snapshot_append(spark, df, dst, batch_id=hi)
    # crash-before-ack replay: same window, downstream ledger no-op
    df_r, _, hi_r, ack_r = snapshot_tail(spark, src, state)
    assert hi_r == hi
    snapshot_append(spark, df_r, dst, batch_id=hi_r)
    ack_r()
    # the third slice arrives; pull 2 delivers ONLY it
    snapshot_append(spark, ev.filter(F.col("event_id") % 3 == 2), src)
    df2, _, hi2, ack2 = snapshot_tail(spark, src, state)
    snapshot_append(spark, df2, dst, batch_id=hi2)
    ack2()
    return (
        snapshot_read(spark, dst)
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "stream_snapshot_tail_mv",
    oracle="""
    SELECT CAST(user_id % 10 AS BIGINT) AS grp,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(event_id) AS BIGINT) AS sum_eid
    FROM events
    WHERE (event_id % 7) <> 0
    GROUP BY 1
    ORDER BY grp
    """,
)
def d08tailmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUSLY MAINTAINED MATERIALIZED VIEW over a snapshot table
    (round 18 — the composition the two new primitives exist for:
    `layout.snapshot_tail_changes` → `mv.apply_cdf_to_rollup`): a
    checkpointed consumer keeps a grouped rollup current across the
    table's whole life — the seed pull materializes the head's live
    view as inserts, a later pull delivers one CDF frame spanning an
    APPEND and a merge-on-read RETRACTION (every event_id%7==0 row),
    and each pull folds into the partials with one O(|changes|+|MV|)
    signed aggregate. The measures are BIGINTs, so the partials are
    additive exactly and the maintained view equals the from-scratch
    survivors' aggregate — the oracle — independent of where the
    cursor cut the version history. At 100 TB this is the dashboard /
    feature-store refresh loop: the fact table is scanned once at
    seed time and never again; every refresh after that reads deltas
    sized by what actually changed."""
    import hashlib
    import os
    import shutil
    import tempfile

    from etl_cortex_spark.operators.layout import (
        snapshot_append,
        snapshot_delete_mor,
        snapshot_tail_changes,
    )
    from etl_cortex_spark.operators.mv import (
        apply_cdf_to_rollup,
        build_rollup,
    )

    ev = T(spark, sf_dir, "events").select(
        "event_id",
        (F.col("user_id") % 10).cast("bigint").alias("grp"),
    )
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    base = os.path.join(
        tempfile.gettempdir(), f"spark_graft_tailmv_{tag}_{os.getpid()}"
    )
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    path = os.path.join(base, "tbl")
    state = os.path.join(base, "cursor.json")
    # v1: the seed generation
    snapshot_append(spark, ev.filter(F.col("event_id") % 3 == 0), path)
    seed, _, _, ack = snapshot_tail_changes(spark, path, state)
    mv = build_rollup(seed.drop("_change_type"), ["grp"], ["event_id"])
    ack()
    # v2 append + v3 MOR retraction arrive; ONE pull folds both
    snapshot_append(spark, ev.filter(F.col("event_id") % 3 != 0), path)
    snapshot_delete_mor(spark, path, F.col("event_id") % 7 == 0, "event_id")
    pull, _, _, ack2 = snapshot_tail_changes(spark, path, state)
    mv = apply_cdf_to_rollup(mv, pull, ["grp"], ["event_id"])
    ack2()
    return (
        mv.select(
            F.col("grp"),
            F.col("__n").cast("bigint").alias("n_rows"),
            F.col("__sum_event_id").cast("bigint").alias("sum_eid"),
        )
        .coalesce(1)
        .sortWithinPartitions("grp")
    )


@query(
    "stream_snapshot_tail_across",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(event_id) AS BIGINT) AS sum_eid
    FROM events
    """,
)
def d08tailacross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TAIL ACROSS MAINTENANCE BOUNDARIES (round 19 — the r18
    verdict's #3: tail consumers did not survive a compaction; the
    refusal pointed at a MANUAL re-seed). `snapshot_tail(...,
    across_compaction=True)` now crosses `snapshot_compact` commits
    automatically: the protocol stamps them ``operation: compact``,
    and the pull drains the rows appended BEFORE the rewrite from the
    pre-compact manifests — still on disk until retention — steps
    the cursor over the boundary for zero rows, and continues after
    it. Safe even when the compact APPLIES pending MOR deletes:
    delete-set changes inside a window still refuse, so pending
    entries predate the cursor and the sequence rule scopes them to
    pre-cursor files — no undrained row is touched (pinned in
    tests/test_layout_r19.py). The fixture interleaves the adversarial schedule: two appends
    → pull 1 → append → FULL COMPACT → append → pull 2; pull 2 must
    deliver exactly the third and fourth slices (the third from
    pre-compact history, the fourth from after) — Delta's
    ignoreChanges would re-deliver the whole rewritten table there
    (caller dedups); this is the stronger exactly-the-appends
    contract. The same pull WITHOUT the flag refuses (asserted
    inline), pinning that the crossing is opt-in. Downstream commits
    stay exactly-once via `snapshot_append(batch_id=to_version)`;
    the oracle is the plain batch aggregate over everything, so the
    hash match proves no row was lost, doubled, or re-delivered
    across the rewrite."""
    import hashlib
    import os
    import shutil
    import tempfile

    from etl_cortex_spark.operators.layout import (
        snapshot_append,
        snapshot_compact,
        snapshot_read,
        snapshot_tail,
    )

    ev = T(spark, sf_dir, "events").select("user_id", "event_id")
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    base = os.path.join(
        tempfile.gettempdir(), f"spark_graft_tailx_{tag}_{os.getpid()}"
    )
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "src")
    dst = os.path.join(base, "dst")
    state = os.path.join(base, "cursor.json")
    os.makedirs(base)
    snapshot_append(spark, ev.filter(F.col("event_id") % 4 == 0), src)
    snapshot_append(spark, ev.filter(F.col("event_id") % 4 == 1), src)
    df, _, hi, ack = snapshot_tail(spark, src, state)
    snapshot_append(spark, df, dst, batch_id=hi)
    ack()
    # slice 3 lands, THEN maintenance rewrites every file, THEN slice 4
    snapshot_append(spark, ev.filter(F.col("event_id") % 4 == 2), src)
    snapshot_compact(spark, src, target_files=2)
    snapshot_append(spark, ev.filter(F.col("event_id") % 4 == 3), src)
    # without the flag the rewrite refuses — the crossing is opt-in
    try:
        snapshot_tail(spark, src, state)
        raise AssertionError("snapshot_tail must refuse a compact step")
    except ValueError:
        pass
    df2, lo2, hi2, ack2 = snapshot_tail(
        spark, src, state, across_compaction=True
    )
    snapshot_append(spark, df2, dst, batch_id=hi2)
    ack2()
    return (
        snapshot_read(spark, dst)
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("event_id").cast("bigint").alias("sum_eid"),
        )
    )
