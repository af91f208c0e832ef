"""Tier D extensions, round-2 second wave: chunking, lexical
retrieval, duplicated-n-gram auditing, vocabulary coverage.

These complete the LLM-data-pipeline family (SURVEY §2 D-tier /
BASELINE.json north star) beyond dedup + embedding search: the
chunk → retrieve → audit stages a pretraining corpus actually runs.
The reference app has no counterpart (its pipeline is Excel
unification); oracle SQL reproduces each operator token-for-token in
DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cortex_spark.operators import llmprep as LP
from etl_cortex_spark.operators import search as SR
from etl_cortex_spark.operators import textops as TX
from etl_cortex_spark.inventory.tier_d import _WORDS, _shingles_sql
from etl_cortex_spark.queries import T, query


# --- D18: fixed-window chunking -----------------------------------------------


@query(
    "d18_chunk_overlap",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
    s AS (
      SELECT doc_id, ws, len(ws) AS n,
             unnest(range(0, greatest(len(ws) - 16, 1), 48)) AS start
      FROM w
    )
    SELECT doc_id,
           CAST(start // 48 AS INT) AS chunk_id,
           array_to_string(ws[start + 1 : start + 64], ' ') AS chunk_text,
           CAST(least(64, n - start) AS INT) AS chunk_words
    FROM s WHERE n - start > 0
    ORDER BY doc_id, chunk_id
    """,
)
def d18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """llmprep.chunk_documents: 64-word windows, 16-word overlap,
    stride 48. Pure generator expression — zero shuffles."""
    docs = T(spark, sf_dir, "documents")
    return LP.chunk_documents(docs, size=64, overlap=16).orderBy("doc_id", "chunk_id")


# --- D19: BM25 lexical retrieval ----------------------------------------------

_BM25_TERMS = ("table", "join", "fast")


@query(
    "d19_bm25_topk",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
    dl AS (SELECT doc_id, len(ws) AS dl, ws FROM d),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, dl,
             unnest(list_filter(ws, t -> list_contains(['table','join','fast'], t))) AS term
      FROM dl
    ),
    tfc AS (SELECT doc_id, dl, term, count(*) AS tf FROM tf GROUP BY 1, 2, 3),
    dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1)
    SELECT doc_id,
           round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                     * tf * (1.2 + 1)
                     / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 3) AS bm25
    FROM tfc JOIN dfc USING (term) CROSS JOIN stats
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
)
def d19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """search.bm25_topk: ad-hoc Okapi BM25 over the corpus. Terms are
    filtered inside the scan projection (fan-out O(hits), not
    O(tokens)); df / corpus stats are tiny broadcasts; top-k is
    TakeOrderedAndProject. Tie order on the ROUNDED score + doc_id so
    libm ULP drift between engines cannot flip the frontier."""
    docs = T(spark, sf_dir, "documents")
    return SR.bm25_topk(docs, _BM25_TERMS, k=20)


# --- D20: duplicated-n-gram audit ---------------------------------------------


@query(
    "d20_dup_ngram_flags",
    oracle=f"""
    WITH sh AS (SELECT doc_id, unnest({_shingles_sql(5)}) AS gram FROM documents),
    g AS (SELECT gram, count(*) AS n_docs FROM sh GROUP BY 1)
    SELECT doc_id,
           count(*) AS n_grams,
           CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
           round(CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 4) AS dup_frac
    FROM sh JOIN g USING (gram)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def d20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-n-gram audit (the signal behind exact-substring
    training-data dedup): a 5-gram appearing in ≥2 documents is
    'duplicated'; per document emit how much of it is made of such
    grams. Two keyed shuffles (gram count, doc rollup) + one shuffle
    join on gram; at production scale the gram key would ride as
    xxhash64(gram) to keep the shuffle narrow (collision-tolerant for
    an audit metric), the string form here keeps the oracle exact."""
    sh = T(spark, sf_dir, "documents").select(
        "doc_id", F.explode(TX.shingles("text", 5)).alias("gram")
    )
    gcount = sh.groupBy("gram").agg(F.count(F.lit(1)).alias("n_docs"))
    dup = (F.col("n_docs") >= 2).cast("int")
    return (
        sh.join(gcount, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(dup).alias("n_dup_grams"),
            F.round(F.sum(dup) / F.count(F.lit(1)), 4).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


# --- D23: vocabulary coverage -------------------------------------------------


@query(
    "d23_vocab_coverage",
    oracle=f"""
    WITH tok AS (SELECT unnest({_WORDS}) AS token FROM documents),
    c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
    top AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token LIMIT 50)
    SELECT token, cnt,
           CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INT) AS rank,
           round(CAST(sum(cnt) OVER (ORDER BY cnt DESC, token
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 / (SELECT total FROM tot), 4) AS cum_frac
    FROM top ORDER BY rank
    """,
)
def d23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """search.vocab_topk: top-50 vocabulary with cumulative corpus
    coverage (the tokenizer-budget question). Count agg with map-side
    partial combine, 1-row total broadcast, window only AFTER the
    limit so the running sum orders 50 rows, never the vocabulary."""
    docs = T(spark, sf_dir, "documents")
    return SR.vocab_topk(docs, k=50)


# --- D6 extension: stream-static join -----------------------------------------


@query(
    "stream_static_join",
    oracle="""
    WITH dim AS (
      SELECT user_id,
             CASE WHEN count(*) >= 70 THEN 'high'
                  WHEN count(*) >= 60 THEN 'mid'
                  ELSE 'low' END AS tier
      FROM events GROUP BY user_id
    )
    SELECT tier, event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events e JOIN dim USING (user_id)
    GROUP BY tier, event_type
    ORDER BY tier, event_type
    """,
)
def d06_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming.stream_static_enrich: the event stream broadcast-
    joined with a batch-built per-user tier dimension, aggregated per
    (tier, event_type). Bounded replay == the batch join, so it is
    fully oracle-checkable; integer count thresholds keep the tier
    boundary engine-exact."""
    from etl_cortex_spark.streaming.events import stream_static_enrich

    return stream_static_enrich(spark, sf_dir)
