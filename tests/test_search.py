"""Tests for operators/search.py (BM25, vocab coverage),
llmprep.chunk_documents (D18), and gold.merge_upsert (B17)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_cortex_spark.operators.gold import merge_upsert
from etl_cortex_spark.operators.llmprep import chunk_documents
from etl_cortex_spark.operators.search import bm25_topk, vocab_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# --- chunk_documents ----------------------------------------------------------


def test_chunk_reconstruction_no_overlap(spark):
    text = " ".join(f"w{i}" for i in range(250))
    out = (
        chunk_documents(_docs(spark, [(1, text)]), size=64, overlap=0)
        .orderBy("chunk_id")
        .collect()
    )
    rebuilt = " ".join(r.chunk_text for r in out)
    assert rebuilt == text
    assert [r.chunk_words for r in out] == [64, 64, 64, 58]


def test_chunk_overlap_stitching(spark):
    text = " ".join(f"w{i}" for i in range(100))
    out = (
        chunk_documents(_docs(spark, [(1, text)]), size=64, overlap=16)
        .orderBy("chunk_id")
        .collect()
    )
    # stride 48: starts 0 and 48; second chunk covers w48..w99
    assert [r.chunk_id for r in out] == [0, 1]
    c0, c1 = out[0].chunk_text.split(" "), out[1].chunk_text.split(" ")
    assert c0[48:] == c1[:16]  # overlap region agrees
    assert c1[-1] == "w99" and out[1].chunk_words == 52


def test_chunk_short_and_empty_docs(spark):
    out = chunk_documents(
        _docs(spark, [(1, "a b c"), (2, "   ")]), size=64, overlap=16
    ).collect()
    assert len(out) == 1  # empty doc dropped, short doc = one chunk
    assert out[0].chunk_text == "a b c" and out[0].chunk_words == 3


def test_chunk_no_pure_overlap_tail(spark):
    # 64 words exactly: one chunk, no echoed tail starting at 48
    text = " ".join(f"w{i}" for i in range(64))
    out = chunk_documents(_docs(spark, [(1, text)]), size=64, overlap=16).collect()
    assert len(out) == 1


def test_chunk_rejects_bad_config(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "x")]), size=16, overlap=16)


# --- bm25 ---------------------------------------------------------------------


def test_bm25_ranks_matching_doc_first(spark):
    docs = _docs(
        spark,
        [
            (1, "spark join join join speed"),
            (2, "pandas filter groupby sort"),
            (3, "join once in a very long document " + "pad " * 60),
        ],
    )
    out = bm25_topk(docs, ["join"], k=3).collect()
    ids = [r.doc_id for r in out]
    assert ids[0] == 1  # highest tf, short doc
    assert 2 not in ids  # no match → no score row
    assert out[0].bm25 > out[1].bm25 > 0


def test_bm25_idf_downweights_common_terms(spark):
    docs = _docs(
        spark,
        [(i, "common word") for i in range(1, 6)] + [(6, "common rare")],
    )
    out = {r.doc_id: r.bm25 for r in bm25_topk(docs, ["common", "rare"], k=6).collect()}
    # doc 6 has the rare term → strictly higher score than common-only docs
    assert out[6] > max(v for k, v in out.items() if k != 6)


# --- vocab coverage -----------------------------------------------------------


def test_vocab_topk_coverage(spark):
    docs = _docs(spark, [(1, "a a a b b c"), (2, "a b d")])
    out = vocab_topk(docs, k=3).collect()
    assert [(r.token, r.cnt, r.rank) for r in out] == [("a", 4, 1), ("b", 3, 2), ("c", 1, 3)]
    fracs = [r.cum_frac for r in out]
    assert fracs == sorted(fracs) and fracs[-1] <= 1.0
    assert fracs[0] == round(4 / 9, 4)


# --- merge_upsert -------------------------------------------------------------


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, s string, v double"
    )
    source = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k int, s string, v double"
    )
    out = {r.k: r for r in merge_upsert(target, source, ["k"]).collect()}
    assert len(out) == 4
    assert out[1].v == 10.0 and not out[1].updated and not out[1].inserted
    assert out[2].s == "B" and out[2].v == 99.0 and out[2].updated
    assert out[4].inserted and not out[4].updated and out[4].v == 40.0


def test_merge_upsert_rejects_missing_columns(spark):
    target = spark.createDataFrame([(1, 1.0)], "k int, v double")
    source = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="missing merge columns"):
        merge_upsert(target, source, ["k"])


def test_hybrid_rrf_fusion_properties(spark):
    """RRF hand-check on a tiny corpus: a doc ranked in BOTH pools
    must outscore a doc holding the same rank in only one; exact
    contributions 1/(60+rank) sum as documented."""
    from etl_cortex_spark.operators.search import hybrid_topk_rrf

    docs = spark.createDataFrame(
        [
            (1, "table join fast table"),       # strong lexical
            (2, "table join"),                  # medium lexical
            (3, "nothing relevant here"),       # no lexical hit
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),   # cosine 1.0 with query -> vec rank 1
            (2, [0.0, 1.0]),   # orthogonal -> rank 3
            (3, [0.7, 0.7]),   # rank 2
        ],
        "vec_id long, embedding array<float>",
    )
    out = hybrid_topk_rrf(docs, emb, ("table", "join", "fast"), [1.0, 0.0], k=3).collect()
    rows = {r["doc_id"]: r for r in out}
    # doc 1: lex rank 1 + vec rank 1
    assert rows[1]["lex_rank"] == 1 and rows[1]["vec_rank"] == 1
    assert abs(rows[1]["rrf"] - (1 / 61 + 1 / 61)) < 1e-15
    # doc 3 is vector-only: one contribution
    assert rows[3]["lex_rank"] is None
    assert abs(rows[3]["rrf"] - 1 / 62) < 1e-15
    # both-pool doc leads the fused order
    assert out[0]["doc_id"] == 1


def test_phrase_search_adjacency_overlap_and_validation(spark):
    """phrase_search (round 11): exact adjacency (not bag-of-words),
    OVERLAPPING occurrences each count, 3-term phrases chain, first
    position is 0-based, and a 1-token phrase raises."""
    import pytest

    from etl_cortex_spark.operators.search import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "x a b y a b z"),          # two occurrences of "a b"
            (2, "a a a"),                  # overlapping "a a": positions 0,1
            (3, "b a"),                    # reversed: no match
            (4, "a c b"),                  # gap: no match
            (5, "a b c tail"),             # 3-term phrase hit
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_occurrences"], r["first_pos"])
           for r in phrase_search(docs, "a b").collect()}
    assert got == {1: (2, 1), 5: (1, 0)}
    ov = {r["doc_id"]: (r["n_occurrences"], r["first_pos"])
          for r in phrase_search(docs, "a a").collect()}
    assert ov == {2: (2, 0)}
    tri = {r["doc_id"]: (r["n_occurrences"], r["first_pos"])
           for r in phrase_search(docs, "a b c").collect()}
    assert tri == {5: (1, 0)}
    with pytest.raises(ValueError, match="2 tokens"):
        phrase_search(docs, "solo")
