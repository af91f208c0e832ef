"""Unigram-LM (SentencePiece) EM step (round 12,
operators/textops.py:unigram_em_step): the Spark implementation must
agree bit-for-bit with an INDEPENDENT pure-Python reference — same
clean-word vocabulary, frequent-substring piece seeding, integer
ilog2-quantized costs, string-key Viterbi, and ppm renormalization —
on both a hand-built corpus and real testdata. The reference
implements the dp directly (no Spark, no SQL), so a bug shared by the
Spark fold and the DuckDB oracle's brute-force replay cannot hide."""

from __future__ import annotations

import collections
import re

from pyspark.sql import functions as F

import etl_cortex_spark.operators.textops as TX
from etl_cortex_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _reference(texts: list[str], top_multi: int, top_k: int):
    words: list[str] = []
    for t in texts:
        words += [w for w in re.split(r"\s+", t) if w]
    v = collections.Counter(
        w for w in words if re.fullmatch(r"[a-z]+", w) and 2 <= len(w) <= 10
    )
    occ: collections.Counter = collections.Counter()
    for w, wf in v.items():
        for i in range(len(w)):
            for length in (1, 2, 3):
                if i + length <= len(w):
                    occ[w[i : i + length]] += wf
    p1 = {p: f for p, f in occ.items() if len(p) == 1}
    pk = dict(
        sorted(
            ((p, f) for p, f in occ.items() if len(p) >= 2),
            key=lambda kv: (-kv[1], kv[0]),
        )[:top_multi]
    )
    cost = {p: max(41 - f.bit_length(), 0) for p, f in {**p1, **pk}.items()}

    def viterbi(w: str) -> str:
        dp = ["000000|"]
        for i in range(1, len(w) + 1):
            cands = []
            for j in (1, 2, 3):
                if i >= j:
                    prev = dp[i - j]
                    piece = w[i - j : i]
                    if prev[:6] != "999999" and piece in cost:
                        c = int(prev[:6]) + cost[piece]
                        cands.append(f"{c:06d}|" + prev[7:] + piece + ".")
            dp.append(min(cands) if cands else "999999|")
        return dp[-1]

    em: collections.Counter = collections.Counter()
    for w, wf in v.items():
        for p in viterbi(w)[7:].split("."):
            if p:
                em[p] += wf
    t = sum(em.values())
    return sorted(
        ((p, c, c * 1_000_000 // t) for p, c in em.items()),
        key=lambda x: (-x[1], x[0]),
    )[:top_k]


def test_unigram_em_matches_reference_hand_corpus(spark):
    texts = [
        "the cat sat on the mat the cat",
        "banana bandana cabana the band",
        "aa ab aa ba aa the band banana",
        "internationalization is long",  # >10 chars: excluded by the cap
        "MixedCase and punctuation! are filtered",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        tuple(r)
        for r in TX.unigram_em_step(docs, "text", top_multi=10, top_k=25).collect()
    ]
    assert got == _reference(texts, 10, 25)
    # sanity: multi-char pieces actually win where they are frequent
    assert any(len(p) > 1 for p, _, _ in got)


def test_unigram_em_matches_reference_testdata(spark):
    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 40)
    texts = [r["text"] for r in docs.select("text").collect()]
    got = [
        tuple(r)
        for r in TX.unigram_em_step(docs, "text", top_multi=20, top_k=30).collect()
    ]
    assert got == _reference(texts, 20, 30)


def test_unigram_piece_costs_cover_all_single_chars(spark):
    """Every length-1 piece of the clean vocabulary is in the
    inventory regardless of the top_multi cut — the coverage guarantee
    that makes a Viterbi dead-end impossible."""
    docs = spark.createDataFrame(
        [(1, "zq zq xv"), (2, "ab ab ab")], "doc_id long, text string"
    )
    pieces = {r["piece"] for r in TX.unigram_piece_costs(docs, "text", 1).collect()}
    assert {"z", "q", "x", "v", "a", "b"} <= pieces


def test_unigram_em_empty_vocab(spark):
    docs = spark.createDataFrame(
        [(1, "123 456 !!!"), (2, "UPPER Case")], "doc_id long, text string"
    )
    assert TX.unigram_em_step(docs, "text").count() == 0
