"""Hashed-feature linear classifier (textops): Spark output must equal
the hand-computed reference model, and degenerate documents must score
0 deterministically.
"""

from __future__ import annotations

import hashlib

from etl_cortex_spark.operators import textops as TX


def _ref_weight(token: str) -> int:
    return int(hashlib.md5(token.lower().encode()).hexdigest()[:2], 16) - 128


def _ref_score(text: str) -> tuple[int, int, float]:
    toks = [t for t in text.split() if t]
    s = sum(_ref_weight(t) for t in toks)
    return len(toks), s, s / (128.0 * max(len(toks), 1))


def test_classifier_matches_reference_model(spark):
    texts = [
        "the quick brown fox",
        "THE Quick BROWN fox",  # case-folded weights: same feat_sum
        "one",
        "spam spam spam spam spam",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    out = {
        r["id"]: (r["n"], r["s"], r["score"])
        for r in df.select(
            "id",
            TX.n_tokens("text").alias("n"),
            TX.classifier_feat_sum("text").alias("s"),
            TX.classifier_score("text").alias("score"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert out[i] == _ref_score(t), f"mismatch on {t!r}"
    # case folding: rows 0 and 1 share feat_sum and score exactly
    assert out[0][1:] == out[1][1:]


def test_classifier_empty_and_whitespace_docs(spark):
    df = spark.createDataFrame([(0, ""), (1, "   "), (2, "\t\n")], "id int, text string")
    rows = df.select(
        TX.classifier_feat_sum("text").alias("s"),
        TX.classifier_score("text").alias("score"),
    ).collect()
    assert all(r["s"] == 0 and r["score"] == 0.0 for r in rows)


def test_weight_range_is_centered_byte(spark):
    toks = [(w,) for w in ("alpha", "beta", "gamma", "delta", "the", "zzz")]
    df = spark.createDataFrame(toks, "t string")
    vals = [
        r["w"]
        for r in df.select(TX.hashed_feature_weight(df["t"]).alias("w")).collect()
    ]
    assert all(-128 <= v <= 127 for v in vals)
    assert vals == [_ref_weight(w) for (w,) in toks]
