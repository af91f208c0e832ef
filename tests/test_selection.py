"""Data-selection operators (D67-D69, D71): DSIR importance selection,
per-domain cap sampling, iterative BPE trainer, perceptron training.

The BPE trainer is checked against an independent pure-Python
reference implementation of the same per-rule-pass contract — not
against its own code path."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from etl_cortex_spark.operators import llmprep as LP
from etl_cortex_spark.operators import textops as TX


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


# --- DSIR ---------------------------------------------------------------------


def test_dsir_ranks_target_like_docs_higher(spark):
    # target slice speaks only 'aa bb', raw background only 'zz yy':
    # a fresh doc made of target vocabulary must outscore one made of
    # background vocabulary.
    rows = [(i, "aa bb aa bb", "en") for i in range(10)]
    rows += [(100 + i, "zz yy zz yy", "de") for i in range(10)]
    rows += [(500, "aa bb", "de"), (501, "zz yy", "en")]
    df = _docs(spark, rows)
    w = LP.dsir_bucket_weights(df, "text", F.col("lang") == "en", 64)
    scored = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", LP.dsir_score("text", w, 64).alias("s")
        ).collect()
    }
    # doc 500 is target-vocabulary text (even though its own lang is
    # 'de' — selection scores CONTENT, not the label); 501 is
    # background text despite its 'en' label.
    assert scored[500] > scored[501]


def test_dsir_score_partition_invariant(spark):
    rows = [(i, f"tok{i % 7} tok{i % 3} filler{i % 5}", "en" if i % 2 else "de")
            for i in range(60)]
    df = _docs(spark, rows)
    w = LP.dsir_bucket_weights(df, "text", F.col("lang") == "en", 64)
    a = sorted(
        (r["doc_id"], r["s"])
        for r in df.repartition(1)
        .select("doc_id", LP.dsir_score("text", w, 64).alias("s"))
        .collect()
    )
    b = sorted(
        (r["doc_id"], r["s"])
        for r in df.repartition(13, "doc_id")
        .select("doc_id", LP.dsir_score("text", w, 64).alias("s"))
        .collect()
    )
    assert a == b
    # and the fitted weights themselves are partition-invariant
    w2 = LP.dsir_bucket_weights(
        df.repartition(13, "doc_id"), "text", F.col("lang") == "en", 64
    )
    assert w == w2


def test_dsir_weight_sign_tracks_smoothed_ratio(spark):
    # every bucket weight must be positive iff the add-one-smoothed
    # target probability exceeds the smoothed raw probability.
    rows = [(i, f"w{i % 11} w{(i * 3) % 11}", "en" if i % 3 == 0 else "fr")
            for i in range(90)]
    df = _docs(spark, rows)
    B = 64
    w = LP.dsir_bucket_weights(df, "text", F.col("lang") == "en", B)
    toks = df.select(
        (F.col("lang") == "en").cast("int").alias("t"),
        F.explode(TX.words("text")).alias("tok"),
    ).select("t", TX.md5_bucket(F.col("tok"), B).alias("b"))
    dist = {
        r["b"]: (r["raw"], r["tgt"])
        for r in toks.groupBy("b")
        .agg(F.count(F.lit(1)).alias("raw"), F.sum("t").alias("tgt"))
        .collect()
    }
    rt = sum(v[0] for v in dist.values())
    tt = sum(v[1] for v in dist.values())
    for b in range(B):
        raw, tgt = dist.get(b, (0, 0))
        p_tgt = (tgt + 1) / (tt + B)
        p_raw = (raw + 1) / (rt + B)
        if p_tgt > p_raw:
            assert w[b] > 0, b
        elif p_tgt < p_raw:
            assert w[b] < 0, b


# --- domain cap ---------------------------------------------------------------


def test_domain_cap_respects_cap_and_keeps_small_domains(spark):
    rows = [(i, "big") for i in range(40)] + [(100 + i, "small") for i in range(3)]
    df = spark.createDataFrame(rows, "k bigint, dom string")
    out = LP.domain_cap_sample(df, "dom", "k", cap=5).collect()
    by_dom = collections.Counter(r["dom"] for r in out)
    assert by_dom["big"] == 5
    assert by_dom["small"] == 3  # under-cap domains survive whole


def test_domain_cap_partition_invariant(spark):
    rows = [(i, f"d{i % 4}") for i in range(200)]
    df = spark.createDataFrame(rows, "k bigint, dom string")
    a = sorted(tuple(r) for r in LP.domain_cap_sample(df, "dom", "k", 7).collect())
    b = sorted(
        tuple(r)
        for r in LP.domain_cap_sample(df.repartition(17), "dom", "k", 7).collect()
    )
    assert a == b and len(a) == 28


def test_domain_cap_plans_as_window_group_limit(spark):
    rows = [(i, f"d{i % 4}") for i in range(50)]
    df = spark.createDataFrame(rows, "k bigint, dom string")
    plan = (
        LP.domain_cap_sample(df, "dom", "k", 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan  # map-side pruning before the shuffle


# --- BPE trainer --------------------------------------------------------------


def _ref_bpe_train(texts: list[str], n_merges: int):
    """Independent reference: same contract (distinct-word freq table,
    greedy per-rule pass, (count desc, lhs, rhs) tiebreak)."""
    vocab = collections.Counter()
    for t in texts:
        for w in t.split():
            if len(w) >= 2:
                vocab[w] += 1
    enc = {tuple(w): f for w, f in vocab.items()}
    out = []
    for step in range(1, n_merges + 1):
        pairs = collections.Counter()
        for syms, f in enc.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (lhs, rhs), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((step, lhs, rhs, cnt))
        new_enc: dict = {}
        for syms, f in enc.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    merged.append(lhs + rhs)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            key = tuple(merged)
            new_enc[key] = new_enc.get(key, 0) + f
        enc = new_enc
    return out


def test_bpe_train_matches_reference(spark):
    texts = [
        "lower lower lowest newer newer newest wider wide",
        "low lower lowest new newer newest",
        "low low low wide wider widest",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, text string")
    got = [
        (r["step"], r["lhs"], r["rhs"], r["pair_count"])
        for r in TX.bpe_train(df, "text", n_merges=6).collect()
    ]
    assert got == _ref_bpe_train(texts, 6)


def test_bpe_train_multi_level_merges_chain(spark):
    # 'aaa' x N: first merge (a,a) -> 'aa', second can be (aa,a) —
    # later rules must see earlier rules' outputs.
    df = spark.createDataFrame([(0, "aaaa aaaa aaaa")], "i int, text string")
    got = [
        (r["step"], r["lhs"], r["rhs"]) for r in TX.bpe_train(df, "text", 2).collect()
    ]
    texts = ["aaaa aaaa aaaa"]
    assert got == [(s, l, r) for s, l, r, _ in _ref_bpe_train(texts, 2)]
    assert got[1][1] in ("aa",)  # second rule consumes the first's output


# --- perceptron trainer -------------------------------------------------------


def test_perceptron_learns_separable_corpus(spark):
    # positive docs speak only 'good nice', negative only 'bad ugly':
    # after training, every doc must score on its own side.
    rows = [(i, "good nice good", "en") for i in range(20)]
    rows += [(100 + i, "bad ugly bad", "de") for i in range(20)]
    df = _docs(spark, rows)
    w = LP.perceptron_train(
        df, "doc_id", "text", F.when(F.col("lang") == "en", 1).otherwise(-1), 64, 3
    )
    def score(text):
        s = 0
        import hashlib
        for tok in text.split():
            b = int(hashlib.md5(tok.lower().encode()).hexdigest()[:2], 16) % 64
            s += w[b]
        return s
    assert score("good nice good") > 0
    assert score("bad ugly bad") < 0


def test_perceptron_weights_partition_invariant(spark):
    rows = [(i, f"w{i % 9} w{(i * 2) % 9} w{(i * 5) % 9}", "en" if i % 3 else "fr")
            for i in range(60)]
    df = _docs(spark, rows)
    lab = F.when(F.col("lang") == "en", 1).otherwise(-1)
    a = LP.perceptron_train(df.repartition(1), "doc_id", "text", lab, 64, 3)
    b = LP.perceptron_train(df.repartition(13, "doc_id"), "doc_id", "text", lab, 64, 3)
    assert a == b
