"""Tests for operators/quality.py — one-pass declarative checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as Ty

from etl_cortex_spark.operators.quality import check_rules, expect_clean

_SCHEMA = Ty.StructType(
    [
        Ty.StructField("id", Ty.LongType()),
        Ty.StructField("v", Ty.DoubleType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_counts_violations_per_rule(spark):
    df = _df(spark, [(1, 1.0), (2, 5.0), (3, None), (4, -1.0)])
    out = {
        r.rule: (r.n_rows, r.n_violations)
        for r in check_rules(
            df,
            {
                "v_nonneg": F.col("v") >= 0,
                "v_notnull": F.col("v").isNotNull(),
                "id_pos": F.col("id") > 0,
            },
        ).collect()
    }
    # NULL comparison result counts as a violation (3VL-safe)
    assert out["v_nonneg"] == (4, 2)
    assert out["v_notnull"] == (4, 1)
    assert out["id_pos"] == (4, 0)


def test_single_pass_plan(spark):
    """All rules share one aggregate — no join/union of per-rule
    subplans, and exactly one Exchange in the physical plan."""
    df = _df(spark, [(1, 1.0)])
    report = check_rules(
        df, {f"r{i}": F.col("v") > i for i in range(10)}
    )
    plan = report._jdf.queryExecution().executedPlan().toString()
    import re

    assert len(re.findall(r"\bExchange\b", plan)) <= 1
    assert "Join" not in plan and "Union" not in plan


def test_expect_clean_raises_with_detail(spark):
    df = _df(spark, [(1, -1.0)])
    with pytest.raises(ValueError, match="v_nonneg: 1"):
        expect_clean(df, {"v_nonneg": F.col("v") >= 0})


def test_expect_clean_passes(spark):
    df = _df(spark, [(1, 1.0)])
    expect_clean(df, {"v_nonneg": F.col("v") >= 0})


def test_empty_rules_rejected(spark):
    df = _df(spark, [(1, 1.0)])
    with pytest.raises(ValueError):
        check_rules(df, {})


def test_calibration_audit_bins_clamp_and_count(spark):
    """Fixed-width binning: out-of-range scores clamp into the edge
    bins, every row lands in exactly one bin, and pos_rate is the
    exact per-bin ratio."""
    from etl_cortex_spark.operators.quality import calibration_audit

    rows = [
        (-5.0, 1),   # clamps to bucket 0
        (-1.0, 0),   # bucket 0
        (-0.05, 1),  # bucket 4
        (0.05, 1),   # bucket 5
        (0.99, 0),   # bucket 9
        (7.0, 1),    # clamps to bucket 9
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    out = {
        r.bucket: (r.n, r.n_pos, r.pos_rate)
        for r in calibration_audit(df, "score", "label").collect()
    }
    assert out[0] == (2, 1, 0.5)
    assert out[4] == (1, 1, 1.0)
    assert out[5] == (1, 1, 1.0)
    assert out[9] == (2, 1, 0.5)
    assert sum(n for n, _, _ in out.values()) == len(rows)


def test_psi_drift_detects_shift_and_is_zero_on_identity(spark):
    """PSI sanity: identical distributions give ~zero total PSI; a
    shifted distribution gives a clearly positive one; every bucket row
    is present (empty buckets included) and counts are exact."""
    from pyspark.sql import functions as F

    from etl_cortex_spark.operators.quality import psi_drift

    base = spark.range(0, 1000).select((F.col("id") % 100 / 100.0).alias("v"))
    same = psi_drift(base, base, "v", n_buckets=10, lo=0.0, hi=1.0)
    rows = same.collect()
    assert len(rows) == 10
    assert abs(sum(r.psi_term for r in rows)) < 1e-9
    shifted = spark.range(0, 1000).select(
        ((F.col("id") % 100) / 100.0 * 0.5 + 0.5).alias("v")
    )
    drift = psi_drift(base, shifted, "v", n_buckets=10, lo=0.0, hi=1.0)
    assert sum(r.psi_term for r in drift.collect()) > 0.25  # act threshold


def test_lang_id_recovers_injected_language_signal(spark):
    """`llmprep.lang_id_predict` mechanism check: the shared fixture
    vocab carries no language signal (the oracle verifies the exact
    train-score-argmax arithmetic there, not accuracy), so this pins
    the classifier the other way — inject a per-language marker token
    into each document and the confusion matrix must go 100%
    diagonal: the NB profiles pick up the marker trigrams and every
    document's argmax lands on its own language."""
    from etl_cortex_spark.operators.llmprep import lang_id_predict

    langs = ["de", "en", "es", "fr", "zh"]
    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(*[F.lit(x) for x in langs]),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("lang"),
        F.concat(
            F.lit("the table row value group key data "),
            F.concat_ws(
                " ",
                F.array_repeat(
                    F.concat(
                        F.lit("qx"),
                        F.element_at(
                            F.array(*[F.lit(x) for x in langs]),
                            (F.col("id") % 5 + 1).cast("int"),
                        ),
                    ),
                    6,
                ),
            ),
        ).alias("text"),
    )
    out = lang_id_predict(docs).collect()
    assert len(out) == 5  # one cell per language — all diagonal
    assert all(r.lang == r.pred_lang for r in out)
    assert sum(r.n_docs for r in out) == 500
