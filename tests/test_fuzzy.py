"""Tests for operators/fuzzy.py — pigeonhole-banded fuzzy join."""

from __future__ import annotations

from pyspark.sql import types as Ty

from etl_cortex_spark.operators.fuzzy import best_fuzzy_match, fuzzy_join

_SCHEMA = Ty.StructType(
    [
        Ty.StructField("id", Ty.LongType()),
        Ty.StructField("key", Ty.StringType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_substitution_recall_guarantee(spark):
    """Every equal-length pair with <= max_dist substitutions must be
    found (pigeonhole: one of max_dist+1 bands is untouched)."""
    base = "abcdefghi"
    right = _df(spark, [(0, base)])
    # all 1- and 2-substitution variants at a few positions
    variants = []
    vid = 100
    for i in range(9):
        s = base[:i] + "X" + base[i + 1 :]
        variants.append((vid, s))
        vid += 1
        for j in range(i + 1, 9):
            variants.append((vid, s[:j] + "Y" + s[j + 1 :]))
            vid += 1
    left = _df(spark, variants)
    pairs = fuzzy_join(
        left, right, left_id="id", right_id="id",
        left_key="key", right_key="key", key_width=9, max_dist=2,
    )
    found = {r.l_id for r in pairs.collect()}
    assert found == {v[0] for v in variants}


def test_refine_rejects_beyond_max_dist(spark):
    left = _df(spark, [(1, "abcdefghi")])
    right = _df(spark, [(2, "abcXYZghi")])  # 3 substitutions
    pairs = fuzzy_join(
        left, right, left_id="id", right_id="id",
        left_key="key", right_key="key", key_width=9, max_dist=2,
    )
    assert pairs.count() == 0


def test_unequal_lengths_still_scored_when_banded(spark):
    """A trailing insert keeps leading bands aligned, so the pair is
    a candidate and the refine scores true levenshtein."""
    left = _df(spark, [(1, "abcdefghiZ")])
    right = _df(spark, [(2, "abcdefghi")])
    pairs = fuzzy_join(
        left, right, left_id="id", right_id="id",
        left_key="key", right_key="key", key_width=10, max_dist=2,
    ).collect()
    assert len(pairs) == 1 and pairs[0].dist == 1


def test_best_match_tiebreak_lowest_id(spark):
    left = _df(spark, [(1, "abcdefghi")])
    right = _df(
        spark,
        [(30, "abcdefghX"), (20, "abcdefgXi"), (40, "abcdefghi")],
    )
    pairs = fuzzy_join(
        left, right, left_id="id", right_id="id",
        left_key="key", right_key="key", key_width=9, max_dist=2,
    )
    best = best_fuzzy_match(pairs, left_id="l_id", right_id="r_id").collect()
    assert len(best) == 1
    assert best[0].r_id == 40 and best[0].dist == 0


def test_best_match_prefers_distance_over_id(spark):
    left = _df(spark, [(1, "abcdefghi")])
    right = _df(spark, [(5, "abcdefgXY"), (99, "abcdefghX")])
    pairs = fuzzy_join(
        left, right, left_id="id", right_id="id",
        left_key="key", right_key="key", key_width=9, max_dist=2,
    )
    best = best_fuzzy_match(pairs, left_id="l_id", right_id="r_id").collect()
    assert best[0].r_id == 99 and best[0].dist == 1
