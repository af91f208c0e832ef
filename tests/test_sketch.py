"""Count-Min Sketch invariants (operators/sketch.py): never-undercount,
eps*N overestimate bound, exact merge, and cross-check against the
hand-computed model.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_cortex_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_merge,
    cms_params,
)


def _freqs(spark, pairs):
    """pairs: [(key, n_copies)] → one-row-per-occurrence DataFrame."""
    rows = [(k,) for k, n in pairs for _ in range(n)]
    return spark.createDataFrame(rows, "k bigint")


def _est_map(sketch, probes, width, depth):
    out = cms_estimate(sketch, probes, "k", width, depth)
    return {r["k"]: r["est"] for r in out.collect()}


def test_wide_sketch_is_exact_and_zero_for_unseen(spark):
    pairs = [(1, 5), (2, 3), (7, 1), (1000, 10)]
    df = _freqs(spark, pairs)
    width, depth = cms_params(0.01, 0.01)  # 272 counters/row, 19 keys: no collision
    sketch = cms_build(df, "k", width, depth)
    probes = spark.createDataFrame([(k,) for k, _ in pairs] + [(999,)], "k bigint")
    est = _est_map(sketch, probes, width, depth)
    assert est == {1: 5, 2: 3, 7: 1, 1000: 10, 999: 0}


def test_narrow_sketch_never_undercounts_and_respects_eps_bound(spark):
    # 40 distinct keys forced into width=16: collisions guaranteed.
    pairs = [(k, (k % 5) + 1) for k in range(40)]
    df = _freqs(spark, pairs)
    n_total = sum(n for _, n in pairs)
    width, depth = 16, 5
    sketch = cms_build(df, "k", width, depth)
    probes = spark.createDataFrame([(k,) for k, _ in pairs], "k bigint")
    est = _est_map(sketch, probes, width, depth)
    exact = dict(pairs)
    assert all(est[k] >= exact[k] for k in exact), "CMS undercounted"
    # the formal bound is eps=e/width with prob 1-delta; depth=5 on a
    # fixed seedless hash makes this effectively deterministic here
    eps = 2.718281828 / width
    assert all(est[k] <= exact[k] + eps * n_total for k in exact)


def test_merge_equals_rebuild(spark):
    a = _freqs(spark, [(1, 4), (2, 2), (3, 1)])
    b = _freqs(spark, [(2, 5), (3, 1), (9, 7)])
    width, depth = 32, 4
    merged = cms_merge(cms_build(a, "k", width, depth), cms_build(b, "k", width, depth))
    rebuilt = cms_build(a.unionByName(b), "k", width, depth)
    m = {(r["i"], r["bucket"]): r["cnt"] for r in merged.collect()}
    r_ = {(r["i"], r["bucket"]): r["cnt"] for r in rebuilt.collect()}
    assert m == r_


def test_sketch_size_is_bounded(spark):
    df = _freqs(spark, [(k, 3) for k in range(200)])
    width, depth = 16, 5
    sketch = cms_build(df, "k", width, depth)
    assert sketch.count() <= width * depth
    # total mass per depth row == N (counters partition the stream)
    per_row = {
        r["i"]: r["s"]
        for r in sketch.groupBy("i").agg(F.sum("cnt").alias("s")).collect()
    }
    assert set(per_row) == set(range(depth))
    assert all(v == 600 for v in per_row.values())
