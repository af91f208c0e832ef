"""Skew helpers: salted rewrites must be exactly semantics-preserving."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_cortex_spark.operators.skew import salted_agg, salted_broadcast_left


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows, 90% on one key — the pathological distribution
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
        F.col("id"),
    )


def test_salted_agg_equals_plain(spark, skewed):
    plain = (
        skewed.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .orderBy("k")
        .collect()
    )
    salted = (
        salted_agg(
            skewed,
            keys=["k"],
            aggs=[("v", "sum", "s"), ("v", "count", "n"), ("v", "min", "lo"), ("v", "max", "hi")],
            n_salts=8,
        )
        .orderBy("k")
        .collect()
    )
    assert [r.asDict() for r in plain] == [r.asDict() for r in salted]


def test_salted_agg_rejects_nonalgebraic(skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, keys=["k"], aggs=[("v", "avg", "a")])


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", 1), ("cold", 2), ("absent", 3)], "k string, tag int"
    )
    plain = skewed.join(dim, "k").groupBy("k", "tag").count().orderBy("k").collect()
    salted = (
        salted_broadcast_left(skewed, dim, on=["k"], n_salts=4)
        .groupBy("k", "tag")
        .count()
        .orderBy("k")
        .collect()
    )
    assert [r.asDict() for r in plain] == [r.asDict() for r in salted]


def test_salted_join_left_outer(spark, skewed):
    dim = spark.createDataFrame([("hot", 1)], "k string, tag int")
    plain = skewed.join(dim, "k", "left").filter(F.col("tag").isNull()).count()
    salted = (
        salted_broadcast_left(skewed, dim, on=["k"], n_salts=4, how="left")
        .filter(F.col("tag").isNull())
        .count()
    )
    assert plain == salted == 1000

# --- round 6: distributed global rank / ntile --------------------------------


def _ntile_ref(spark, df, b, order_cols):
    from pyspark.sql import Window

    return {
        r["k"]: r["nt"]
        for r in df.select(
            F.col("k"), F.ntile(b).over(Window.orderBy(*order_cols)).alias("nt")
        ).collect()
    }


def test_global_ntile_matches_windowed_ntile(spark):
    """global_ntile must equal SQL ntile bit-for-bit, including the
    uneven case (n % b != 0) where the first n%b buckets are larger."""
    from etl_cortex_spark.operators.skew import global_ntile

    for n in (7, 8, 101):
        df = spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") * 37 % 11).alias("v")
        )
        order = [F.desc("v"), F.col("k")]
        want = _ntile_ref(spark, df, 4, order)
        got = {
            r["k"]: r["q"]
            for r in global_ntile(df, 4, order, "q").collect()
        }
        assert got == want, f"n={n}"


def test_global_rank_is_total_and_partition_invariant(spark):
    from etl_cortex_spark.operators.skew import global_rank

    df = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 13 % 7).alias("v")
    )
    order = [F.col("v"), F.col("k")]
    ranked, n = global_rank(df.repartition(9), order, "r")
    rows = ranked.collect()
    assert n == 200
    assert sorted(r["r"] for r in rows) == list(range(1, 201))
    ranked2, _ = global_rank(df.repartition(1), order, "r")
    assert {(r["k"], r["r"]) for r in rows} == {
        (r["k"], r["r"]) for r in ranked2.collect()
    }


def test_global_ntile_plan_has_no_global_window(spark):
    """The whole point: every Window node in the plan must carry a
    partition spec (the __pid partition), never an empty one."""
    from etl_cortex_spark.operators.skew import global_ntile

    df = spark.range(50).select(F.col("id").alias("k"))
    plan = (
        global_ntile(df, 4, [F.col("k")], "q")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    for line in plan.splitlines():
        s = line.lstrip(" :+-")
        if s.startswith("Window "):
            import re

            groups = re.split(r"\], \[", s)
            # 3 groups = [exprs], [partition], [order] — partitioned
            assert len(groups) == 3, f"global window in plan: {s[:90]}"


def _grouped_ntile_ref(spark, df, b, group_col, order_cols):
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return {
        (r["g"], r["k"]): r["nt"]
        for r in df.select(
            F.col(group_col).alias("g"),
            F.col("k"),
            F.ntile(b).over(w).alias("nt"),
        ).collect()
    }


def test_grouped_ntile_matches_windowed_ntile_under_skew(spark):
    """grouped_ntile must equal ntile OVER (PARTITION BY g) bit-for-bit
    on a 90%-one-group distribution (the d111 hazard shape), including
    uneven group sizes (n_g % b != 0) and a group smaller than b."""
    from etl_cortex_spark.operators.skew import grouped_ntile

    df = spark.range(1_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("en"))
        .when(F.col("id") % 10 == 9, F.lit("de"))
        .otherwise(F.lit("zh"))
        .alias("g"),
        F.col("id").alias("k"),
        (F.col("id") * 37 % 101).alias("v"),
    ).union(
        # a 2-row group with b=3: ntile gives one row per bucket
        spark.createDataFrame([("xx", 10_001, 5), ("xx", 10_002, 9)], "g string, k long, v long")
    )
    order = [F.desc("v"), F.col("k")]
    want = _grouped_ntile_ref(spark, df, 3, "g", order)
    got = {
        (r["g"], r["k"]): r["q"]
        for r in grouped_ntile(df, 3, "g", order, "q").collect()
    }
    assert got == want


def test_grouped_ntile_null_group_and_partition_invariance(spark):
    from etl_cortex_spark.operators.skew import grouped_ntile

    df = spark.createDataFrame(
        [(None, 1, 3.0), (None, 2, 1.0), ("a", 3, 2.0), (None, 4, 2.0)],
        "g string, k long, v double",
    )
    order = [F.col("v"), F.col("k")]
    want = _grouped_ntile_ref(spark, df, 2, "g", order)
    for parts in (1, 7):
        got = {
            (r["g"], r["k"]): r["q"]
            for r in grouped_ntile(
                df.repartition(parts), 2, "g", order, "q"
            ).collect()
        }
        assert got == want, f"repartition({parts})"


def test_grouped_ntile_rejects_unbounded_group(spark):
    """The bounded-cardinality contract fails loudly, not silently: a
    census bigger than max_groups + n_partitions raises."""
    import pytest

    from etl_cortex_spark.operators.skew import grouped_ntile

    df = spark.range(300).select(
        F.col("id").cast("string").alias("g"), F.col("id").alias("k")
    )
    with pytest.raises(ValueError, match="bounded-cardinality"):
        grouped_ntile(df, 3, "g", [F.col("k")], "q", max_groups=10).collect()


def test_grouped_rank_guard_fires_before_driver_materializes(spark, monkeypatch):
    """Round-16 verdict #2: the cardinality guard must fail BEFORE the
    census lands on the driver. The census collect goes through
    limit(bound + 1), so a wildly unbounded group column (every row its
    own group) hands the driver at most bound + 1 rows — pinned by
    intercepting the collect and counting what actually arrived."""
    import pytest

    from etl_cortex_spark.operators.skew import grouped_rank

    # patch the CONCRETE DataFrame class (Spark 4's classic session
    # subclasses pyspark.sql.DataFrame and overrides collect)
    df_cls = type(spark.range(1))
    seen = {}
    real_collect = df_cls.collect

    def counting_collect(self):
        rows = real_collect(self)
        seen["n"] = max(seen.get("n", 0), len(rows))
        return rows

    monkeypatch.setattr(df_cls, "collect", counting_collect)
    df = spark.range(5000).select(
        F.col("id").cast("string").alias("g"), F.col("id").alias("k")
    )
    with pytest.raises(ValueError, match="bounded-cardinality"):
        grouped_rank(df, "g", [F.col("k")], max_groups=10, n_partitions=4)
    assert seen["n"] <= 10 + 4 + 1, (
        f"driver materialized {seen['n']} census rows — the guard must "
        "bound the collect itself, not just check afterwards"
    )


def test_grouped_ntile_plan_windows_are_pid_partitioned(spark):
    """The scale contract: every Window node partitions by (__pid, g) —
    a task ranks only its own range slice, so a dominant group can
    never single-task. No ntile() call appears anywhere in the plan."""
    from etl_cortex_spark.operators.skew import grouped_ntile

    df = spark.range(100).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("k")
    )
    plan = (
        grouped_ntile(df, 4, "g", [F.col("k")], "q")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "ntile(" not in plan
    import re

    for line in plan.splitlines():
        s = line.lstrip(" :+-")
        if s.startswith("Window "):
            groups = re.split(r"\], \[", s)
            assert len(groups) == 3, f"global window in plan: {s[:90]}"
            assert "__pid" in groups[1], f"window not pid-partitioned: {s[:120]}"


def test_grouped_rank_matches_windowed_row_number_under_skew(spark):
    """grouped_rank (the d85 fix) must equal row_number OVER
    (PARTITION BY g) bit-for-bit on a 90%-one-group distribution, and
    its plan must contain only __pid-partitioned windows."""
    from pyspark.sql import Window

    from etl_cortex_spark.operators.skew import grouped_rank

    df = spark.range(2_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("big")).otherwise(F.lit("small")).alias("g"),
        F.col("id").alias("k"),
        (F.col("id") * 31 % 257).alias("v"),
    )
    order = [F.desc("v"), F.col("k")]
    w = Window.partitionBy("g").orderBy(*order)
    want = {
        (r["g"], r["k"]): r["rn"]
        for r in df.select("g", "k", F.row_number().over(w).alias("rn")).collect()
    }
    got_df = grouped_rank(df, "g", order, "rn")
    got = {(r["g"], r["k"]): r["rn"] for r in got_df.collect()}
    assert got == want

    import re

    plan = got_df._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        s = line.lstrip(" :+-")
        if s.startswith("Window "):
            groups = re.split(r"\], \[", s)
            assert len(groups) == 3 and "__pid" in groups[1], s[:120]


def test_grouped_two_phase_rejects_unportable_group_dtypes(spark):
    """Round-16 review fix: float/boolean/timestamp group keys would
    silently NULL every rank (Python str() vs Spark CAST render
    mismatch) — the operators refuse them loudly instead."""
    import pytest

    from etl_cortex_spark.operators.skew import grouped_ntile, grouped_rank

    fl = spark.range(10).select(
        (F.col("id") / 3.0).alias("g"), F.col("id").alias("k")
    )
    with pytest.raises(ValueError, match="cast the column to string"):
        grouped_rank(fl, "g", [F.col("k")])
    bo = spark.range(10).select(
        (F.col("id") % 2 == 0).alias("g"), F.col("id").alias("k")
    )
    with pytest.raises(ValueError, match="cast the column to string"):
        grouped_ntile(bo, 2, "g", [F.col("k")])
