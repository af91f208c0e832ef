"""Property tests (SURVEY §5.2 item 4): algebraic invariants of the
gold transforms over adversarial generated data — duplicate keys with
distinct timestamps spread across many partitions, NULL keys, ties.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_cortex_spark.operators.gold import dedup_latest, union_all, value_counts


@pytest.fixture(scope="module")
def messy(spark):
    """200 rows over 23 keys (incl. NULL), duplicated timestamps, 16
    partitions — the layout where a nondeterministic dedup shows up."""
    df = (
        spark.range(200)
        .repartition(16)
        .select(
            F.when(F.col("id") % 23 == 0, None)
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 23).cast("string")))
            .alias("endpoint_name"),
            F.lit("alias").alias("endpoint_alias"),
            F.expr("timestamp_micros(cast(id as bigint) % 7 * 1000000)").alias(
                "last_seen"
            ),
            (F.col("id") % 13).alias("payload"),
        )
    )
    return df.cache()


def test_dedup_idempotent(messy):
    once = dedup_latest(messy)
    twice = dedup_latest(once)
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0


def test_dedup_deterministic_across_partitionings(messy):
    a = dedup_latest(messy.repartition(3)).orderBy("endpoint_name").collect()
    b = dedup_latest(messy.repartition(29)).orderBy("endpoint_name").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_dedup_keeps_max_timestamp_per_key(messy):
    out = dedup_latest(messy)
    expected_max = messy.groupBy("endpoint_name", "endpoint_alias").agg(
        F.max("last_seen").alias("last_seen")
    )
    # every surviving row carries its group's max timestamp
    assert (
        out.select("endpoint_name", "endpoint_alias", "last_seen")
        .exceptAll(expected_max)
        .count()
        == 0
    )


def test_union_count_conservation(messy, spark):
    other = spark.range(57).select(
        F.lit("x").alias("endpoint_name"),
        F.col("id").cast("string").alias("new_col"),
    )
    u = union_all([messy, other])
    assert u.count() == messy.count() + 57
    # missing columns null-fill on both sides
    assert u.columns == messy.columns + ["new_col"]


def test_value_counts_sum_to_total_and_keep_nulls(messy):
    vc = value_counts(messy, "endpoint_name")
    rows = vc.collect()
    assert sum(r["qtd"] for r in rows) == messy.count()
    assert any(r["endpoint_name"] is None for r in rows)  # dropna=False semantics
    qtds = [r["qtd"] for r in rows]
    assert qtds == sorted(qtds, reverse=True)

# --- round-2 second-wave invariants ------------------------------------------


@pytest.fixture(scope="module")
def snapshots(spark):
    """Two drifted snapshots over 300 keys: ~1/7 updated, ~1/11 deleted
    from old, ~1/13 inserted in new, scattered over 16 partitions."""
    base = spark.range(300).repartition(16)
    old = base.filter(F.col("id") % 13 != 0).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("double").alias("v"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("s"),
    )
    new = base.filter(F.col("id") % 11 != 0).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 7 == 0, (F.col("id") % 5 + 100).cast("double"))
        .otherwise((F.col("id") % 5).cast("double"))
        .alias("v"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("s"),
    )
    return old.cache(), new.cache()


def test_cdc_diff_reconstructs_new_snapshot(spark, snapshots):
    """Applying the change set to the old snapshot must reproduce the
    new snapshot exactly: old - D + I + U(new values) == new."""
    from etl_cortex_spark.operators.gold import cdc_diff

    old, new = snapshots
    diff = cdc_diff(old, new, ["k"]).cache()
    deletes = diff.filter(F.col("change_type") == "D").select("k")
    upserts = diff.filter(F.col("change_type").isin("I", "U")).select(
        "k", F.col("new_v").alias("v"), F.col("new_s").alias("s")
    )
    rebuilt = (
        old.join(deletes, "k", "left_anti")
        .join(diff.filter(F.col("change_type") == "U").select("k"), "k", "left_anti")
        .unionByName(upserts)
    )
    assert rebuilt.exceptAll(new).count() == 0
    assert new.exceptAll(rebuilt).count() == 0


def test_cdc_diff_of_identical_snapshots_is_empty(spark, snapshots):
    from etl_cortex_spark.operators.gold import cdc_diff

    old, _ = snapshots
    assert cdc_diff(old, old, ["k"]).count() == 0


def test_incremental_agg_equals_full_recompute(spark):
    """Splitting a table at ANY predicate and merging the parts'
    partials must equal the one-shot aggregate (monoid property)."""
    from etl_cortex_spark.operators.gold import incremental_agg_merge

    rows = spark.range(500).select(
        (F.col("id") % 17).alias("g"),
        (F.col("id") % 9).cast("double").alias("x"),
    )
    mk = lambda df: df.groupBy("g").agg(  # noqa: E731
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx")
    )
    for split in (2, 3, 7):
        state = mk(rows.filter(F.col("id") % split == 0))
        delta = mk(rows.filter(F.col("id") % split != 0))
        merged = incremental_agg_merge(state, delta, ["g"], count_col="n", sum_cols=["sx"])
        full = mk(rows)
        assert merged.exceptAll(full).count() == 0
        assert full.exceptAll(merged).count() == 0


def test_morton_key_monotone_per_coordinate(spark):
    """Fixing one coordinate, the Morton key must be monotone in the
    other — the property that makes z-range files axis-prunable."""
    from etl_cortex_spark.operators.layout import morton_key

    xs = spark.range(64).select(
        (F.col("id") * 1000).cast("double").alias("x"), F.lit(5000.0).alias("y")
    )
    rows = xs.select(
        "x", morton_key(F.col("x"), F.col("y"), x_range=(0.0, 64000.0), y_range=(0.0, 64000.0)).alias("z")
    ).orderBy("x").collect()
    zs = [r.z for r in rows]
    assert zs == sorted(zs)

    ys = spark.range(64).select(
        F.lit(5000.0).alias("x"), (F.col("id") * 1000).cast("double").alias("y")
    )
    rows = ys.select(
        "y", morton_key(F.col("x"), F.col("y"), x_range=(0.0, 64000.0), y_range=(0.0, 64000.0)).alias("z")
    ).orderBy("y").collect()
    zs = [r.z for r in rows]
    assert zs == sorted(zs)


def test_funnel_counts_monotone_nonincreasing(spark):
    """Later funnel steps can never have more users than earlier ones,
    whatever the event soup looks like."""
    import datetime as dt

    from pyspark.sql import types as Ty

    from etl_cortex_spark.operators.behavior import funnel_counts

    schema = Ty.StructType(
        [
            Ty.StructField("user_id", Ty.LongType()),
            Ty.StructField("event_type", Ty.StringType()),
            Ty.StructField("ts", Ty.TimestampType()),
        ]
    )
    types = ["signup", "click", "purchase"]
    rows = [
        (u, types[(u * 7 + i) % 3], dt.datetime(2024, 1, 1 + (i * 5 + u) % 25, i % 24))
        for u in range(40)
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, schema)
    out = funnel_counts(df, types).orderBy("step_idx").collect()
    counts = [r.n_users for r in out]
    assert counts == sorted(counts, reverse=True)
