"""Corrupt-input resilience (the 10-hour-job story at 100 TB: one bad
file must be a CHOICE between failing fast and skipping, never a
surprise).

The excel source has its own quarantine lane (sources/excel.py); for
parquet the engine exposes Spark's contract directly — these tests pin
it so the behavior is documented in-repo:

- default: a corrupt file fails the read loudly (data loss is never
  silent),
- ``spark.sql.files.ignoreCorruptFiles=true`` (scoped): the good
  files' rows survive and the bad file is skipped.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _mixed_dir(tmp_path):
    d = tmp_path / "mixed"
    d.mkdir()
    pq.write_table(
        pa.table({"x": pa.array([1, 2, 3], pa.int64())}), str(d / "good.parquet")
    )
    # a parquet-named file that is not parquet
    (d / "bad.parquet").write_bytes(b"this is not a parquet file")
    return str(d)


def test_corrupt_file_fails_loudly_by_default(spark, tmp_path):
    path = _mixed_dir(tmp_path)
    prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
    try:
        with pytest.raises(Exception, match="(?i)parquet|corrupt|magic"):
            spark.read.schema("x long").parquet(path).collect()
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)


def test_ignore_corrupt_files_keeps_good_rows(spark, tmp_path):
    path = _mixed_dir(tmp_path)
    prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        rows = sorted(
            r["x"] for r in spark.read.schema("x long").parquet(path).collect()
        )
        assert rows == [1, 2, 3]
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)


def test_python_datasource_partition_parallelism_and_determinism(spark):
    """The custom Python source must plan the requested number of
    input partitions (each executor gets an id-range slice) and
    produce the identical row set at any split count."""
    from etl_cortex_spark.sources.pyds import register, synthetic_doc

    register(spark)

    def load(splits):
        return (
            spark.read.format("synthetic_docs")
            .option("n", 60)
            .option("splits", splits)
            .load()
        )

    df8 = load(8)
    assert df8.rdd.getNumPartitions() == 8
    rows8 = sorted(tuple(r) for r in df8.collect())
    rows3 = sorted(tuple(r) for r in load(3).collect())
    assert rows8 == rows3 and len(rows8) == 60
    # spot-check the closed form against the library helper
    assert rows8[7] == synthetic_doc(7)


def test_python_stream_source_multibatch_offsets_and_replay(spark):
    """The streaming source must drain n rows across MULTIPLE
    micro-batches (offset walk), and readBetweenOffsets must replay
    any committed range byte-identically (the exactly-once recovery
    contract)."""
    import tempfile
    import time

    from etl_cortex_spark.sources.pyds import (
        make_synthetic_docs_stream_source,
        register_stream,
        synthetic_doc,
    )

    register_stream(spark)
    ckpt = tempfile.mkdtemp(prefix="pyds_stream_ck_")
    stream = (
        spark.readStream.format("synthetic_docs_stream")
        .option("n", 100)
        .option("batch", 30)
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("pyds_multibatch")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.table("pyds_multibatch").count() >= 100:
                break
            time.sleep(0.5)
        got = sorted(tuple(r) for r in spark.table("pyds_multibatch").collect())
    finally:
        q.stop()
    assert len(got) == 100, f"drained {len(got)} rows"
    assert got == [synthetic_doc(i) for i in range(100)]
    assert len(q.recentProgress) >= 2, "expected a multi-batch offset walk"
    # replay determinism: the recovery path re-reads a committed range
    reader = make_synthetic_docs_stream_source()(options={"n": 100, "batch": 30}).simpleStreamReader(None)
    replay = list(reader.readBetweenOffsets({"pos": 30}, {"pos": 60}))
    assert replay == [synthetic_doc(i) for i in range(30, 60)]


def test_snapshot_stream_source_versions_as_offsets(spark):
    """The snapshot change-feed stream: version offsets walk commits
    (a stream started at start_version=1 sees ONLY later appends), new
    commits made while the query runs arrive as new micro-batches,
    readBetweenOffsets replays a committed version range
    byte-identically from the immutable manifests, and a merge-on-read
    delete in range raises instead of double-counting."""
    import tempfile
    import time

    import pytest
    from pyspark.sql import functions as F

    from etl_cortex_spark.operators.layout import (
        snapshot_append,
        snapshot_delete_mor,
    )
    from etl_cortex_spark.sources.pyds import (
        make_snapshot_changes_stream_source,
        register_snapshot_stream,
    )

    path = tempfile.mkdtemp(prefix="snapstream_tbl_")
    snapshot_append(spark, spark.range(0, 40).withColumnRenamed("id", "k"), path)
    snapshot_append(spark, spark.range(40, 70).withColumnRenamed("id", "k"), path)

    register_snapshot_stream(spark)
    ckpt = tempfile.mkdtemp(prefix="snapstream_ck_")
    stream = (
        spark.readStream.format("snapshot_changes_stream")
        .option("path", path)
        .option("start_version", 1)  # skip the v1 snapshot
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("snapstream_multibatch")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("snapstream_multibatch").count() >= 30:
                break
            time.sleep(0.5)
        # a commit made WHILE the query runs arrives as a later batch
        snapshot_append(
            spark, spark.range(70, 90).withColumnRenamed("id", "k"), path
        )
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("snapstream_multibatch").count() >= 50:
                break
            time.sleep(0.5)
        got = sorted(r.k for r in spark.table("snapstream_multibatch").collect())
    finally:
        q.stop()
    assert got == list(range(40, 90))  # v1's rows were never delivered

    # recovery replay: deterministic bytes for a committed range
    src = make_snapshot_changes_stream_source()(options={"path": path})
    reader = src.simpleStreamReader(None)
    replay = sorted(
        k for (k,) in reader.readBetweenOffsets({"version": 2}, {"version": 3})
    )
    assert replay == list(range(70, 90))
    # offset 0 = "current snapshot first"
    full = sorted(
        k for (k,) in reader.readBetweenOffsets({"version": 0}, {"version": 3})
    )
    assert full == list(range(0, 90))
    # a MOR delete in range: the added-files walk refuses loudly
    snapshot_delete_mor(spark, path, F.col("k") < 5, "k")
    with pytest.raises(ValueError, match="not a pure append"):
        list(reader.readBetweenOffsets({"version": 3}, {"version": 4}))


def test_snapshot_stream_aligns_rows_by_name_not_position(spark):
    """Round-16 ADVICE: a later append whose parquet files store the
    SAME columns in a DIFFERENT order (two writers selecting columns
    differently), or with an ADDED column (additive evolution), must
    not silently misalign or truncate the stream's rows — records
    align to the declared schema's column NAMES. The declared schema
    is the newest head file's at reader construction (the
    _version_schema rule): pre-evolution files pad the new column with
    None, the reversed-order file's values land under their right
    names, and a reader declared BEFORE an evolution simply never
    sees the later column (the CDC fixed-schema convention)."""
    import tempfile

    from etl_cortex_spark.operators.layout import snapshot_append
    from etl_cortex_spark.sources.pyds import make_snapshot_changes_stream_source

    path = tempfile.mkdtemp(prefix="snapstream_drift_")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    snapshot_append(spark, base, path)
    # same columns, REVERSED select order — parquet stores (s, k)
    drift = spark.createDataFrame([("c", 3), ("d", 4)], "s string, k long")
    snapshot_append(spark, drift, path)
    # additive evolution: an extra column the declared schema never saw
    extra = spark.createDataFrame(
        [(5, "e", 9.9)], "k long, s string, extra double"
    )
    snapshot_append(spark, extra, path)

    src = make_snapshot_changes_stream_source()(options={"path": path})
    reader = src.simpleStreamReader(None)  # declares head schema (k,s,extra)
    got = sorted(reader.readBetweenOffsets({"version": 0}, {"version": 3}))
    assert got == [
        (1, "a", None),
        (2, "b", None),
        (3, "c", None),
        (4, "d", None),
        (5, "e", 9.9),
    ]
    # a reader declared BEFORE the evolution (column set (k, s)) reads
    # the evolved file without misalignment: extra is invisible
    from etl_cortex_spark.sources.pyds import make_snapshot_changes_stream_source as mk

    pre = mk()(options={"path": path})
    pre_reader = pre.simpleStreamReader(None)
    pre_reader.cols = ["k", "s"]  # as if constructed at version 2
    got_pre = sorted(pre_reader.readBetweenOffsets({"version": 2}, {"version": 3}))
    assert got_pre == [(5, "e")]
    # and alignment is by NAME even when parquet order is reversed
    got_rev = sorted(pre_reader.readBetweenOffsets({"version": 1}, {"version": 2}))
    assert got_rev == [(3, "c"), (4, "d")]
