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
