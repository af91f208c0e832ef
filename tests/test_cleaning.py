"""Unit tests for silver cleaning ops — the SURVEY §5.2(3) semantic-gap traps."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from etl_cortex_spark.operators import cleaning as C


def test_norm_col():
    assert C.norm_col("  Endpoint Name ") == "endpoint_name"
    assert C.norm_col("Last Upgrade Status Time") == "last_upgrade_status_time"
    assert C.norm_col("IP--Address!!") == "ip_address"
    assert C.norm_col("já__weird  Col") == "j_weird_col"


def test_norm_cols_rename(spark):
    df = spark.createDataFrame([(1, "x")], ["Endpoint Name", "IP Address"])
    assert C.norm_cols(df).columns == ["endpoint_name", "ip_address"]


def test_drop_all_null_rows_and_cols(spark):
    df = spark.createDataFrame(
        [(1, None, None), (None, None, None), (2, None, None)],
        "a long, b string, c double",
    )
    out = C.drop_all_null_cols(C.drop_all_null_rows(df))
    assert out.columns == ["a"]
    assert sorted(r.a for r in out.collect()) == [1, 2]


def test_to_ts_coerce(spark):
    df = spark.createDataFrame(
        [("2024-01-02 03:04:05",), ("not a date",), (None,)], ["last_seen"]
    )
    out = C.to_ts_coerce(df, ["last_seen", "absent_col"]).collect()
    assert out[0].last_seen == datetime.datetime(2024, 1, 2, 3, 4, 5)
    assert out[1].last_seen is None
    assert out[2].last_seen is None


def test_norm_title_matches_python_str_title(spark):
    cases = [
        "  connected ",
        "LOST",
        "Disconnected",
        "o'brien's laptop",
        "win10-PRO x64",
        "",
        "   ",
        None,
        "a1b c2d",
    ]
    df = spark.createDataFrame([(c,) for c in cases], ["endpoint_status"])
    got = [r.endpoint_status for r in C.norm_status(df).collect()]
    want = [c.strip().title() if c is not None else None for c in cases]
    assert got == want


def test_first_ipv4_null_on_miss(spark):
    df = spark.createDataFrame(
        [("junk 10.0.0.5, 192.168.1.7",), ("no ip here",), (None,), ("",)],
        ["ip_address"],
    )
    got = [r.ipv4 for r in C.extract_first_ipv4(df).collect()]
    assert got == ["10.0.0.5", None, None, None]


def test_first_ipv6(spark):
    df = spark.createDataFrame(
        [
            ("garbage, fe80::1, fe80::2",),
            ("10.0.0.1, 10.0.0.2",),
            (None,),
            ("",),
        ],
        ["ipv6_address"],
    )
    got = [r.ipv6 for r in C.extract_first_ipv6(df).collect()]
    assert got == ["fe80::1", None, None, None]


def test_keyword_flag_null_and_missing_cols(spark):
    df = spark.createDataFrame(
        [
            ("Failed", None),
            ("Success", None),
            (None, "Timed Out waiting"),
            (None, None),
            ("FAULTY disk", "x"),
        ],
        ["last_upgrade_status", "last_upgrade_failure_reason"],
    )
    pred = C.keyword_flag(df, ["last_upgrade_status", "last_upgrade_failure_reason", "absent"])
    got = [r[0] for r in df.select(pred.alias("f")).collect()]
    assert got == [True, False, True, False, True]


def test_trim_strings(spark):
    df = spark.createDataFrame([("  x  ", 1)], ["s", "n"])
    row = C.trim_strings(df).first()
    assert row.s == "x" and row.n == 1
