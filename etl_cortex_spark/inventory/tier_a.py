"""Tier A inventory — the reference's own operators (SURVEY §2 A4-A21).

The driver testdata has no Cortex-endpoint table, so each operator is
exercised on the provided tables with synthesized messiness (nulls,
junk strings, multi-valued cells built from deterministic expressions)
and an oracle that encodes the exact same semantics in DuckDB SQL.
Reference citations are on the library functions these call
(operators/cleaning.py, operators/gold.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_cortex_spark.operators import cleaning as C
from etl_cortex_spark.operators import gold as G
from etl_cortex_spark.queries import T, query


@query(
    "a04_drop_all_null_cols",
    oracle="SELECT doc_id, lang FROM documents",
)
def a04(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = T(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.expr("nullif(source, source)").alias("dead_col")
    )
    return C.drop_all_null_cols(df)


@query(
    "a05_drop_all_null_rows",
    oracle="""
    SELECT nullif(lang, 'en') AS l2, nullif(source, 'src0') AS s2
    FROM documents WHERE NOT (lang = 'en' AND source = 'src0')
    """,
)
def a05(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = T(spark, sf_dir, "documents").select(
        F.expr("nullif(lang, 'en')").alias("l2"),
        F.expr("nullif(source, 'src0')").alias("s2"),
    )
    return C.drop_all_null_rows(df)


@query(
    "a06_norm_cols",
    oracle="SELECT n_nationkey AS nation_key_id, n_name AS nation_name FROM nation",
)
def a06(spark: SparkSession, sf_dir: str) -> DataFrame:
    ugly = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("  Nation--Key (id) "),
        F.col("n_name").alias("Nation  Name!"),
    )
    return C.norm_cols(ugly)


@query(
    "a07_ts_parse_coerce",
    oracle="""
    SELECT event_id,
           CASE WHEN event_id % 10 = 0 THEN NULL
                ELSE CAST(ts AS TIMESTAMP) END AS parsed_ts
    FROM events
    """,
)
def a07(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = T(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 10 == 0, F.lit("not a date"))
        .otherwise(F.col("ts").cast("string"))
        .alias("parsed_ts"),
    )
    return C.to_ts_coerce(raw, ["parsed_ts"])


@query(
    "a08_norm_title_status",
    oracle="""
    SELECT event_id,
           upper(substr(event_type, 1, 1)) || substr(event_type, 2) AS endpoint_status
    FROM events
    """,
)
def a08(spark: SparkSession, sf_dir: str) -> DataFrame:
    messy = T(spark, sf_dir, "events").select(
        "event_id",
        F.concat(F.lit("  "), F.upper("event_type"), F.lit(" ")).alias(
            "endpoint_status"
        ),
    )
    return C.norm_status(messy)


@query(
    "a09_extract_first_ipv4",
    oracle=r"""
    SELECT event_id,
           nullif(regexp_extract(
             CASE WHEN event_id % 7 = 0 THEN 'no address here'
                  ELSE 'srv ' || user_id || ' at 10.' || (user_id % 200)
                       || '.0.' || (event_id % 250) || ', 192.168.1.1' END,
             '\b(\d{1,3}(?:\.\d{1,3}){3})\b', 1), '') AS ipv4
    FROM events
    """,
)
def a09(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = T(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 7 == 0, F.lit("no address here"))
        .otherwise(
            F.concat(
                F.lit("srv "),
                F.col("user_id"),
                F.lit(" at 10."),
                F.col("user_id") % 200,
                F.lit(".0."),
                F.col("event_id") % 250,
                F.lit(", 192.168.1.1"),
            )
        )
        .alias("ip_address"),
    )
    return C.extract_first_ipv4(df).select("event_id", "ipv4")


@query(
    "a10_extract_first_ipv6",
    oracle="""
    SELECT event_id,
           list_filter(
             list_transform(str_split(
               CASE WHEN event_id % 3 = 0 THEN 'garbage, fe80::' || event_id
                    ELSE '10.0.0.1, 10.0.0.2' END, ','), x -> trim(x)),
             x -> contains(x, ':'))[1] AS ipv6
    FROM events
    """,
)
def a10(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = T(spark, sf_dir, "events").select(
        "event_id",
        F.when(
            F.col("event_id") % 3 == 0,
            F.concat(F.lit("garbage, fe80::"), F.col("event_id")),
        )
        .otherwise(F.lit("10.0.0.1, 10.0.0.2"))
        .alias("ipv6_address"),
    )
    return C.extract_first_ipv6(df).select("event_id", "ipv6")


@query(
    "a11_union_missing_cols",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 2 = 0
    UNION ALL BY NAME
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 2 = 1
    """,
)
def a11(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_custkey") % 2 == 0).select("c_custkey", "c_name", "c_acctbal")
    b = cust.filter(F.col("c_custkey") % 2 == 1).select("c_custkey", "c_mktsegment")
    return G.union_all([a, b])


@query(
    "a13_dedup_keep_latest",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM (
      SELECT event_id, user_id, event_type, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def a13(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dedup_latest_agg (max_by over the ordering struct) rather than the
    # window form (swapped round 5): recency (ts, event_id) is a TOTAL
    # order (event_id is unique), so the aggregate provably picks the
    # oracle window's survivor while the exchange carries one map-side
    # candidate per key per partition instead of every row. The window
    # twin stays available as G.dedup_latest (parity pinned in
    # tests/test_gold.py).
    ev = T(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    out = G.dedup_latest_agg(
        ev, keys=("user_id", "event_type"), recency_cols=("ts", "event_id")
    )
    return out.select("event_id", "user_id", "event_type", "value")


@query(
    "a14_full_row_distinct",
    oracle="SELECT DISTINCT lang, source FROM documents",
)
def a14(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T(spark, sf_dir, "documents").select("lang", "source").dropDuplicates()


@query(
    "a15_value_counts",
    oracle="""
    SELECT o_orderpriority, count(*) AS qtd FROM orders
    GROUP BY o_orderpriority ORDER BY qtd DESC, o_orderpriority
    """,
)
def a15(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.value_counts(T(spark, sf_dir, "orders"), "o_orderpriority")


@query(
    "a16_keyword_flag_filter",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE regexp_matches(lower(text), 'slow|merge')
    """,
)
def a16(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    return G.filter_failures(docs, cols=("text", "absent_col"), pattern="slow|merge").select(
        "doc_id", "lang"
    )


@query("a19_row_count", oracle="SELECT count(*) AS n_rows FROM lineitem")
def a19(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


@query(
    "a21_head_n",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
    ORDER BY o_orderkey LIMIT 10
    """,
)
def a21(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "orders")
        .orderBy("o_orderkey")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .limit(10)
    )


@query(
    "a18_unify_gold_sheets",
    oracle="""
    WITH base AS (
      SELECT user_id AS endpoint_name, event_type AS endpoint_status
      FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    )
    SELECT endpoint_status, count(*) AS qtd FROM base
    GROUP BY endpoint_status ORDER BY qtd DESC, endpoint_status
    """,
)
def a18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unify() orchestration on an endpoint-shaped view of events."""
    ev = T(spark, sf_dir, "events").select(
        F.col("user_id").alias("endpoint_name"),
        F.col("event_type").alias("endpoint_status"),
        F.col("ts").alias("last_seen"),
        F.col("event_id"),
    )
    sheets = G.unify(ev, dedup_on=("endpoint_name", "endpoint_status"))
    return sheets["Resumo_Status"]
