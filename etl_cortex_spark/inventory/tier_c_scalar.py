"""Tier C inventory (scalar function families): C41-C48 (SURVEY §2).

Each family is one projection query with several representative
functions, on a small table so driver-side collection stays cheap.
The oracle computes the same semantics; where DuckDB's function name
differs (instr→strpos, datediff→date_diff, …) the oracle uses the
DuckDB spelling — equivalence of RESULTS is the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cortex_spark.queries import T, query


@query(
    "c41_string_funcs",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS lname, upper(p_brand) AS ubrand,
           substr(p_type, 1, 5) AS type5,
           length(p_name) AS name_len,
           concat_ws('|', p_brand, p_type) AS brand_type,
           replace(p_name, 'part', 'PART') AS replaced,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size,
           left(p_name, 3) AS l3, right(p_name, 3) AS r3,
           contains(p_name, 'a') AS has_a,
           starts_with(p_type, 'type') AS is_type,
           translate(p_brand, 'Bad', 'Xyz') AS translated,
           strpos(p_name, 'a') AS a_pos,
           trim(' ' || p_brand || ' ') AS trimmed,
           regexp_replace(p_name, '[0-9]+', '#') AS digits_masked
    FROM part
    """,
)
def c41(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit("part"), F.lit("PART")).alias("replaced"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded_size"),
        F.left(F.col("p_name"), F.lit(3)).alias("l3"),
        F.right(F.col("p_name"), F.lit(3)).alias("r3"),
        F.contains(F.col("p_name"), F.lit("a")).alias("has_a"),
        F.startswith(F.col("p_type"), F.lit("type")).alias("is_type"),
        F.translate(F.col("p_brand"), "Bad", "Xyz").alias("translated"),
        F.instr(F.col("p_name"), "a").cast("bigint").alias("a_pos"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
        F.regexp_replace("p_name", "[0-9]+", "#").alias("digits_masked"),
    )


@query(
    "c42_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS od,
           year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS plus30,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           CAST(make_date(2024, month(o_orderdate), 1) AS TIMESTAMP) AS normalized
    FROM orders WHERE o_orderkey % 10 = 0
    """,
)
def c42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family. Final projections are TIMESTAMP, never DATE:
    Spark DATE collects as python objects while DuckDB yields
    datetime64, which would break value-hash comparison."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    return o.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").cast("timestamp").alias("od"),
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate").cast("date") + F.expr("INTERVAL 30 DAY"))
        .cast("timestamp")
        .alias("plus30"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since"),
        F.last_day(F.col("o_orderdate").cast("date")).cast("timestamp").alias("month_end"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.make_date(F.lit(2024), F.month("o_orderdate"), F.lit(1))
        .cast("timestamp")
        .alias("normalized"),
    )


@query(
    "c43_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25.0) AS dist25,
           round(l_extendedprice, 1) AS rounded,
           CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
           CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor,
           round(exp(l_discount), 6) AS e_disc,
           round(ln(l_extendedprice), 6) AS ln_price,
           round(log10(l_extendedprice), 6) AS log_price,
           round(pow(l_quantity, 2), 2) AS qty_sq,
           round(sqrt(l_extendedprice), 6) AS sqrt_price,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate
    FROM lineitem WHERE l_orderkey % 20 = 0
    """,
)
def c43(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 20 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25.0).alias("dist25"),
        F.round("l_extendedprice", 1).alias("rounded"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.floor(F.col("l_tax") * 100).alias("tax_pct_floor"),
        F.round(F.exp("l_discount"), 6).alias("e_disc"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.log10("l_extendedprice"), 6).alias("log_price"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "c44_array_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           round(list_sum(embedding), 4) AS vec_sum,
           round(list_aggregate(list_transform(embedding, x -> x * x), 'sum'), 4) AS sq_norm,
           list_contains(list_transform(embedding, x -> x > 0.2), true) AS has_big,
           round(list_sum(embedding[1:8]), 4) AS head_sum
    FROM embeddings WHERE vec_id % 5 = 0
    """,
)
def c44(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over the embeddings vectors — size, indexing,
    slice, HOF transform/aggregate. All JVM-side; this is also the
    building block of the D3 cosine similarity path."""
    e = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(dbl, 1), 6).alias("first_val"),
        F.round(F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x), 4).alias("vec_sum"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x), 4
        ).alias("sq_norm"),
        F.exists(dbl, lambda x: x > 0.2).alias("has_big"),
        F.round(
            F.aggregate(F.slice(dbl, 1, 8), F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("head_sum"),
    )


@query(
    "c44_explode",
    oracle="""
    SELECT doc_id, word, count(*) AS n
    FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS word
          FROM documents WHERE doc_id % 50 = 0)
    WHERE word <> ''
    GROUP BY doc_id, word
    """,
)
def c44b(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "c45_struct_map",
    oracle="""
    SELECT doc_id,
           lang AS meta_lang,
           n_chars AS meta_chars,
           source AS tag_value
    FROM documents WHERE doc_id % 25 = 0
    """,
)
def c45(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build struct + map columns, then extract — the oracle computes
    the extracted values directly (result equivalence, not syntax)."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    packed = d.select(
        "doc_id",
        F.named_struct(F.lit("lang"), F.col("lang"), F.lit("chars"), F.col("n_chars")).alias(
            "meta"
        ),
        F.create_map(F.lit("source"), F.col("source")).alias("tags"),
    )
    return packed.select(
        "doc_id",
        F.col("meta.lang").alias("meta_lang"),
        F.col("meta.chars").alias("meta_chars"),
        F.element_at(F.col("tags"), "source").alias("tag_value"),
    )


@query(
    "c46_json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events WHERE event_id % 4 = 0
    """,
)
def c46(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").filter(F.col("event_id") % 4 == 0)
    parsed = ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k BIGINT").alias("j"),
    )
    return parsed.select(
        "event_id",
        "k_str",
        F.col("j.k").alias("k_num"),
        (F.col("j.k") % 10).alias("k_mod"),
    )


@query(
    "c47_null_funcs",
    oracle="""
    SELECT event_id,
           coalesce(nullif(event_type, 'error'), 'UNKNOWN') AS et,
           nullif(event_type, 'error') IS NULL AS was_error,
           CASE WHEN nullif(event_type, 'error') IS NOT NULL THEN value ELSE -1.0 END AS nvl2_value,
           coalesce(CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END, 0.0) AS v_or_zero
    FROM events WHERE event_id % 2 = 0
    """,
)
def c47(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").filter(F.col("event_id") % 2 == 0)
    et_null = F.expr("nullif(event_type, 'error')")
    return ev.select(
        "event_id",
        F.coalesce(et_null, F.lit("UNKNOWN")).alias("et"),
        F.isnull(et_null).alias("was_error"),
        F.nvl2(et_null, F.col("value"), F.lit(-1.0)).alias("nvl2_value"),
        F.coalesce(
            F.when(F.col("event_id") % 3 == 0, F.lit(None)).otherwise(F.col("value")),
            F.lit(0.0),
        ).alias("v_or_zero"),
    )


@query(
    "c48_hash_funcs",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           length(md5(lang || source)) AS key_hash_len
    FROM documents WHERE doc_id % 10 = 0
    """,
)
def c48(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content hashing — md5/sha2 agree across engines and are the
    basis of D1 exact dedup. (spark.hash / xxhash64 / uuid are
    engine-specific → pytest-only.)"""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
        F.sha2(F.col("text").cast("binary"), 256).alias("text_sha256"),
        F.length(F.md5(F.concat("lang", "source").cast("binary"))).cast("bigint").alias(
            "key_hash_len"
        ),
    )
