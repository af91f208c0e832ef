"""A1-A3 + A8/A9 as an oracle-paired query: the xlsx ingest path.

DuckDB cannot read xlsx, so the oracle reads a committed CSV twin of
the committed xlsx fixture (``fixtures/endpoints.xlsx`` /
``fixtures/endpoints.csv`` — same logical table, generated together).
The Spark side exercises the REAL ingest: stdlib xlsx parse, header
detection past junk rows, snake_case rename, empty-row drop, then the
silver string ops (title-case A8, first-IPv4 A9) so the derived
columns are compared value-by-value too.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cortex_spark.operators.cleaning import first_ipv4, norm_title
from etl_cortex_spark.queries import query
from etl_cortex_spark.sources.excel import read_excel

FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
)
ENDPOINTS_XLSX = os.path.join(FIXTURES, "endpoints.xlsx")
ENDPOINTS_CSV = os.path.join(FIXTURES, "endpoints.csv")


@query(
    "a01_xlsx_scan",
    oracle=f"""
    SELECT endpoint_name,
           endpoint_alias,
           operating_system,
           upper(substr(trim(endpoint_status), 1, 1))
             || lower(substr(trim(endpoint_status), 2)) AS status_norm,
           nullif(regexp_extract(ip_address, '\\b(\\d{{1,3}}(?:\\.\\d{{1,3}}){{3}})\\b', 1), '') AS ipv4,
           CAST(last_seen AS TIMESTAMP) AS last_seen
    FROM read_csv_auto('{ENDPOINTS_CSV}')
    """,
)
def a01(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = read_excel(spark, [ENDPOINTS_XLSX])
    return df.select(
        "endpoint_name",
        "endpoint_alias",
        "operating_system",
        norm_title("endpoint_status").alias("status_norm"),
        first_ipv4("ip_address").alias("ipv4"),
        F.col("last_seen").cast("timestamp").alias("last_seen"),
    )
