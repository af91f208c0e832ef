"""The end-to-end cortex pipeline: the whole reference app as one function.

Reference flow (``/root/reference/app.py:313-374``): parse N xlsx
uploads → union → silver clean → gold unify → multi-sheet xlsx bytes.
Here the same flow is a single lazy Spark plan between parse and the
final driver-side export:

bronze  = per-file parse (A1-A3, executors via mapInPandas or driver
          for small N) unioned with allowMissingColumns (A11)
silver  = snake_case cols (A6), drop all-null rows (A5), timestamp
          coercion (A7), status title-case (A8), first-IPv4/IPv6
          derivation (A9/A10)
gold    = dedup keep-most-recent per endpoint (A12/A13 window),
          status/OS count summaries (A15), keyword failure slice
          (A16/A17), assembled as the sheet book (A18)
export  = df_to_xlsx_bytes (A20-A22, driver-side by nature)

The silver frame is exercised once; gold caches its deduped base so
the three summary branches share one shuffle (SURVEY §4.3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from etl_cortex_spark.operators.cleaning import (
    drop_all_null_rows,
    extract_first_ipv4,
    extract_first_ipv6,
    norm_cols,
    norm_status,
    to_ts_coerce,
)
from etl_cortex_spark.operators.gold import DEFAULT_DEDUP_KEYS, unify
from etl_cortex_spark.sinks.xlsx import df_to_xlsx_bytes
from etl_cortex_spark.sources.excel import read_excel

TS_COLS = ("last_seen", "last_upgrade_status_time")


def silver_clean(df: DataFrame) -> DataFrame:
    """Bronze → silver: the reference's per-file clean (app.py:173-214)
    as one lazy projection chain — no action, no shuffle."""
    out = norm_cols(df)
    out = drop_all_null_rows(out)
    out = to_ts_coerce(out, TS_COLS)
    out = norm_status(out)
    out = extract_first_ipv4(out)
    out = extract_first_ipv6(out)
    return out


def run_pipeline(
    spark: SparkSession,
    xlsx_paths: Sequence[str],
    dedup_on: Sequence[str] = DEFAULT_DEDUP_KEYS,
) -> dict[str, DataFrame]:
    """Parse + clean + unify; returns the gold sheet book (A18)."""
    bronze = read_excel(spark, list(xlsx_paths))
    return unify(silver_clean(bronze), dedup_on=dedup_on)


def export_xlsx(sheets: dict[str, DataFrame]) -> bytes:
    """Gold sheet book → formatted multi-sheet xlsx bytes (A20)."""
    return df_to_xlsx_bytes(sheets)
