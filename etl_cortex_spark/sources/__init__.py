"""Sources & sinks: table registry, file readers, excel ingest, writers."""

from etl_cortex_spark.sources.tables import TABLES, load_table, load_tables, register_views

__all__ = ["TABLES", "load_table", "load_tables", "register_views"]
