"""etl_cortex_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capability surface of the reference
ETL application ``rafafrd/etl-cortex`` (a Streamlit + pandas medallion
pipeline, see ``/root/reference/app.py``) as a lazy, distributed,
Catalyst-optimized Spark engine, extended with the LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
a 100 TB training-data pipeline needs.

Layout
------
- ``session``     SparkSession builder tuned for local[N] and cluster use
- ``sources``     readers (parquet/csv/json/excel), table registry, sinks
- ``operators``   the operator library: cleaning, gold transforms, asof,
                  dedup, similarity, text analysis, multimodal, viz aggs
- ``functions``   reusable column-expression helpers
- ``plans``       plan inspection / explain helpers
- ``streaming``   Structured Streaming pipelines over the events table
"""

__version__ = "0.1.0"
