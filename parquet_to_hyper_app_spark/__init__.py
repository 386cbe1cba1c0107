"""parquet_to_hyper_app_spark — a PySpark-native analytics engine.

Brand-new engine with the query/data-processing capabilities of the
reference `Cardelitre/parquet-to-hyper-app` (a chunked Parquet→Hyper
batch-ETL app, see /root/reference/app.py), re-expressed Spark-first:

- the reference's single conversion pipeline (scan → numeric cleaning →
  type-widening schema inference → table sink; reference app.py:67-174)
  becomes a declarative `spark.read.parquet → column expressions →
  df.write` chain that Catalyst/Tungsten optimize and parallelize;
- around that core the engine declares a full relational surface
  (joins, aggregations, windows, set ops, scalar function library),
  Structured-Streaming window semantics, and LLM-data-pipeline
  operators (dedup, vector similarity search, text analysis,
  sessionization, multimodal column plumbing).

Every operator is registered in `parquet_to_hyper_app_spark.registry`
with a matching DuckDB oracle SQL string where expressible; the driver
contract (`__spark_entry__.py`) is a thin re-export of that registry.
"""

from parquet_to_hyper_app_spark.session import build_session, ensure_session_configs

__all__ = ["build_session", "ensure_session_configs"]
__version__ = "0.1.0"
