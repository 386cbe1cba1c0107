"""Query registry — the single source of truth for the driver contract.

Every operator the engine declares (SURVEY.md §2B) registers itself here
via the ``@query`` decorator, pairing the PySpark implementation with
the DuckDB oracle SQL that computes the same result on the same parquet
tables. ``__spark_entry__.py`` re-exports this registry.

Conventions (enforced by tests/test_oracle_parity.py):
- every computed column is aliased identically in Spark and oracle SQL
  (the driver sorts columns by name before value-hashing);
- floating-point aggregates are rounded to a fixed number of decimals
  *in both engines* so sum-order nondeterminism cannot flip the hash;
- queries with no oracle (``oracle=None``) are genuinely
  non-SQL-expressible or approximate; the driver records a rows-only
  check for them and the docstring says why.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    key: str
    fn: QueryFn
    oracle: str | None
    doc: str


#: key → spec; populated at import time by the operator modules.
QUERIES: dict[str, QuerySpec] = {}


def query(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn(spark, sf_dir) -> DataFrame`` under ``key``."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = QuerySpec(key=key, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (each registers its queries)."""
    # Imports are inside the function so `import registry` stays cheap
    # and circular imports (modules import `query` from here) resolve.
    from parquet_to_hyper_app_spark.operators import analytics  # noqa: F401
    from parquet_to_hyper_app_spark.operators import bucketed  # noqa: F401
    from parquet_to_hyper_app_spark.operators import cleaning  # noqa: F401
    from parquet_to_hyper_app_spark.operators import relational  # noqa: F401
    from parquet_to_hyper_app_spark.operators import sql_surface  # noqa: F401
    from parquet_to_hyper_app_spark.operators import timeseries  # noqa: F401
    from parquet_to_hyper_app_spark.operators import tpch  # noqa: F401
    from parquet_to_hyper_app_spark.operators import windows  # noqa: F401
    from parquet_to_hyper_app_spark.operators.llm import corpus  # noqa: F401
    from parquet_to_hyper_app_spark.operators.llm import dedup  # noqa: F401
    from parquet_to_hyper_app_spark.operators.llm import features  # noqa: F401
    from parquet_to_hyper_app_spark.operators.llm import multimodal  # noqa: F401
    from parquet_to_hyper_app_spark.operators.llm import pipeline  # noqa: F401
    from parquet_to_hyper_app_spark.operators.llm import sessionize  # noqa: F401
    from parquet_to_hyper_app_spark.operators.llm import similarity  # noqa: F401
    from parquet_to_hyper_app_spark.operators.llm import text  # noqa: F401
    from parquet_to_hyper_app_spark.functions import scalars  # noqa: F401
    from parquet_to_hyper_app_spark.functions import udfs  # noqa: F401
    from parquet_to_hyper_app_spark.sources import convert  # noqa: F401
    from parquet_to_hyper_app_spark.sources import formats  # noqa: F401
    from parquet_to_hyper_app_spark.sources import partitioned  # noqa: F401
    from parquet_to_hyper_app_spark.streaming import sinks  # noqa: F401
    from parquet_to_hyper_app_spark.streaming import stateful  # noqa: F401
    from parquet_to_hyper_app_spark.streaming import windows as swindows  # noqa: F401

    return QUERIES
