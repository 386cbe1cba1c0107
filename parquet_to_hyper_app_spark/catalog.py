"""Table catalog over the driver testdata directories.

One parquet file per table under ``{sf_dir}/{name}.parquet`` (TESTDATA.md).
The loader normalizes source quirks so every downstream operator sees a
clean, oracle-comparable schema:

- ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
  vectorized reader rejects; with ``spark.sql.legacy.parquet.nanosAsLong``
  we read raw int64 nanoseconds and truncate to microseconds with
  *integer* division (``div 1000``) — float division would lose
  precision above 2^53 ns and round instead of truncate, diverging from
  DuckDB's ns→us cast by 1 µs on ~half the rows.
- ms-precision timestamps (orders/lineitem) infer as TIMESTAMP_NTZ,
  which matches DuckDB's UTC-naive timestamps value-for-value.

At 100 TB each "table" becomes a directory of many parquet files (or an
external catalog table); `load_table` takes any path spark.read.parquet
accepts, so nothing here assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_to_hyper_app_spark.session import ensure_session_configs

#: All driver-generated tables (TESTDATA.md / FIXTURES.md §A).
TABLE_NAMES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: events.ts int64-nanos → µs-truncated naive timestamp (matches the
#: DuckDB oracle, which exposes the ns column as a µs TIMESTAMP).
EVENTS_TS_EXPR = "CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with source normalization applied."""
    ensure_session_configs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr(EVENTS_TS_EXPR))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    """Load several tables at once: ``lineitem, orders = load_tables(...)``."""
    return tuple(load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for SQL-first callers."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
