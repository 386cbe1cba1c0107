"""Partitioned sink + partition-pruned scan (the 100 TB layout story).

At scale a table is a directory tree partitioned by low-cardinality
columns; a filter on the partition column must prune directories at
planning time (PartitionFilters in the scan, zero I/O for other
partitions). This module writes a hive-layout partitioned sink and
reads it back pruned — `tests/test_plans.py` asserts the pruning
actually happens in the plan.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_to_hyper_app_spark.catalog import load_table
from parquet_to_hyper_app_spark.registry import query


def write_partitioned(df: DataFrame, path: str, *partition_cols: str) -> None:
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def partitioned_orders_path(spark: SparkSession, sf_dir: str) -> str:
    """Write (once per source state) orders partitioned by
    o_orderstatus. The cache key includes the source file's
    mtime+size so a regenerated testdata dir with the same name never
    serves a stale sink."""
    import shutil
    import uuid

    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    path = os.path.join(
        tempfile.gettempdir(),
        "p2h_spark_part",
        f"{os.path.basename(sf_dir.rstrip('/'))}_{int(st.st_mtime)}_{st.st_size}",
        "orders",
    )
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        # write to a process-unique staging dir, then atomically rename
        # into place — a naive check-then-overwrite races a concurrent
        # process (parity + pytest in parallel) into a corrupt sink
        staging = f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        write_partitioned(load_table(spark, sf_dir, "orders"), staging, "o_orderstatus")
        try:
            os.rename(staging, path)
        except OSError:
            # another process won the rename; use theirs
            shutil.rmtree(staging, ignore_errors=True)
    return path


@query(
    "partitioned_sink_prune",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate, o_orderpriority,
           o_orderstatus
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def partitioned_sink_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned write + pruned read: only the o_orderstatus=F
    directory is scanned (PartitionFilters, not a data filter)."""
    path = partitioned_orders_path(spark, sf_dir)
    return (
        spark.read.parquet(path)
        .filter(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
            "o_orderstatus",
        )
    )
