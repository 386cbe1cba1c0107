"""Shared file-stream source plumbing for the events table.

One place owns: the raw on-disk schema of events.parquet (int64-nanos
ts under nanosAsLong), the symlinked source directory (the file stream
source requires a directory), and the per-query checkpoint location.
Every streaming query builds on this — a schema or convention change
happens here once.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from parquet_to_hyper_app_spark.catalog import load_table

#: raw file schema: ts is int64 nanoseconds (see catalog.EVENTS_TS_EXPR)
RAW_EVENTS_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint,"
    " event_type string, value double, props string"
)


def events_file_stream(
    spark: SparkSession, sf_dir: str, qname: str
) -> tuple[DataFrame, str]:
    """Raw events file stream (+ checkpoint path) for query `qname`.

    The returned DataFrame has the RAW schema — ts as int64 nanos;
    callers convert with catalog.EVENTS_TS_EXPR (or timestamp_micros
    for the tz-aware watermark form).
    """
    _ = load_table(spark, sf_dir, "events")  # applies session confs
    base = os.path.join(tempfile.gettempdir(), "p2h_spark_stream", qname)
    src_dir = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src_dir, exist_ok=True)
    link = os.path.join(src_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    stream = spark.readStream.schema(RAW_EVENTS_SCHEMA).parquet(src_dir)
    return stream, ckpt
