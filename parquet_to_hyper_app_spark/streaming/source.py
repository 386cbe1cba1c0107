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

from parquet_to_hyper_app_spark.session import ensure_session_configs

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
    ensure_session_configs(spark)
    base = os.path.join(tempfile.gettempdir(), "p2h_spark_stream", qname)
    src_dir = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src_dir, exist_ok=True)
    link = os.path.join(src_dir, "events.parquet")
    if not os.path.exists(link):
        # absolutize: a relative sf_dir would make the symlink resolve
        # against /tmp (dangling) while batch reads still worked
        os.symlink(os.path.abspath(os.path.join(sf_dir, "events.parquet")), link)
    stream = spark.readStream.schema(RAW_EVENTS_SCHEMA).parquet(src_dir)
    return stream, ckpt


def run_to_memory(stream: DataFrame, qname: str, ckpt: str, output_mode: str) -> DataFrame:
    """Drive a streaming DataFrame to completion into a memory sink
    (availableNow) and return the sink table. One definition of the
    writeStream boilerplate for every streaming query."""
    q = (
        stream.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream.sparkSession.table(qname)
