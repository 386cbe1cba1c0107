"""Streaming sinks beyond the memory sink: foreachBatch.

foreachBatch is the exactly-once escape hatch — each micro-batch
arrives as a regular DataFrame plus an epoch id, and any batch writer
(parquet, JDBC, MERGE on a lakehouse table) can be applied per batch,
idempotently keyed by epoch. Here: parquet-append delivery of a file
stream, the streaming version of the reference's convert pipeline
(stream in → clean → append to sink).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_to_hyper_app_spark.catalog import load_table
from parquet_to_hyper_app_spark.operators.cleaning import clean_numeric
from parquet_to_hyper_app_spark.registry import query


@query("stream_foreach_batch", oracle="SELECT * FROM events")
def stream_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S38d: streaming convert — file stream → clean_numeric →
    foreachBatch parquet append → read the sink back. The oracle is the
    source table itself: the streamed sink must be value-complete and
    value-exact (events has no NaN/Inf/null numerics, so cleaning is
    the identity here; the cleaning semantics are oracle-checked
    separately by `clean_numeric`)."""
    _ = load_table(spark, sf_dir, "events")
    qname = f"fb_{uuid.uuid4().hex[:8]}"
    base = os.path.join(tempfile.gettempdir(), "p2h_spark_fb", qname)
    src_dir, out_dir, ckpt = (
        os.path.join(base, "src"),
        os.path.join(base, "out"),
        os.path.join(base, "ckpt"),
    )
    os.makedirs(src_dir, exist_ok=True)
    os.symlink(os.path.join(sf_dir, "events.parquet"), os.path.join(src_dir, "events.parquet"))
    raw_schema = (
        "event_id bigint, ts bigint, user_id bigint,"
        " event_type string, value double, props string"
    )

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        clean_numeric(batch_df).write.mode("append").parquet(out_dir)

    q = (
        spark.readStream.schema(raw_schema)
        .parquet(src_dir)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(out_dir)
    return out.withColumn("ts", F.expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"))
