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

from parquet_to_hyper_app_spark.operators.cleaning import clean_numeric
from parquet_to_hyper_app_spark.registry import query
from parquet_to_hyper_app_spark.streaming.source import events_file_stream

#: the sink persists the stream's source-normalized int64-µs ts; the
#: re-read restores the oracle-comparable naive timestamp (no division
#: — the unit conversion happened once in events_file_stream)
_SINK_TS_EXPR = "CAST(timestamp_micros(ts) AS TIMESTAMP_NTZ)"


@query("stream_foreach_batch", oracle="SELECT * FROM events")
def stream_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S38d: streaming convert — file stream → clean_numeric →
    foreachBatch parquet append → read the sink back. The oracle is the
    source table itself: the streamed sink must be value-complete and
    value-exact (events has no NaN/Inf/null numerics, so cleaning is
    the identity here; the cleaning semantics are oracle-checked
    separately by `clean_numeric`)."""
    qname = f"fb_{uuid.uuid4().hex[:8]}"
    raw, ckpt = events_file_stream(spark, sf_dir, qname)
    out_dir = os.path.join(tempfile.gettempdir(), "p2h_spark_fb", qname, "out")

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # idempotence comes from keying the write by epoch: a replayed
        # batch OVERWRITES its own epoch directory instead of appending
        # duplicates (plain append would double rows on retry/restart)
        clean_numeric(batch_df).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch_{epoch_id}")
        )

    q = (
        raw.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # an empty/missing source produces zero epochs — no epoch_* dirs —
    # and the glob read would raise an unrelated PATH_NOT_FOUND; return
    # an empty frame with the sink schema instead
    import glob as _glob

    if not _glob.glob(os.path.join(out_dir, "epoch_*")):
        empty = clean_numeric(spark.createDataFrame([], raw.schema))
        return empty.withColumn("ts", F.expr(_SINK_TS_EXPR))
    out = spark.read.parquet(os.path.join(out_dir, "epoch_*"))
    return out.withColumn("ts", F.expr(_SINK_TS_EXPR))
