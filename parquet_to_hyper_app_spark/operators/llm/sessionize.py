"""Gap-based sessionization over the events stream table (S34).

The classic two-window formulation: a lag() marks gap>threshold
boundaries, a running sum of boundary flags numbers the sessions —
both windows share the same (user_id, ts) partitioning/ordering, so
Spark plans ONE shuffle + ONE sort for the whole thing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from parquet_to_hyper_app_spark.catalog import load_table
from parquet_to_hyper_app_spark.functions.exact import dec2, exact_sum
from parquet_to_hyper_app_spark.registry import query

GAP_SECONDS = 30 * 60


def sessionized(events: DataFrame, gap_seconds: int = GAP_SECONDS) -> DataFrame:
    """Assign session_id per user: new session when gap > threshold."""
    # NULL ts placement pinned (dirty fuzz, r5): Spark ASC = NULLS
    # FIRST vs DuckDB NULLS LAST; a NULL-ts event must sort AFTER the
    # real events in both engines (it opens the user's final session —
    # its gap is NULL ⇒ new-session flag in both formulations)
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc_nulls_last(), "event_id")
    us = F.expr("unix_micros(cast(ts as timestamp))")
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("long"),
    )


@query(
    "sessionize",
    oracle=f"""
    SELECT user_id, session_id,
           min(ts) AS session_start,
           max(ts) AS session_end,
           count(*) AS n_events,
           CAST(sum(TRY_CAST(nullif(value, 'NaN'::DOUBLE) AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM (
        SELECT user_id, ts, value,
               CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > {GAP_SECONDS} * 1000000
                             THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_id
        FROM (
            SELECT user_id, event_id, ts, value,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts NULLS LAST, event_id) AS gap_us
            FROM events
        )
    )
    GROUP BY user_id, session_id
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S34: 30-minute-gap sessions per user with per-session rollup."""
    ev = load_table(spark, sf_dir, "events")
    return (
        sessionized(ev)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            exact_sum(dec2("value")).alias("total_value"),
        )
    )
