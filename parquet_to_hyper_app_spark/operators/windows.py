"""Window-function surface (SURVEY.md §2B S18–S20).

Windows shuffle once on the partition key, sort within partitions, and
stream the frame — no whole-partition materialization. Every orderBy
carries a unique tie-break column so results are deterministic across
engines and run-to-run (SURVEY.md §7.3 risk 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from parquet_to_hyper_app_spark.catalog import load_table
from parquet_to_hyper_app_spark.registry import query


@query(
    "window_rank",
    oracle="""
    SELECT c_nationkey, c_custkey, c_name, c_acctbal, rk FROM (
        SELECT c_nationkey, c_custkey, c_name, c_acctbal,
               rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rk
        FROM customer
    ) WHERE rk <= 3
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S18: top-3 customers by balance per nation. rank() keeps ties —
    the qualifying set is deterministic even with equal balances."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return (
        c.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_nationkey", "c_custkey", "c_name", "c_acctbal", "rk")
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts,
           lag(event_id)  OVER w AS prev_event_id,
           lead(event_id) OVER w AS next_event_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S19: per-user previous/next event + inter-event gap in µs.
    Gap arithmetic is integer (unix_micros) — no float drift."""
    ev = load_table(spark, sf_dir, "events")
    # NULL ts placement pinned (dirty fuzz, r5): Spark ASC = NULLS
    # FIRST, DuckDB ASC = NULLS LAST — a NULL-ts row at the other end
    # of the partition shifts every lag/lead
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc_nulls_last(), "event_id")
    us = F.expr("unix_micros(cast(ts as timestamp))")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        (us - F.lag(us).over(w)).alias("gap_us"),
    )


@query(
    "window_moving_agg",
    oracle="""
    SELECT event_id, user_id, ts, value,
           CAST(sum(TRY_CAST(nullif(value, 'NaN'::DOUBLE) AS DECIMAL(18,6))) OVER w AS DOUBLE)
               / count(*) OVER w AS moving_avg,
           CAST(sum(TRY_CAST(nullif(value, 'NaN'::DOUBLE) AS DECIMAL(18,6))) OVER w AS DOUBLE) AS moving_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def window_moving_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S20: moving average/sum over a 3-row frame per user.

    The frame sums in exact DECIMAL(18,6) (value quantized at 6 dp),
    not double: sliding-frame double sums accumulate in engine-specific
    order (DuckDB's segment tree vs a sequential fold), so the two
    engines differ in the last ulp and `round(x, 6)` flips at a
    rounding boundary — the adversarial-data sweep (tools/fuzz_data.py)
    caught exactly that on an avg straddling .xxxxxx5. The decimal sum
    is order-independent and exact in both engines; cast to double once
    and divide by the frame count for the average (same bits → same
    quotient), no rounding step at all (functions/exact.py rationale).
    """
    ev = load_table(spark, sf_dir, "events")
    # NULL ts pinned NULLS LAST — see window_lag_lead (dirty fuzz, r5)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc_nulls_last(), "event_id")
        .rowsBetween(-2, 0)
    )
    s = F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (s / F.count(F.lit(1)).over(w)).alias("moving_avg"),
        s.alias("moving_sum"),
    )


@query(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(sum(TRY_CAST(nullif(o_totalprice, 'NaN'::DOUBLE)
                             AS DECIMAL(12,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S20b: cumulative spend per customer. The running sum accumulates
    in exact DECIMAL(12,2), not double: window_moving_agg's fuzz flip
    proved window double-sums accumulate in engine-specific order
    (DuckDB's segment tree), so `round(sum(double), 2)` can land on a
    cent boundary and disagree in the last cent — the decimal frame sum
    is exact and order-independent, cast to double once at the end
    (functions/exact.py rationale), no rounding step at all."""
    o = load_table(spark, sf_dir, "orders")
    from parquet_to_hyper_app_spark.functions.exact import dec2

    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec2("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


@query(
    "window_distribution",
    oracle="""
    SELECT o_custkey, o_orderkey,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice NULLS LAST, o_orderkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S18b: distribution functions — percent_rank ((rank-1)/(n-1)) and
    cume_dist (rows ≤ current / n) per customer ordered by spend. Both
    are integer-ratio doubles computed by the same IEEE division in
    both engines, so no rounding is needed. One shuffle, shared by both
    functions (same window spec). The sort key is a nullable double and
    the engines' DEFAULT null placement differs (Spark ASC = NULLS
    FIRST, DuckDB ASC = NULLS LAST — a null row shifts every rank in
    its partition; caught by the dirty fuzz sweep), so the null
    position is pinned explicitly on both sides."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").asc_nulls_last(), "o_orderkey"
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
    )


@query(
    "window_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_order,
           nth_value(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S18c: navigation values per customer order history —
    first/last/nth order key. last_value uses the explicit
    unbounded-following frame (the default frame stops at CURRENT ROW,
    which would make last_value ≡ current row in BOTH engines — a
    classic silent bug); first/nth keep the default growing frame.
    """
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@query(
    "window_range_interval",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(sum(TRY_CAST(nullif(value, 'NaN'::DOUBLE) AS DECIMAL(12,2)))
                OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS trailing_1h_value,
           CAST(count(*)
                OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                AS BIGINT) AS trailing_1h_n
    FROM events
    """,
)
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S20b: time-interval RANGE frame — per user, the sum/count of
    event values in the trailing hour [ts − 1h, ts]. Unlike a ROWS
    frame, peers with equal timestamps all enter the frame, and gaps
    in event time shrink the window — the semantics a rate limiter or
    rolling exposure metric actually needs.

    Spark's rangeBetween needs a numeric order key, so the frame runs
    over epoch MICROseconds (the native resolution of the data —
    truncating to seconds would silently widen the window vs the
    oracle's INTERVAL frame). One shuffle on user_id, frames stream."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        W.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(12,2)")).over(w).cast("double").alias(
            "trailing_1h_value"
        ),
        F.count(F.lit(1)).over(w).cast("long").alias("trailing_1h_n"),
    )
