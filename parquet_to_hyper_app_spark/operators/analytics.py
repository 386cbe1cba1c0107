"""Product-analytics operators over the events/documents tables.

The reference is a one-shot converter; an analytics engine that
replaces it must also answer the questions people convert files FOR.
This module adds the canonical event-analytics surface — ordered
funnels, cohort retention, value histograms, exact median/mode, and a
count-based n-gram language model — each as a declarative plan with a
DuckDB value-hash oracle.

Scale notes: every operator here is one or two hash shuffles on a
uniform key (user_id / group key / bigram), no self-joins, no
driver-side loops; the histogram's global-bounds lookup is the usual
1-row broadcast. All safe at 100 TB by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from parquet_to_hyper_app_spark.catalog import load_table
from parquet_to_hyper_app_spark.functions.crosshash import NON_WS, WS
from parquet_to_hyper_app_spark.registry import query

#: ordered funnel stages over the events stream
_FUNNEL = ("view", "click", "purchase")


@query(
    "events_funnel",
    oracle="""
    WITH t1 AS (
        SELECT user_id, min(ts) FILTER (WHERE event_type = 'view') AS ts_view
        FROM events GROUP BY user_id
    ),
    t2 AS (
        SELECT e.user_id, t1.ts_view, min(e.ts) AS ts_click
        FROM events e JOIN t1 ON e.user_id = t1.user_id
        WHERE e.event_type = 'click' AND e.ts > t1.ts_view
        GROUP BY e.user_id, t1.ts_view
    ),
    t3 AS (
        SELECT e.user_id, min(e.ts) AS ts_purchase
        FROM events e JOIN t2 ON e.user_id = t2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > t2.ts_click
        GROUP BY e.user_id
    )
    SELECT 'view' AS stage, CAST(1 AS INT) AS stage_idx,
           count(*) AS n_users FROM t1 WHERE ts_view IS NOT NULL
    UNION ALL
    SELECT 'click', CAST(2 AS INT), count(*) FROM t2
    UNION ALL
    SELECT 'purchase', CAST(3 AS INT), count(*) FROM t3
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked strictly after
    their first view, then purchased strictly after that first
    qualifying click. The ORDERED variant (not mere set intersection):
    each stage's timestamp must follow the previous stage's.

    Plan: ONE shuffle on user_id serves every stage — the per-user
    stage timestamps are conditional window minima computed in two
    chained projections over the same partitioning (t1 feeds the
    t2 condition, t2 feeds t3), then a single per-user row is counted
    per stage. No self-joins: at 100 TB this is a map + one exchange +
    window, versus the naive 3-way self-join of the events table.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = W.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == _FUNNEL[0], F.col("ts"))).over(w)
    with_t1 = ev.withColumn("ts_view", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == _FUNNEL[1]) & (F.col("ts") > F.col("ts_view")),
            F.col("ts"),
        )
    ).over(w)
    with_t2 = with_t1.withColumn("ts_click", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == _FUNNEL[2]) & (F.col("ts") > F.col("ts_click")),
            F.col("ts"),
        )
    ).over(w)
    per_user = (
        with_t2.withColumn("ts_purchase", t3)
        .groupBy("user_id")
        .agg(
            F.first("ts_view").alias("ts_view"),
            F.first("ts_click").alias("ts_click"),
            F.first("ts_purchase").alias("ts_purchase"),
        )
    )
    stages = F.array(
        F.struct(F.lit("view").alias("stage"), F.lit(1).alias("stage_idx"),
                 F.col("ts_view").isNotNull().alias("hit")),
        F.struct(F.lit("click").alias("stage"), F.lit(2).alias("stage_idx"),
                 F.col("ts_click").isNotNull().alias("hit")),
        F.struct(F.lit("purchase").alias("stage"), F.lit(3).alias("stage_idx"),
                 F.col("ts_purchase").isNotNull().alias("hit")),
    )
    return (
        per_user.select(F.explode(stages).alias("s"))
        .filter(F.col("s.hit"))
        .groupBy(F.col("s.stage").alias("stage"), F.col("s.stage_idx").alias("stage_idx"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "retention_cohorts",
    oracle="""
    WITH marked AS (
        -- window, not GROUP BY + equi-join: a NULL user_id forms one
        -- partition here exactly as it does in Spark's window, while
        -- the former `JOIN ... ON e.user_id = f.user_id` silently
        -- dropped NULL-keyed rows Spark kept (dirty fuzz, r5)
        SELECT user_id, ts,
               date_trunc('week', min(ts) OVER (PARTITION BY user_id))
                   AS cohort_week
        FROM events
    ),
    activity AS (
        SELECT DISTINCT user_id, cohort_week,
               CAST(date_diff('day', cohort_week,
                              date_trunc('week', ts)) // 7 AS BIGINT) AS week_offset
        FROM marked
    )
    SELECT cohort_week, week_offset, count(*) AS n_active_users
    FROM activity GROUP BY cohort_week, week_offset
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by the ISO week of their
    first event; for each later week-offset, how many of that cohort
    were active. The standard growth-analytics triangle.

    Plan: one shuffle on user_id (window min for the cohort week — no
    join back), a distinct on (user, cohort, offset), and the final
    count. date_trunc('week') is Monday-aligned in both engines, and
    the offset is computed as whole truncated-week difference so both
    engines bucket identically.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    w = W.partitionBy("user_id")
    cohort = F.date_trunc("week", F.min("ts").over(w)).cast("timestamp_ntz")
    act_week = F.date_trunc("week", F.col("ts")).cast("timestamp_ntz")
    # both ends are Monday-truncated, so the day difference is an exact
    # multiple of 7 — integer division is engine-agnostic
    offset = (F.datediff(act_week, cohort) / 7).cast("long").alias("week_offset")
    return (
        ev.select(
            "user_id",
            cohort.alias("cohort_week"),
            offset,
        )
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


_HIST_BUCKETS = 20


@query(
    "agg_histogram",
    oracle=f"""
    WITH bounds AS (
        SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        FROM lineitem
    ),
    bucketed AS (
        SELECT CASE WHEN hi = lo THEN 0
                    ELSE least(CAST(floor((l_extendedprice - lo) / (hi - lo)
                                          * {_HIST_BUCKETS}) AS BIGINT),
                               {_HIST_BUCKETS - 1}) END AS bucket,
               lo, hi
        FROM lineitem, bounds
    )
    SELECT bucket,
           round(lo + bucket * (hi - lo) / {_HIST_BUCKETS}, 4) AS bucket_lo,
           round(lo + (bucket + 1) * (hi - lo) / {_HIST_BUCKETS}, 4) AS bucket_hi,
           count(*) AS n
    FROM bucketed GROUP BY bucket, lo, hi
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value histogram of l_extendedprice in 20 buckets
    between the observed global min/max (top value folded into the
    last bucket).

    Plan: the global bounds are a 1-row aggregate broadcast onto the
    scan (the allowlisted tiny-BNLJ pattern), bucketing is a pure
    projection, and the count is one partial+final agg — two scans of
    the column, zero wide joins. The same shape Spark's own
    `histogram_numeric` sketch avoids — but this one is exact and
    engine-reproducible, which is what the oracle check needs.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    bounds = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    # degenerate range (all-equal / single-row column): hi == lo makes
    # the divisor 0 — NULL buckets here, inf/NaN in the DuckDB oracle.
    # Both sides map that case to bucket 0 with the SAME CASE guard.
    b = F.when(
        F.col("hi") == F.col("lo"), F.lit(0).cast("long")
    ).otherwise(
        F.least(
            F.floor(
                (F.col("l_extendedprice") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * _HIST_BUCKETS
            ).cast("long"),
            F.lit(_HIST_BUCKETS - 1),
        )
    )
    # edge arithmetic associates exactly as the oracle's
    # `lo + bucket * (hi - lo) / N` — same IEEE op order, same bits
    return (
        li.crossJoin(F.broadcast(bounds))
        .select(b.alias("bucket"), "lo", "hi")
        .groupBy("bucket", "lo", "hi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            F.round(
                F.col("lo") + F.col("bucket") * (F.col("hi") - F.col("lo")) / _HIST_BUCKETS, 4
            ).alias("bucket_lo"),
            F.round(
                F.col("lo")
                + (F.col("bucket") + 1) * (F.col("hi") - F.col("lo")) / _HIST_BUCKETS,
                4,
            ).alias("bucket_hi"),
            "n",
        )
    )


@query(
    "agg_median_mode",
    oracle="""
    WITH modes AS (
        SELECT l_returnflag, l_quantity AS mode_qty
        FROM (
            SELECT l_returnflag, l_quantity,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY count(*) DESC, l_quantity) AS rn
            FROM lineitem GROUP BY l_returnflag, l_quantity
        ) WHERE rn = 1
    )
    SELECT m.l_returnflag,
           round(q.median_price, 4) AS median_price,
           m.mode_qty
    FROM (
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.5) AS median_price
        FROM lineitem GROUP BY l_returnflag
    ) q JOIN modes m ON q.l_returnflag = m.l_returnflag
    """,
)
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median of l_extendedprice and deterministic
    mode of l_quantity (most frequent value, smallest wins ties) per
    return flag.

    Plan: the median is Spark's exact `percentile` (sort-based within
    group — one shuffle on the 3-value flag key; at 100 TB you'd salt
    or pre-bucket a hotter key, here the group count is tiny and AQE
    splits skew). The mode avoids Spark's non-deterministic `mode()`:
    a (flag, value) count plus a row_number tie-broken on the value is
    reproducible in any engine.
    """
    li = load_table(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price")
    )
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = W.partitionBy("l_returnflag").orderBy(F.col("c").desc(), F.col("l_quantity"))
    modes = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"))
    )
    return med.join(modes, "l_returnflag")


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_start,
               count(*) AS n
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    )
    SELECT event_type, hour_start, n,
           round((n - avg(n) OVER (PARTITION BY event_type))
                 / nullif(stddev_samp(n) OVER (PARTITION BY event_type), 0),
                 4) AS zscore
    FROM hourly
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly volume anomaly score: each (event_type, hour) bucket's
    count standardized against that type's own hourly mean/stddev —
    the first-line monitoring query over any event firehose (|z| > 3
    is the classic page threshold; the threshold is left to the
    consumer, the score is the operator).

    Plan: one partial+final agg to hourly counts (events collapse to
    type×hour cardinality immediately), then mean/std as window
    aggregates over the SAME partitioning — the window reuses the agg
    exchange, so the fact table is shuffled exactly once and the
    window operates on bucket rows, not raw events.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hour_start")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("event_type")
    z = (F.col("n") - F.avg("n").over(w)) / F.nullif(
        F.stddev_samp("n").over(w), F.lit(0)
    )
    return hourly.select(
        "event_type", "hour_start", "n", F.round(z, 4).alias("zscore")
    )


_LM_TOP_K = 30


@query(
    "text_ngram_lm",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(trim(text)), '{WS}+'),
                           t -> t <> '') AS tk
        FROM documents
    ),
    bigrams AS (
        SELECT unnest(list_transform(range(1, len(tk)),
                      i -> struct_pack(w1 := tk[i], w2 := tk[i+1]))) AS bg
        FROM toks WHERE len(tk) >= 2
    ),
    pair_counts AS (
        SELECT bg.w1 AS w1, bg.w2 AS w2, count(*) AS c_pair
        FROM bigrams GROUP BY bg.w1, bg.w2
    ),
    ctx_counts AS (
        SELECT w1, sum(c_pair) AS c_ctx FROM pair_counts GROUP BY w1
    )
    SELECT w1, w2, c_pair,
           round(CAST(c_pair AS DOUBLE) / c_ctx, 6) AS cond_prob,
           rank
    FROM (
        SELECT p.w1, p.w2, p.c_pair, x.c_ctx,
               CAST(row_number() OVER (ORDER BY p.c_pair DESC, p.w1, p.w2)
                    AS BIGINT) AS rank
        FROM pair_counts p JOIN ctx_counts x ON p.w1 = x.w1
    ) WHERE rank <= {_LM_TOP_K}
    """,
)
def text_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based bigram language model: the corpus's top-30 bigrams
    with their conditional probability P(w2 | w1) = c(w1,w2) / c(w1,·)
    — the classic smoothing-free n-gram LM table, and the shape of
    every corpus-statistics job (contamination scoring, perplexity
    filtering) that follows.

    Plan: tokenized bigram explode (narrow) → (w1,w2) count shuffle →
    top-k FIRST via sort+limit (TakeOrderedAndProject: per-task k-row
    heaps — no global sort of the pair table) → context totals derived
    FROM the pair counts (re-aggregating the small pair table on w1 —
    never a second pass over the corpus) joined onto the 30 survivors
    with the survivors broadcast. Token-frequency skew lands on the
    pair-count shuffle where partial aggregation absorbs it.
    """
    docs = load_table(spark, sf_dir, "documents")
    tk = F.filter(F.split(F.lower(F.trim(F.col("text"))), WS + "+"), lambda t: t != "")
    pairs = (
        # ≥2-token row filter expressed on the RAW text so filter
        # pushdown can't inline the tokenize expression into the
        # Filter node and evaluate it twice per row (see
        # ngram_jaccard_pairs for the 16× version of the same trap).
        # NON_WS WS+ NON_WS ⟺ two maximal token runs ⟺ size(tk) >= 2 — NOT
        # trim()-based: Spark's trim strips spaces only, so a
        # 'hello\n' doc would slip a 1-token row through and
        # sequence(1, size-1) would run descending into NULL bigrams
        docs.filter(F.col("text").rlike(NON_WS + WS + "+" + NON_WS))
        .select(tk.alias("tk"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 1),"
                    " i -> struct(tk[i-1] AS w1, tk[i] AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_pair"))
    )
    # both consumers (top-k heads, context totals) hang off the same
    # (w1,w2) aggregate — Spark's ReusedExchange shares the shuffle, so
    # no persist/checkpoint barrier is needed
    order = [F.col("c_pair").desc(), F.col("w1"), F.col("w2")]
    topk = pairs.orderBy(*order).limit(_LM_TOP_K)
    ctx = pairs.groupBy("w1").agg(F.sum("c_pair").alias("c_ctx"))
    return (
        ctx.join(F.broadcast(topk), "w1")
        # ≤ k rows reach this window; the constant partition key
        # (shiftright(count, 63) == 0, opaque to the optimizer — a
        # literal or `col * 0` gets stripped) silences the spurious
        # "No Partition Defined" WindowExec warning
        .withColumn(
            "rank",
            F.row_number()
            .over(W.partitionBy(F.shiftright(F.col("c_pair"), 63)).orderBy(*order))
            .cast("long"),
        )
        .select(
            "w1",
            "w2",
            "c_pair",
            F.round(F.col("c_pair").cast("double") / F.col("c_ctx"), 6).alias("cond_prob"),
            "rank",
        )
    )
