"""Relational operator surface: filter/project, join family, aggregation
family, sort/limit, set operations, pivot (SURVEY.md §2B S5–S17, S21–S24).

All operators are declarative DataFrame plans — Catalyst supplies
predicate pushdown, column pruning, join selection (broadcast below the
threshold, else sort-merge), partial+final hash aggregation, and AQE
skew handling. Design notes for 100 TB are in each docstring; nothing
here collects to the driver or loops row-wise.

Float-aggregate convention: every SUM/AVG over doubles is rounded to a
fixed scale in BOTH engines so summation-order nondeterminism (Spark
partial aggregates combine in partition order; DuckDB in its own order)
cannot flip the driver's exact value-hash. Rounding scale 2 keeps the
boundary-flip probability ~1e-4 per value (fp error ~1e-6 abs vs 0.01
quantum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_to_hyper_app_spark.catalog import load_table
from parquet_to_hyper_app_spark.functions.exact import dec2, exact_sum
from parquet_to_hyper_app_spark.registry import query
from parquet_to_hyper_app_spark.sources.scanwidth import scan_spread

# --------------------------------------------------------------------------
# S5 filter + projection
# --------------------------------------------------------------------------


@query(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_quantity, l_extendedprice, l_shipdate
    FROM lineitem
    WHERE l_quantity > 30 AND l_shipdate < TIMESTAMP '1998-06-01'
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: predicate + column pruning; both reach the parquet scan
    (PushedFilters + 4-column ReadSchema in .explain)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 30)
        & (F.col("l_shipdate") < F.lit("1998-06-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate")


# --------------------------------------------------------------------------
# S6–S12 join family
# --------------------------------------------------------------------------


@query(
    "join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: equi-join orders⋈customer. Catalyst picks broadcast-hash when
    the customer side fits `autoBroadcastJoinThreshold`, else sort-merge
    with AQE skew splitting — no manual strategy needed at any scale."""
    orders, customer = load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
    return orders.join(customer, orders.o_custkey == customer.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_multiway",
    oracle="""
    SELECT r_name, n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: star join (TPC-H Q5 shape). nation/region are bounded dims
    (25/5 rows at ANY scale factor) → explicit broadcast removes two
    shuffles. The revenue aggregation is pushed BELOW the joins by
    hand (partial-agg-through-join is not a Catalyst rewrite): lineitem
    pre-aggregates per orderkey first, so the join chain moves one row
    per order instead of ~4 lineitems per order — a 4× cut in join
    input at any scale. Decimal sums are associative, so re-aggregating
    the partials is bit-identical to aggregating raw rows."""
    li = scan_spread(load_table(spark, sf_dir, "lineitem"), "l_orderkey")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(dec2("l_extendedprice") * dec2(1 - F.col("l_discount"))).alias("rev"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            exact_sum(F.col("rev")).alias("revenue"),
            F.sum("cnt").alias("n_items"),
        )
    )


@query(
    "join_left",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: left outer join (customers kept even with zero orders)."""
    orders, customer = load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_semi",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: left-semi join ≙ EXISTS — emits each left row at most once,
    never widens the row, shuffles only the join key columns."""
    orders, li = load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    return orders.join(
        li, orders.o_orderkey == li.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_custkey", "o_orderstatus")


@query(
    "join_anti",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: left-anti join ≙ NOT EXISTS (orders with no lineitems)."""
    orders, li = load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    return orders.join(
        li, orders.o_orderkey == li.l_orderkey, "left_anti"
    ).select("o_orderkey", "o_custkey", "o_orderstatus")


@query(
    "join_range",
    oracle="""
    SELECT a.event_id AS a_id, b.event_id AS b_id,
           epoch_us(b.ts) - epoch_us(a.ts) AS delta_us
    FROM events a
    JOIN events b
      ON b.ts >= a.ts
     AND b.ts < a.ts + INTERVAL 1 MINUTE
     AND a.event_id <> b.event_id
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11: band/range self-join — events within 1 minute after each event.

    Spark has no native interval join; a naive non-equi join plans as a
    broadcast-nested-loop (O(n²) — dead at scale). Instead: bucketize
    time into band-width buckets, explode the left side to its two
    candidate buckets, equi-join on bucket, then apply the exact band
    predicate. Work becomes O(n · density) and shuffles hash-partition
    on the bucket key — the standard scalable interval-join shape.
    """
    band_us = 60_000_000  # 1 minute
    ev = load_table(spark, sf_dir, "events")
    a = ev.select(
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_ts"),
        F.expr("unix_micros(cast(ts as timestamp))").alias("a_us"),
    )
    b = ev.select(
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
        F.expr("unix_micros(cast(ts as timestamp))").alias("b_us"),
    ).withColumn("bucket", (F.col("b_us") / band_us).cast("long"))
    a_exploded = a.withColumn(
        "bucket",
        F.explode(
            F.array(
                (F.col("a_us") / band_us).cast("long"),
                (F.col("a_us") / band_us).cast("long") + 1,
            )
        ),
    )
    return (
        a_exploded.join(b, "bucket")
        .filter(
            (F.col("b_us") >= F.col("a_us"))
            & (F.col("b_us") < F.col("a_us") + band_us)
            & (F.col("a_id") != F.col("b_id"))
        )
        .select("a_id", "b_id", (F.col("b_us") - F.col("a_us")).alias("delta_us"))
    )


@query(
    "join_asof",
    oracle="""
    SELECT event_id, user_id, ts, o_orderkey, o_orderdate FROM (
        SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC NULLS LAST
               ) AS rn
        FROM events e
        LEFT JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    ) WHERE rn = 1
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12: as-of join — latest order at or before each event, per user.

    Spark-first formulation: equi-join on the entity key (shuffle
    co-partitions both sides on user), keep the inequality as a join
    residual, then pick the as-of match with max(struct(o_orderdate,
    o_orderkey)) per event — an *aggregation*, not a row_number window,
    so Catalyst plans a map-side partial HashAggregate in the join's
    own stage: the event × prior-orders fanout collapses to one row
    per event before anything shuffles. On a skewed power-user at
    100×, the window variant would shuffle the full fanout; this plan
    shuffles |events| rows regardless of skew. Struct comparison is
    lexicographic on (o_orderdate, o_orderkey) — the same
    deterministic tie-break the oracle's ranked CTE uses.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    return asof_join_df(ev, orders)


def asof_join_df(
    ev: DataFrame, orders: DataFrame, tolerance: str | None = None
) -> DataFrame:
    """The skew-proof as-of pattern on any (event_id, user_id, ts) ×
    (o_custkey, o_orderkey, o_orderdate) pair of frames — separated
    from the registry query so property-based tests can drive it with
    generated data against a naive per-row reference. `tolerance` is an
    optional SQL interval string (e.g. "INTERVAL 30 DAYS"): matches
    older than ts − tolerance are rejected (pandas merge_asof
    semantics).

    PRECONDITION (review r5): ``event_id`` must be unique — it is the
    events table's key everywhere this runs. The groupBy collapses to
    one row per DISTINCT (event_id, user_id, ts); a frame with the
    same event_id under two different (user_id, ts) values would emit
    two rows here where the oracle's row_number-per-event_id emits
    one, and true full-row duplicates would lose multiset
    multiplicity. There is no deterministic cross-engine answer for a
    duplicated key, so the contract is the key itself."""
    # scan_spread: the probe + max-struct partial aggregation over the
    # event x prior-orders fanout would otherwise run serially behind a
    # row-group-limited events scan; per-event groups are unique, so
    # the partial aggregate loses no combine ratio to the spread
    # (identity on production layouts - sources/scanwidth.py)
    ev = scan_spread(ev, "event_id")
    cond = (orders.o_custkey == ev.user_id) & (orders.o_orderdate <= ev.ts)
    if tolerance is not None:
        cond = cond & (orders.o_orderdate >= ev.ts - F.expr(tolerance))
    joined = ev.join(orders, cond, "left")
    return (
        joined.groupBy("event_id", "user_id", "ts")
        .agg(F.max(F.struct("o_orderdate", "o_orderkey")).alias("best"))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("best.o_orderkey").alias("o_orderkey"),
            F.col("best.o_orderdate").alias("o_orderdate"),
        )
    )


# --------------------------------------------------------------------------
# S13–S17 aggregation family
# --------------------------------------------------------------------------


@query(
    "agg_groupby",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))
                    * CAST(1 + l_tax AS DECIMAL(12,2))) AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13: TPC-H Q1 — grouped sum/avg/count. Partial (map-side) +
    final hash aggregation for free; 6 groups means the final shuffle
    moves ~nothing regardless of input size. `scan_spread` parallelizes
    the decimal partial aggregation when the input's row-group layout
    would otherwise pin it to one core (identity on production file
    layouts — sources/scanwidth.py)."""
    li = scan_spread(load_table(spark, sf_dir, "lineitem"), "l_orderkey")
    disc_price = dec2("l_extendedprice") * dec2(1 - F.col("l_discount"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(dec2("l_quantity")).alias("sum_qty"),
            exact_sum(dec2("l_extendedprice")).alias("sum_base_price"),
            exact_sum(disc_price).alias("sum_disc_price"),
            exact_sum(disc_price * dec2(1 + F.col("l_tax"))).alias("sum_charge"),
            (exact_sum(dec2("l_quantity")) / n).alias("avg_qty"),
            (exact_sum(dec2("l_extendedprice")) / n).alias("avg_price"),
            (exact_sum(dec2("l_discount")) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS distinct_parts,
           count(DISTINCT l_suppkey) AS distinct_supps,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S14: exact grouped count(distinct). Catalyst expands multi-
    distinct into a two-phase aggregate (Expand + partial dedup) so the
    shuffle carries distinct (group, value) pairs, not raw rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S15: hierarchical totals; Spark and DuckDB agree on NULL
    grouping markers for the subtotal rows."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        exact_sum(dec2("o_totalprice")).alias("total_price"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S16: full cross-tabulation totals via CUBE."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (exact_sum(dec2("o_totalprice")) / F.count(F.lit(1))).alias("avg_price"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           count(*) AS n_rows,
           TRUE AS approx_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S17: HyperLogLog++ distinct estimate per group, hash-checked on
    its deterministic half.

    The sketch VALUE is algorithm-specific (DuckDB's
    approx_count_distinct is a different sketch and need not match), so
    the raw estimate can't be a hash-checked column. Instead the query
    emits the EXACT distinct count (computed in the same single
    aggregation — Spark plans both as one partial/final agg pass) plus
    a boolean asserting the sketch landed within 5% of exact (~2.5σ at
    rsd=0.02; observed ~1% at sf0.01). The oracle recomputes the exact
    half and pins the boolean at TRUE — a degraded sketch flips the
    boolean and reds the hash check. The tighter 2% rsd bound stays
    asserted in tests.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.count_distinct("l_partkey").alias("exact_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            "n_rows",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                <= 0.05 * F.col("exact_parts")
            ).alias("approx_within_5pct"),
        )
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_quantity), 4) AS var_qty,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13b: statistical aggregates (stddev/variance/corr/min/max).

    Degenerate groups pin NULL, not NaN (review r5): Spark returns NaN
    for stddev_samp/var_samp of a 1-row group and corr of a constant
    column where DuckDB returns SQL NULL — nanvl aligns the two (the
    driver's pandas canonicalization happens to fold them, but any
    Spark-side consumer distinguishes isNull from isnan)."""

    def nn(c: Column) -> Column:
        return F.when(F.isnan(c), F.lit(None)).otherwise(c)

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(nn(F.stddev_samp("l_quantity")), 4).alias("sd_qty"),
        F.round(nn(F.var_samp("l_quantity")), 4).alias("var_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.round(nn(F.corr("l_quantity", "l_extendedprice")), 6).alias("qty_price_corr"),
    )


# --------------------------------------------------------------------------
# S21 sort/limit, S22–S24 set ops, pivot
# --------------------------------------------------------------------------


@query(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S21: global top-k. Spark plans TakeOrderedAndProject — each task
    keeps a k-row heap, the driver merges k·tasks rows; no global sort
    materializes at any scale. Deterministic tie-break on o_orderkey."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S22: UNION (distinct) of two key sets."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    INTERSECT
    SELECT o_custkey FROM orders
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S23: INTERSECT (distinct) — customers that placed orders."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.intersect(o)


@query(
    "set_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT c.c_custkey FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S24: EXCEPT (distinct) — ordering customers outside ASIA."""
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    asia = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select(F.col("c_custkey").alias("custkey"))
    )
    return o.subtract(asia)  # subtract == SQL EXCEPT (distinct)


@query(
    "pivot_status",
    oracle="""
    SELECT c_mktsegment,
           count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
           count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
           count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13c: pivot — order-status counts + segment spend in ONE pass.

    The pivot is spelled as conditional aggregation (count of a CASE
    arm per pinned status value) — exactly what Catalyst compiles
    ``.pivot("o_orderstatus", ["F", "O", "P"])`` into, but it lets
    ``total`` ride the SAME groupBy as an INDEPENDENT unconditional
    decimal sum. The earlier ``.pivot()`` shape reassembled total from
    the three per-status spends, which silently diverged from the
    oracle's sum(o_totalprice) whenever a status lands outside
    {F,O,P} or NULL (advice r6) — now out-of-domain rows drop from
    the counts but stay in total, on both engines, enforced by the
    dirty-fuzz profile's out-of-domain status row. One shuffle, one
    pass; a NULL market segment survives (review r5); an all-NULL
    price segment stays NULL like SQL sum, not 0.
    """
    orders, customer = load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey)
    return joined.groupBy("c_mktsegment").agg(
        *[
            F.count(F.when(F.col("o_orderstatus") == s, 1)).alias(f"n_{s.lower()}")
            for s in ("F", "O", "P")
        ],
        F.sum(dec2("o_totalprice")).cast("double").alias("total"),
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT s.s_suppkey, s.s_name, l.l_orderkey, l.l_linenumber, l.l_quantity
    FROM supplier s FULL OUTER JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8c: full-outer join — suppliers with no lineitems AND lineitems
    with unknown suppliers both survive with NULLs on the missing side.
    Full-outer cannot broadcast (both sides must stream unmatched
    rows), so Catalyst plans a shuffle sort-merge join on the key —
    the correct and only scalable shape for this operator.
    """
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_quantity"
    )
    return (
        s.join(li, li.l_suppkey == s.s_suppkey, "full_outer")
        .select("s_suppkey", "s_name", "l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    INTERSECT ALL
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S23b: INTERSECT ALL — multiset semantics: each custkey keeps
    min(count_left, count_right) copies (a customer with 5 orders and
    one positive-balance row yields 1 copy, not 5 and not 1-distinct).
    Spark's intersectAll plans this as a single aggregate-join — no
    row-number trick needed."""
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return o.intersectAll(c)


@query(
    "set_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT ALL
    SELECT c_custkey FROM customer
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S24b: EXCEPT ALL — multiset difference: a customer with n
    orders keeps n − 1 custkey copies after subtracting their one
    customer row (distinct EXCEPT would drop them entirely). The
    result is exactly the "repeat orders" multiset."""
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    return o.exceptAll(c)


@query(
    "join_asof_tolerance",
    oracle="""
    SELECT event_id, user_id, ts, o_orderkey, o_orderdate FROM (
        SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC NULLS LAST
               ) AS rn
        FROM events e
        LEFT JOIN orders o
          ON o.o_custkey = e.user_id
         AND o.o_orderdate <= e.ts
         AND o.o_orderdate >= e.ts - INTERVAL 30 DAY
    ) WHERE rn = 1
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12b: as-of join with a staleness tolerance — latest order at
    or before each event but no older than 30 days (pandas
    merge_asof's `tolerance=`). Same skew-proof shape as join_asof
    (equi-join + residual band, max-struct aggregation instead of a
    window) with the tolerance as a second residual; events whose only
    matches are stale fall back to NULL exactly like the oracle's
    left join."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    return asof_join_df(ev, orders, tolerance="INTERVAL 30 DAYS")


#: nearest-direction as-of tolerance: ±30 days in MICROSECONDS — the
#: distance is compared in exact integer µs on both engines
#: (unix_micros ↔ epoch_us); seconds-level truncation would
#: manufacture false ties between a before- and an after-match
_ASOF_NEAREST_TOL_US = 30 * 86400 * 1_000_000


@query(
    "join_asof_nearest",
    oracle=f"""
    SELECT event_id, user_id, ts, o_orderkey, o_orderdate FROM (
        SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY abs(epoch_us(o.o_orderdate) - epoch_us(e.ts)) ASC NULLS LAST,
                            o.o_orderdate ASC NULLS LAST,
                            o.o_orderkey ASC NULLS LAST
               ) AS rn
        FROM events e
        LEFT JOIN orders o
          ON o.o_custkey = e.user_id
         AND abs(epoch_us(o.o_orderdate) - epoch_us(e.ts)) <= {_ASOF_NEAREST_TOL_US}
    ) WHERE rn = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12c: NEAREST-direction as-of join (pandas merge_asof
    direction='nearest'; kdb wj / QuestDB-style) — each event picks the
    SAME-user order with the smallest |o_orderdate − ts| within ±30
    days, either side. Tie contract (an equidistant before/after pair):
    the EARLIER order date wins, then the smaller orderkey — pinned
    identically in the struct-min and the oracle's ORDER BY.

    Same skew-proof shape as `join_asof` (equi-join on the entity key +
    residual band, then ARGMIN via a partial-aggregating struct-min —
    never a window over the raw fanout), with two twists the backward
    direction doesn't need: the distance is exact integer MICROSECONDS
    (unix_micros ↔ epoch_us — truncating to seconds would manufacture
    false before/after ties), and the struct must be NULL for
    unmatched left rows (min() skips NULL structs, but a
    struct-of-NULL-fields would lexicographically UNDERCUT every real
    match — the inverse of the max-struct trick join_asof rides).
    Events/orders with NULL timestamps fall out of the band predicate
    on both engines. One shuffle on the entity key; the band keeps the
    per-event candidate set bounded by per-user order density.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    # unix_micros takes TIMESTAMP, the tables carry TIMESTAMP_NTZ —
    # the session timezone is pinned UTC so the cast is wall-clock
    # preserving and equals DuckDB's epoch_us on naive timestamps
    ev = scan_spread(ev, "event_id")  # same rationale as asof_join_df
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    dist = F.abs(us(orders.o_orderdate) - us(ev.ts))
    cond = (orders.o_custkey == ev.user_id) & (dist <= _ASOF_NEAREST_TOL_US)
    joined = ev.join(orders, cond, "left")
    d = F.abs(us(F.col("o_orderdate")) - us(F.col("ts")))
    cand = F.when(
        F.col("o_orderkey").isNotNull(),
        F.struct(
            d.alias("d"),
            F.col("o_orderdate").alias("o_orderdate"),
            F.col("o_orderkey").alias("o_orderkey"),
        ),
    )
    return (
        joined.groupBy("event_id", "user_id", "ts")
        .agg(F.min(cand).alias("best"))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("best.o_orderkey").alias("o_orderkey"),
            F.col("best.o_orderdate").alias("o_orderdate"),
        )
    )
