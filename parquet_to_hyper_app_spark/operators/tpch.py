"""The complete TPC-H-shaped suite (Q1–Q22) over the testdata star schema.

Every query is expressed against the columns the synthetic schema
actually has: queries needing partsupp run on a deterministic
lineitem-derived bridge (see _part_supp_bridge), and commit/receipt-date
lateness becomes shipdate-vs-orderdate lateness. All money math follows
the decimal-exact convention (functions/exact.py) so the oracle hash is
bitwise stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from parquet_to_hyper_app_spark.catalog import load_table
from parquet_to_hyper_app_spark.functions.exact import dec2, exact_sum
from parquet_to_hyper_app_spark.registry import query
from parquet_to_hyper_app_spark.sources.scanwidth import scan_spread


@query(
    "tpch_q3",
    oracle="""
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-01'
      AND l_shipdate > TIMESTAMP '1996-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority: selective dim filter → fact join →
    grouped revenue → global top-10. Filters push to all three scans;
    the limit plans as TakeOrderedAndProject over the aggregate."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp_ntz")
    )
    li = scan_spread(
        load_table(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") > F.lit("1996-06-01").cast("timestamp_ntz")
        ),
        "l_orderkey",
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_sum(dec2("l_extendedprice") * dec2(1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "tpch_q6",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecast revenue: scan → 4 pushed predicates → global agg.
    The whole query is one codegen stage over a pruned 4-column scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            exact_sum(dec2("l_extendedprice") * dec2("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "tpch_q18",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
    HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 150
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: join + grouped sum + HAVING filter
    on the aggregate (post-aggregation predicate — the one relational
    construct the rest of the surface didn't yet exercise). The HAVING
    compares exact decimals, so the cut is deterministic."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = scan_spread(load_table(spark, sf_dir, "lineitem"), "l_orderkey")
    qty = F.sum(dec2("l_quantity"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate")
        .agg(qty.cast("double").alias("total_qty"), qty.alias("__q"))
        .filter(F.col("__q") > 150)
        .drop("__q")
    )


@query(
    "tpch_q14",
    oracle="""
    SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice AS DECIMAL(12,2))
                              * CAST(1 - l_discount AS DECIMAL(12,2))
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
               AS promo_revenue,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE)
               AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-07-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion effect: fact⋈dim with conditional aggregation.
    The ratio is left to the caller — emitting both exact-decimal sums
    keeps the oracle hash free of division noise."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part")
    disc_price = dec2("l_extendedprice") * dec2(1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return li.join(p, li.l_partkey == p.p_partkey).agg(
        F.sum(promo).cast("double").alias("promo_revenue"),
        exact_sum(disc_price).alias("total_revenue"),
    )


@query(
    "tpch_q5",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local supplier volume: 6-way star join with a same-nation
    residual (c_nationkey = s_nationkey).

    Plan shape for scale: region→nation→supplier collapses to one
    broadcast (bounded dims), so the only shuffles are the two fact
    joins — orders⋈customer on custkey, then ⋈lineitem on orderkey.
    The same-nation predicate rides the supplier broadcast join as a
    residual; nothing re-shuffles for it. 5 output rows."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    sn = s.join(
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        s.s_nationkey == n.n_nationkey,
    ).select("s_suppkey", "s_nationkey", "n_name")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    fact = c.join(o, c.c_custkey == o.o_custkey).join(li, o.o_orderkey == li.l_orderkey)
    return (
        fact.join(
            F.broadcast(sn),
            (li.l_suppkey == sn.s_suppkey) & (c.c_nationkey == sn.s_nationkey),
        )
        .groupBy("n_name")
        .agg(exact_sum(dec2("l_extendedprice") * dec2(1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "tpch_q7",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping between two nations, by direction and year.

    The disjunctive nation-pair predicate cannot be pushed to either
    scan alone, but each arm's nation filter rides a broadcast join:
    nation is broadcast to both supplier and customer sides, the OR is
    evaluated as a residual after the last fact join. Shuffles: the
    two fact joins only — identical to Q5's skeleton."""
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    n1 = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sk"))
        .select("s_suppkey", "supp_nation")
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("ck"))
        .select("c_custkey", "cust_nation")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(exact_sum(dec2("l_extendedprice") * dec2(1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "tpch_q8",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
                         THEN CAST(l_extendedprice AS DECIMAL(12,2))
                              * CAST(1 - l_discount AS DECIMAL(12,2))
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS nation_volume,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS total_volume
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'AMERICA'
      AND p_type = 'STANDARD'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share: the widest star in the suite
    (8 relations). Numerator and denominator are emitted as separate
    exact-decimal sums — the share ratio is one client-side division,
    so the oracle hash never sees float division.

    Scale plan: part (filtered on p_type), supplier⋈n2, and
    customer⋈n1⋈region are all broadcast dims; lineitem⋈orders is the
    one repartition join (orderkey). Conditional agg collapses to
    ≤ years rows before the final single-partition exchange."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD").select("p_partkey")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("ck_nation")
    )
    n2 = n.select(F.col("n_nationkey").alias("sk_nation"), F.col("n_name").alias("supp_name"))
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("ck_nation"))
        .select("c_custkey")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sk_nation"))
        .select("s_suppkey", "supp_name")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dec2("l_extendedprice") * dec2(1 - F.col("l_discount"))
    nation_term = F.when(F.col("supp_name") == "NATION_3", disc_price).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(nation_term).cast("double").alias("nation_volume"),
            exact_sum(disc_price).alias("total_volume"),
        )
    )


@query(
    "tpch_q10",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(1 - l_discount AS DECIMAL(12,2))) DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting: who returned the most revenue last
    quarter. Grouped revenue per customer → global top-20.

    The ORDER BY key is the *decimal* revenue (before the double cast)
    with c_custkey as tie-break, so the top-20 cut is exact and
    deterministic in both engines. TakeOrderedAndProject keeps the
    sort O(20) per partition — no global sort materializes."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.sum(dec2("l_extendedprice") * dec2(1 - F.col("l_discount")))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(rev.cast("double").alias("revenue"), rev.alias("__rev"))
        .orderBy(F.col("__rev").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@query(
    "tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer order-count distribution: left join (customers
    with zero orders survive as c_count=0) → per-customer count →
    histogram of counts.

    Two-level aggregation: the first groupBy reuses the join's
    custkey partitioning (no extra shuffle under AQE); the second
    shuffles only |distinct counts| ≈ dozens of rows."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "tpch_q15",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * CAST(1 - l_discount AS DECIMAL(12,2))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: per-supplier quarterly revenue, keep the
    supplier(s) achieving the global max.

    The max is computed over *exact decimals* so the equality
    selection is deterministic (a double max would tie-break on ulps).
    Spark plan: one partial+final agg on suppkey, a 1-row global agg
    broadcast back, supplier dim broadcast — lineitem is scanned once
    and shuffled once."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(dec2("l_extendedprice") * dec2(1 - F.col("l_discount"))).alias("__rev"))
    )
    best = rev.agg(F.max("__rev").alias("__best"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(best), rev["__rev"] == best["__best"])
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("__rev").cast("double").alias("total_revenue"))
    )


@query(
    "tpch_q17",
    oracle="""
    WITH per_part AS (
        SELECT l_partkey AS pk,
               CAST(count(*) AS DECIMAL(10,0)) AS cnt,
               sum(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_extprice,
           count(*) AS n_rows
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN per_part ON pk = l_partkey
    WHERE p_brand = 'Brand#3'
      AND CAST(l_quantity AS DECIMAL(12,2)) * CAST(5 AS DECIMAL(2,0)) * cnt < total_qty
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue: lineitems whose quantity is
    below 20% of the part's average quantity.

    The correlated `avg` is decorrelated into a per-part aggregate and
    the `qty < 0.2 * avg` predicate is cross-multiplied to
    `5 * qty * cnt < total` — all-decimal, so no engine ever divides
    and the cut is exact. Plan: lineitem shuffles once on partkey,
    joins its own aggregate (co-partitioned, no second shuffle of the
    agg side), part dim broadcast after the brand filter."""
    li = scan_spread(load_table(spark, sf_dir, "lineitem"), "l_partkey")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count(F.lit(1)).cast("decimal(10,0)").alias("cnt"),
        F.sum(dec2("l_quantity")).alias("total_qty"),
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == per_part.pk)
        .filter(dec2("l_quantity") * F.lit(5).cast("decimal(2,0)") * F.col("cnt") < F.col("total_qty"))
        .agg(
            exact_sum(dec2("l_extendedprice")).alias("total_extprice"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))
                    * CAST(1 + l_tax AS DECIMAL(12,2))) AS DOUBLE) AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pricing summary report (reference headline shape,
    app.py's rollup reimagined as the canonical TPC-H Q1).

    Scan → one pushed date predicate → grouped decimal sums. Averages
    are client-side divisions of the emitted exact sums, so the oracle
    hash never sees float division. The whole query is one codegen
    stage feeding a 6-group hash aggregate — the partial/final split
    means only 6 rows per task cross the exchange at any scale.
    `scan_spread` parallelizes the decimal partial aggregation when the
    input's row-group layout would otherwise pin it to one core
    (identity on production file layouts — sources/scanwidth.py)."""
    li = scan_spread(
        load_table(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp_ntz")
        ),
        "l_orderkey",
    )
    disc = dec2("l_extendedprice") * dec2(1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(dec2("l_quantity")).alias("sum_qty"),
            exact_sum(dec2("l_extendedprice")).alias("sum_base_price"),
            exact_sum(disc).alias("sum_disc_price"),
            exact_sum(disc * dec2(1 + F.col("l_tax"))).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking, adapted: the testdata has no
    commit/receipt dates, so "late" is l_shipdate > o_orderdate + 90
    days (same correlated-EXISTS shape as the spec's l_commitdate <
    l_receiptdate).

    Plan: the date window prunes orders at the scan; the EXISTS plans
    as a left-semi shuffle join on orderkey with the lateness
    inequality as a residual — no fanout, the semi join short-circuits
    per matching order."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q12",
    oracle="""
    SELECT l_returnflag AS ship_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >  o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY ship_class
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipping-mode priority, adapted: no l_shipmode column, so
    lines are classed by l_returnflag; "late" is the shared
    shipdate-vs-orderdate lateness predicate (see tpch_q4).

    Plan: the 1996 window prunes lineitem at the scan; orders⋈lineitem
    is the single shuffle join with the lateness inequality as a
    residual; the conditional counts are one hash aggregate over ≤3
    groups (map-side partials collapse almost everything)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q19",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           count(*) AS n_rows
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue: three disjunctive brand/size/quantity
    arms (the spec's container/shipmode legs dropped — those columns
    don't exist in the testdata).

    The OR spans both sides of the join, so no single arm is pushable
    — but each side's *union bound* is: Catalyst derives
    `p_brand IN (...)` and `l_quantity BETWEEN 1 AND 30` scan filters
    from the disjunction, and the full predicate evaluates as a
    broadcast-join residual. Part is always the broadcast side."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(arm("Brand#12", 15, 1, 11) | arm("Brand#23", 25, 10, 20) | arm("Brand#3", 35, 20, 30))
        .agg(
            exact_sum(dec2("l_extendedprice") * dec2(1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "tpch_q22",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(sum(TRY_CAST(nullif(c_acctbal, 'NaN'::DOUBLE) AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS t
        FROM customer
        WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    )
    SELECT c_nationkey AS cntrycode,
           count(*) AS numcust,
           CAST(sum(TRY_CAST(nullif(c_acctbal, 'NaN'::DOUBLE) AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND c_acctbal > t
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY cntrycode
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity, adapted: c_nationkey plays the
    phone-prefix country code, and "has no orders" becomes "has no
    orders since 2000" (every synthetic customer has some order).

    The average-balance threshold divides an exact decimal sum by the
    count as ONE double division, so both engines compare against the
    bit-identical threshold. Plan: the 1-row threshold and the
    recent-orders key set stay on the build side — threshold via
    broadcast cross-join, the NOT EXISTS as a left-anti shuffle join
    on custkey; customer is scanned once."""
    nations = [1, 3, 5, 7, 9, 11, 13]
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(nations))
    thresh = (
        c.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(dec2("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("t"))
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("t"))
        .join(recent, F.col("c_custkey") == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            exact_sum(dec2("c_acctbal")).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Surrogate partsupp bridge
#
# The testdata has no partsupp table; the spec queries that need one
# (Q2/Q9/Q11/Q16/Q20/Q21) run against a deterministic surrogate derived
# from lineitem: one row per observed (partkey, suppkey) pair with
#   ps_supplycost = min(l_extendedprice)  (exact decimal)
#   ps_availqty   = sum(l_quantity)       (exact decimal)
# Both engines build the identical bridge, so hashes stay exact.
# ---------------------------------------------------------------------------

_PS_SQL = """
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           min(CAST(l_extendedprice AS DECIMAL(12,2))) AS ps_supplycost,
           sum(CAST(l_quantity AS DECIMAL(12,2))) AS ps_availqty
    FROM lineitem
    GROUP BY 1, 2
"""


def _part_supp_bridge(
    spark: SparkSession,
    sf_dir: str,
    part_keys: DataFrame | None = None,
    supp_keys: DataFrame | None = None,
) -> DataFrame:
    """Surrogate partsupp from lineitem, with optional KEY-ATOMIC
    pushdown: `part_keys` (column `p_partkey`) / `supp_keys` (column
    `s_suppkey`) broadcast-semi-join lineitem BEFORE the aggregate, so
    the bridge shuffles only the rows its consumer will keep. Sound
    ONLY for filters keyed on partkey/suppkey — they drop whole
    (partkey, suppkey) groups, leaving every surviving group's
    min/sum untouched (the q9 window argument). A filter on any other
    lineitem column (shipdate, quantity, …) would CHANGE the
    surviving groups' aggregates and must never be pushed here."""
    li = load_table(spark, sf_dir, "lineitem")
    if part_keys is not None:
        li = li.join(
            F.broadcast(part_keys), li.l_partkey == part_keys.p_partkey, "left_semi"
        )
    if supp_keys is not None:
        li = li.join(
            F.broadcast(supp_keys), li.l_suppkey == supp_keys.s_suppkey, "left_semi"
        )
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.min(dec2("l_extendedprice")).alias("ps_supplycost"),
        F.sum(dec2("l_quantity")).alias("ps_availqty"),
    )


@query(
    "tpch_q2",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    eu AS (
        SELECT ps_partkey, ps_supplycost, s_suppkey, s_name, s_acctbal, n_name
        FROM ps
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    best AS (SELECT ps_partkey AS bk, min(ps_supplycost) AS m FROM eu GROUP BY 1)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           CAST(ps_supplycost AS DOUBLE) AS supplycost
    FROM part
    JOIN eu   ON p_partkey = ps_partkey
    JOIN best ON bk = ps_partkey AND ps_supplycost = m
    WHERE p_size = 15
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier: for each size-15 part, the EUROPE
    supplier(s) with the lowest surrogate supply cost.

    The spec's correlated `= (SELECT min ...)` decorrelates into a
    per-part min aggregate joined back on (partkey, cost-equality) —
    exact decimals make that equality deterministic. Plan: BOTH
    selective dims push below the bridge aggregate as key-atomic
    semi-joins (size-15 partkeys + EUROPE suppkeys — see
    _part_supp_bridge), so the bridge shuffles only rows the query
    keeps; bridge and its per-part min are co-partitioned on partkey
    (one shuffle, reused by both); part dim broadcasts last."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    ps = _part_supp_bridge(
        spark, sf_dir,
        part_keys=p.select("p_partkey"),
        supp_keys=s.select("s_suppkey"),
    )
    eu = ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
    best = eu.groupBy(F.col("ps_partkey").alias("bk")).agg(F.min("ps_supplycost").alias("m"))
    return (
        eu.join(best, (eu.ps_partkey == best.bk) & (eu.ps_supplycost == best.m))
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("ps_supplycost").cast("double").alias("supplycost"),
        )
    )


@query(
    "tpch_q9",
    oracle=f"""
    WITH ps AS ({_PS_SQL})
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))
                    - ps_supplycost * CAST(l_quantity AS DECIMAL(12,2)))
                AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN ps       ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, o_year
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit, with the surrogate bridge supplying
    ps_supplycost: profit = disc_price − supplycost·quantity, by
    supplier nation and order year. All-decimal arithmetic end to end.

    Plan: part (name-filtered) and supplier⋈nation broadcast; the
    bridge value ps_supplycost = min(extendedprice) per (partkey,
    suppkey) is computed as a WINDOW over the already-filtered
    lineitem instead of aggregating the full table and joining back.
    Sound because both filters drop (partkey, suppkey) groups
    atomically — p_name keys on partkey, the supplier join on suppkey
    — so the surviving group's min equals the unfiltered bridge's
    (verified value-identical vs the join form at sf0.01/sf0.1).
    Saves one full-lineitem aggregate + its shuffle AND shrinks the
    window input to the widget-filtered subset; at 100 TB that is the
    difference between shuffling lineitem twice and once. The
    orders⋈lineitem shuffle on orderkey is the one remaining wide
    exchange (1.58 s → 0.76 s at sf0.1)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    w = W.partitionBy("l_partkey", "l_suppkey")
    filtered = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .withColumn("ps_supplycost", F.min(dec2("l_extendedprice")).over(w))
    )
    profit = dec2("l_extendedprice") * dec2(1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * dec2("l_quantity")
    return (
        filtered.join(o, filtered.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


@query(
    "tpch_q11",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    scoped AS (
        SELECT ps_partkey, ps_supplycost * ps_availqty AS val
        FROM ps
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
    ),
    tot AS (SELECT sum(val) AS total FROM scoped)
    SELECT ps_partkey, CAST(sum(val) AS DOUBLE) AS value
    FROM scoped, tot
    GROUP BY ps_partkey, total
    HAVING sum(val) > total * CAST(0.001 AS DECIMAL(4,3))
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock: parts whose ASIA-held surrogate inventory
    value exceeds 0.1% of the regional total.

    The global total is a 1-row aggregate broadcast back over the
    per-part aggregate (the spec's scalar subquery, decorrelated);
    the 0.1% threshold multiplies exact decimals so the HAVING cut is
    bit-deterministic. Plan: the ASIA supplier set pushes below the
    bridge aggregate as a key-atomic semi-join (the bridge shuffles
    ~1/25 of lineitem), then one shuffle for the per-part rollup
    (both on partkey → AQE coalesces), broadcast for everything
    else."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    ps = _part_supp_bridge(spark, sf_dir, supp_keys=s)
    scoped = ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey).select(
        "ps_partkey", (F.col("ps_supplycost") * F.col("ps_availqty")).alias("val")
    )
    tot = scoped.agg(F.sum("val").alias("total"))
    return (
        scoped.groupBy("ps_partkey")
        .agg(F.sum("val").alias("__v"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("__v") > F.col("total") * F.lit("0.001").cast("decimal(4,3)"))
        .select("ps_partkey", F.col("__v").cast("double").alias("value"))
    )


@query(
    "tpch_q16",
    oracle=f"""
    WITH ps AS ({_PS_SQL})
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 parts/supplier relationship: distinct supplier counts per
    (brand, type, size) bucket, excluding flagged suppliers (the
    spec's complaint filter becomes negative account balance).

    The NOT IN set is tiny → broadcast left-anti join; the filtered
    part keys push BELOW the bridge aggregate as a key-atomic
    semi-join (see _part_supp_bridge) so the bridge shuffles only the
    selected parts' rows; count(DISTINCT) expands to the two-phase
    distinct aggregate on the already-partkey-partitioned stream."""
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    ps = _part_supp_bridge(spark, sf_dir, part_keys=p.select("p_partkey"))
    return (
        ps.join(F.broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q20",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    shipped AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               sum(CAST(l_quantity AS DECIMAL(12,2))) AS q96
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1, 2
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AFRICA'
      AND s_suppkey IN (
          SELECT ps_suppkey
          FROM ps
          JOIN part    ON p_partkey = ps_partkey AND p_name LIKE 'small%'
          JOIN shipped ON pk = ps_partkey AND sk = ps_suppkey
          WHERE ps_availqty > CAST(0.5 AS DECIMAL(2,1)) * q96
      )
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 potential part promotion: AFRICA suppliers holding surrogate
    inventory of 'small…' parts above half of what they shipped in
    1996.

    The spec's nested correlated IN chain decorrelates into two
    co-keyed aggregates (bridge + 1996 shipments, both on
    partkey/suppkey — one exchange feeds both) joined with the
    half-comparison as an exact-decimal residual, then a left-semi
    into the supplier dim. Nothing quadratic, nothing correlated at
    runtime. The 'small%' part keys push below the bridge aggregate
    (key-atomic semi-join, see _part_supp_bridge)."""
    li = load_table(spark, sf_dir, "lineitem")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.sum(dec2("l_quantity")).alias("q96"))
    )
    small = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    ps = _part_supp_bridge(spark, sf_dir, part_keys=small)
    candidates = (
        ps.join(F.broadcast(small), F.col("ps_partkey") == F.col("p_partkey"))
        .join(shipped, (F.col("ps_partkey") == F.col("pk")) & (F.col("ps_suppkey") == F.col("sk")))
        .filter(F.col("ps_availqty") > F.lit("0.5").cast("decimal(2,1)") * F.col("q96"))
        .select("ps_suppkey")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        s.join(candidates, s.s_suppkey == candidates.ps_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .distinct()
    )


@query(
    "tpch_q21",
    oracle="""
    WITH lo AS (
        SELECT l_orderkey, l_suppkey,
               l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
    ),
    per_order AS (
        SELECT l_orderkey AS ok,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
               CAST(count(DISTINCT CASE WHEN late THEN l_suppkey END) AS BIGINT)
                   AS n_late
        FROM lo
        GROUP BY 1
    )
    SELECT s_name, count(*) AS numwait
    FROM lo
    JOIN per_order ON ok = l_orderkey
    JOIN supplier  ON s_suppkey = l_suppkey
    JOIN nation    ON s_nationkey = n_nationkey
    JOIN region    ON n_regionkey = r_regionkey
    WHERE late AND n_supp >= 2 AND n_late = 1 AND r_name = 'ASIA'
    GROUP BY s_name
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting: ASIA suppliers whose
    line was the ONLY late one on a multi-supplier finalized order
    ("late" per the shared shipdate-lateness adaptation, tpch_q4).

    The spec's EXISTS/NOT-EXISTS pair decorrelates into per-order
    distinct-supplier counts computed as collect_set WINDOWS over one
    orderkey partitioning — the earlier groupBy-and-join-back form
    materialized the lineitem⋈orders join twice and shuffled twice
    (0.97 → 0.71 s at sf0.1, value-identical). count_distinct is not
    a window function; size(collect_set(...)) is its window spelling,
    and the set is bounded by suppliers-per-order (single digits at
    any scale), so window state stays tiny even on a hot order."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("late"),
    )
    w = W.partitionBy("l_orderkey")
    lo = lo.withColumn(
        "n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "n_late",
        F.size(F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)),
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    return (
        lo.filter(F.col("late") & (F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
