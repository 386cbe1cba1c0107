"""Unit tests for relational-surface semantics the oracle can't pin."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_to_hyper_app_spark.catalog import load_table
from parquet_to_hyper_app_spark.operators.relational import (
    agg_approx_distinct,
    join_range,
)
from tests.conftest import SF_SMOKE


def test_approx_distinct_error(spark):
    """The hash-checked boolean must be TRUE, the exact half must agree
    with an independently computed count, and the raw HLL++ estimate
    (recomputed here, not in the query output) must meet the tighter
    2%-rsd-scale bound the 5% driver boolean relaxes."""
    rows = agg_approx_distinct(spark, SF_SMOKE).collect()
    li = load_table(spark, SF_SMOKE, "lineitem")
    exact = {
        r.l_returnflag: r.d
        for r in li.groupBy("l_returnflag").agg(F.countDistinct("l_partkey").alias("d")).collect()
    }
    approx = {
        r.l_returnflag: r.a
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", rsd=0.02).alias("a"))
        .collect()
    }
    for r in rows:
        assert r.approx_within_5pct, r
        assert r.exact_parts == exact[r.l_returnflag]
    for k, e in exact.items():
        assert abs(approx[k] - e) / e < 0.05, (k, approx[k], e)


def test_approx_percentile_audit(spark):
    """The hash-checked booleans must be TRUE and the exact columns
    must be actual data values of the group (nearest-rank, ordered)."""
    from parquet_to_hyper_app_spark.operators.sql_surface import agg_approx_percentile

    rows = agg_approx_percentile(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.p50_within_1pct, r
        assert r.p90_within_1pct, r
        assert r.exact_p50 <= r.exact_p90


def test_histogram_degenerate_range_matches_oracle(spark, tmp_path):
    """An all-equal column makes hi == lo: Spark would NULL the bucket
    (0/0) while DuckDB yields inf/NaN — both sides must instead map the
    degenerate distribution to one bucket 0 (cross-engine differential
    on a constant-column fixture)."""
    import duckdb

    from parquet_to_hyper_app_spark.registry import load_all

    spec = load_all()["agg_histogram"]
    spark.createDataFrame([(42.5,)] * 7, "l_extendedprice double").write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    rows = spec.fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.bucket == 0 and r.n == 7
    assert r.bucket_lo == r.bucket_hi == 42.5
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{tmp_path}/lineitem.parquet/*.parquet')"
    )
    oracle = con.execute(spec.oracle).fetchall()
    assert len(oracle) == 1
    assert (r.bucket, r.bucket_lo, r.bucket_hi, r.n) == oracle[0]


def test_range_join_matches_naive(spark):
    """Bucketed range join == naive O(n²) non-equi join on a sample."""
    got = {(r.a_id, r.b_id) for r in join_range(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "ts")
    a = ev.select(F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts"))
    b = ev.select(F.col("event_id").alias("b_id"), F.col("ts").alias("b_ts"))
    naive = a.join(
        b,
        (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") < F.col("a_ts") + F.expr("INTERVAL 1 MINUTE"))
        & (F.col("a_id") != F.col("b_id")),
    )
    expected = {(r.a_id, r.b_id) for r in naive.collect()}
    assert got == expected


def test_broadcast_in_multiway_plan(spark):
    """nation/region joins must plan as broadcast (no shuffle for dims)."""
    from parquet_to_hyper_app_spark.operators.relational import join_multiway

    plan = join_multiway(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_sort_limit_is_take_ordered(spark):
    from parquet_to_hyper_app_spark.operators.relational import sort_limit

    plan = sort_limit(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_filter_project_pushdown(spark):
    from parquet_to_hyper_app_spark.operators.relational import filter_project

    plan = filter_project(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull(l_quantity)" in plan
    # column pruning: only the 4 projected columns reach the scan
    assert "l_tax" not in plan.split("ReadSchema")[1][:400]


def test_bridge_pushdown_is_key_atomic(spark):
    """The partsupp bridge's part/supp pushdown must produce EXACTLY
    the rows of the unfiltered bridge restricted to those keys — the
    semi-join drops whole (partkey, suppkey) groups, never rows within
    a surviving group, so every surviving group's min/sum is
    untouched. Guards the _part_supp_bridge contract that q2/q11/q16/
    q20 (and q9's window form) rely on."""
    from pyspark.sql import functions as F

    from parquet_to_hyper_app_spark.operators.tpch import _part_supp_bridge

    full = _part_supp_bridge(spark, SF_SMOKE).cache()
    part_keys = (
        full.select(F.col("ps_partkey").alias("p_partkey")).distinct().limit(7)
    )
    supp_keys = (
        full.select(F.col("ps_suppkey").alias("s_suppkey")).distinct().limit(3)
    )
    pushed = _part_supp_bridge(
        spark, SF_SMOKE, part_keys=part_keys, supp_keys=supp_keys
    )
    restricted = full.join(
        F.broadcast(part_keys), full.ps_partkey == part_keys.p_partkey, "left_semi"
    ).join(F.broadcast(supp_keys), full.ps_suppkey == supp_keys.s_suppkey, "left_semi")
    a = sorted(map(tuple, pushed.collect()))
    b = sorted(map(tuple, restricted.collect()))
    assert a == b and len(a) > 0
    full.unpersist()


def test_asof_nearest_tie_prefers_earlier_date(spark, tmp_path):
    """An event exactly equidistant between a before- and an
    after-order must pick the EARLIER order date (then smaller key);
    out-of-tolerance events fall back to NULL."""
    import datetime as dt

    from parquet_to_hyper_app_spark.operators.relational import join_asof_nearest

    t0 = dt.datetime(2024, 6, 15, 12, 0, 0)
    day = dt.timedelta(days=1)
    events = [(1, 10, t0), (2, 10, t0 + dt.timedelta(days=200)), (3, 11, t0)]
    orders = [
        (100, 10, t0 - 2 * day),  # 2 days before event 1
        (101, 10, t0 + 2 * day),  # 2 days after — exact tie
        (102, 11, t0 + day),  # nearest for event 3 (1 day after)
        (103, 11, t0 - 2 * day),
    ]
    spark.createDataFrame(
        events, "event_id long, user_id long, ts timestamp_ntz"
    ).write.parquet(str(tmp_path / "events.parquet"))
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderdate timestamp_ntz"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    out = {r.event_id: r for r in join_asof_nearest(spark, str(tmp_path)).collect()}
    assert out[1].o_orderkey == 100  # tie → earlier date wins
    assert out[2].o_orderkey is None  # nothing within ±30 days
    assert out[3].o_orderkey == 102  # genuinely nearest, forward side
