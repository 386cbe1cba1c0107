"""Salted-join correctness: same results as a plain join on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_to_hyper_app_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # heavily skewed probe: 90% of rows share key 1
    probe = spark.range(1000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 5).alias("k"),
    )
    build = spark.createDataFrame(
        [(0, "zero"), (1, "one"), (2, "two"), (3, "three"), (4, "four")], "k long, label string"
    )
    plain = probe.join(build, "k").select("row_id", "k", "label")
    salted = salted_join(probe, build, "k", "row_id").select("row_id", "k", "label")
    assert sorted(map(str, plain.collect())) == sorted(map(str, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    probe = spark.createDataFrame([(1, 10), (2, 20), (99, 30)], "k long, row_id long")
    build = spark.createDataFrame([(1, "a"), (2, "b")], "k long, label string")
    out = salted_join(probe, build, "k", "row_id", how="left").collect()
    assert len(out) == 3
    assert {r.k: r.label for r in out}[99] is None


def test_hyper_sink_is_gated(spark):
    import pytest

    from parquet_to_hyper_app_spark.sources.convert import write_hyper

    try:
        import tableauhyperapi  # noqa: F401

        pytest.skip("tableauhyperapi installed; gate not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        write_hyper(spark.range(1), "/tmp/x.hyper")
