"""Focused tests for sources/scanwidth.py (round-15 optimization).

The contract: `scan_spread` widens a row-group-limited scan with a
pinned-width deterministic hash repartition, and is the IDENTITY when
the scan is already at least 1/4 as wide as the cores (production
layouts) or when the input can't be inspected from the driver.
Results must be value-identical either way — the repartition is
placement-only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from parquet_to_hyper_app_spark.catalog import load_table
from parquet_to_hyper_app_spark.sources.scanwidth import (
    effective_scan_parallelism,
    scan_spread,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from parquet_to_hyper_app_spark.session import build_session

    s = build_session("test_scanwidth", cpus=4)
    yield s


def test_effective_parallelism_single_row_group(spark):
    # every driver testdata table is one parquet file with one row
    # group (verified with pyarrow this round) — the measured decode
    # parallelism must be 1, regardless of split-size configuration
    li = load_table(spark, SF, "lineitem")
    assert effective_scan_parallelism(li) == 1


def test_spread_widens_and_preserves_values(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    wide = scan_spread(li, "l_orderkey")
    # widened to the cores (gate fires: 1 * 4 <= 4)
    assert wide.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # placement-only: identical multiset of rows
    base = sorted(map(tuple, li.collect()))
    spread = sorted(map(tuple, wide.collect()))
    assert base == spread


def test_identity_when_scan_is_wide_enough(spark):
    # a 4-partition parquet dir on a 4-core session: eff(4)*4 > 4 cores
    import os
    import tempfile

    out = os.path.join(tempfile.gettempdir(), "p2h_scanwidth_wide")
    load_table(spark, SF, "lineitem").repartition(4).write.mode("overwrite").parquet(out)
    df = spark.read.parquet(out)
    assert effective_scan_parallelism(df) >= 4
    assert scan_spread(df, "l_orderkey") is df


def test_identity_on_non_file_source(spark):
    df = spark.range(10).withColumn("k", F.col("id") % 3)
    # no input files -> conservative identity (inputFiles returns [])
    assert scan_spread(df, "k").count() == 10
