"""Pins the cross-engine md5-60bit hash that every promoted LSH/IVF
oracle rests on: Spark's conv(substr(md5…)), DuckDB's hex cast, and
Python's hashlib must agree on EVERY string, or the five hash-oracled
dedup/similarity keys silently diverge.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_to_hyper_app_spark.functions.crosshash import (
    HASH60_DUCK,
    HASH60_SPARK,
    hash60_const,
    rademacher_entry,
)

#: shapes that have bitten real engines: empty, whitespace runs,
#: unicode (incl. astral), long runs, control chars, hex-like text
_EDGE_STRINGS = [
    "",
    " ",
    "\t\n",
    "a b c",
    "naïve café",
    "日本語 テスト",
    "🚀🚀",
    "x" * 4096,
    "0x7fffffffffffffff",
    "minhash-perm-0",
]


@given(st.text(max_size=64))
@settings(max_examples=200, deadline=None)
def test_python_vs_duckdb_hash60(s):
    duck = duckdb.execute(
        f"SELECT {HASH60_DUCK.format(col='?')}", [s]
    ).fetchone()[0]
    assert duck == hash60_const(s)


def test_hash60_range_and_determinism():
    for s in _EDGE_STRINGS:
        h = hash60_const(s)
        assert 0 <= h < 1 << 60
        assert h == hash60_const(s)
    # Rademacher entries are exactly ±1.0 and hash-stable
    assert {rademacher_entry(f"k-{i}") for i in range(64)} == {1.0, -1.0}


@pytest.mark.usefixtures("spark")
def test_spark_vs_python_hash60(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,) for s in _EDGE_STRINGS], ["s"])
    rows = df.selectExpr("s", f"{HASH60_SPARK.format(col='s')} AS h").collect()
    assert rows, "edge-string frame must not be empty"
    for r in rows:
        assert r.h == hash60_const(r.s), r.s
