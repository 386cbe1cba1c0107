"""Property-based tests (hypothesis) for the reference-parity
transforms — SURVEY.md §5.2: arbitrary float/int inputs through
clean_numeric / normalize_schema / dedup invariants."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from parquet_to_hyper_app_spark.operators.cleaning import clean_numeric, normalize_schema

finite_or_weird = st.one_of(
    st.floats(allow_nan=True, allow_infinity=True, width=64),
    st.none(),
)
ints_or_none = st.one_of(st.integers(min_value=-(2**62), max_value=2**62), st.none())

_SCHEMA = T.StructType(
    [
        T.StructField("f", T.DoubleType()),
        T.StructField("i", T.LongType()),
    ]
)


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=st.lists(st.tuples(finite_or_weird, ints_or_none), min_size=0, max_size=30))
def test_clean_numeric_never_leaves_bad_values(_spark, rows):
    df = _spark.createDataFrame(rows, _SCHEMA)
    out = clean_numeric(df).collect()
    assert len(out) == len(rows)
    for r in out:
        assert r.f is not None and not math.isnan(r.f) and not math.isinf(r.f)
        assert r.i is not None
    # finite inputs pass through untouched (paired by sorted ordering)
    finite_in = sorted(v for v, _ in rows if v is not None and math.isfinite(v))
    kept = sorted(r.f for r in out if r.f != 0.0)
    for v in kept:
        assert v in finite_in


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=st.lists(st.tuples(finite_or_weird, ints_or_none), min_size=1, max_size=20))
def test_clean_then_normalize_idempotent(_spark, rows):
    df = _spark.createDataFrame(rows, _SCHEMA)
    once = normalize_schema(clean_numeric(df))
    twice = normalize_schema(clean_numeric(once))
    assert once.schema == twice.schema
    assert sorted(map(str, once.collect())) == sorted(map(str, twice.collect()))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=40), min_size=1, max_size=15))
def test_dedup_exact_unique_hashes(_spark, texts):
    from parquet_to_hyper_app_spark.operators.llm.dedup import dedup_exact_df

    rows = [(i, t) for i, t in enumerate(texts)]
    df = _spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_exact_df(df).collect()
    hashes = [r.content_hash for r in out]
    assert len(hashes) == len(set(hashes))  # unique post-dedup
    assert len(out) == len(set(texts))  # one survivor per distinct text
    survivors = {r.text: r.doc_id for r in out}
    for text, doc_id in survivors.items():
        assert doc_id == min(i for i, t in rows if t == text)
