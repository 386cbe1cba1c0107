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


def test_seq_cosine_matches_duckdb_sequential_fold():
    """Golden cross-engine pin for _seq_cosine — the shared helper both
    embedding dedup paths use for every EMITTED cosine. It lives
    outside the per-key source fingerprint (greens.py hashes only the
    registered function), so this test is the tripwire for edits to
    it: the value must equal DuckDB's list_sum left-to-right fold
    BIT-FOR-BIT at several magnitudes, including ill-conditioned
    near-parallel vectors where accumulation order matters most."""
    import random

    from parquet_to_hyper_app_spark.operators.llm.dedup import _seq_cosine

    rng = random.Random(7)
    con = duckdb.connect()

    def lit(vals):
        # each element as a QUOTED-string cast: DuckDB parses a bare
        # numeric literal as DECIMAL first (dropping low-order double
        # bits) while a varchar→DOUBLE cast is correctly rounded —
        # found when a repr()-literal list failed to round-trip
        return "[" + ",".join(f"'{x!r}'::DOUBLE" for x in vals) + "]"

    for scale in (1.0, 1e6, 1e-6, 1e8):
        ea = [rng.uniform(-1, 1) * scale for _ in range(64)]
        # near-parallel: eb = ea + tiny noise (cos ~ 1, cancellations)
        eb = [x + rng.uniform(-1e-7, 1e-7) * scale for x in ea]
        la, lb = lit(ea), lit(eb)
        back = con.execute(f"SELECT {la}, {lb}").fetchone()
        assert list(back[0]) == ea and list(back[1]) == eb, "literal round-trip"
        duck = con.execute(
            f"SELECT list_sum(list_transform(range(1, 65), i -> ({la})[i] * ({lb})[i]))"
            f" / (sqrt(list_sum(list_transform({la}, x -> x * x)))"
            f"    * sqrt(list_sum(list_transform({lb}, x -> x * x))))"
        ).fetchone()[0]
        got = _seq_cosine(ea, eb)
        assert got == duck, (scale, got, duck)
