"""Regression pins for the dirty-data semantics the fuzz sweep found.

tools/fuzz_data.py's full adversarial parity sweep (all 144 keys × both
profiles) is the heavyweight gate; these tests pin the individual
cross-engine rules cheaply so a regression fails CI without the sweep:

- per-key z-score statistics run over FINITE values only;
- the stateful-profile cents fold degrades NaN/±Inf/NULL/overflow to
  "skipped" (TRY_CAST semantics) instead of crashing or clamping;
- min_by/max_by arg picks exclude rows whose ordering value is NULL
  (Spark sorts NULL struct fields first; DuckDB's arg_min skips them);
- distribution windows pin NULLS LAST so both engines rank alike.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest


class _FakeState:
    """Minimal GroupState stand-in for driving _update_profile."""

    def __init__(self):
        self.exists = False
        self.value = None

    @property
    def get(self):
        return self.value

    def update(self, v):
        self.value = v
        self.exists = True


def test_stateful_cents_fold_skips_nonfinite_like_try_cast():
    from parquet_to_hyper_app_spark.streaming.stateful import _update_profile

    pdf = pd.DataFrame(
        {
            "user_id": [1] * 6,
            "value": [1.25, float("nan"), float("inf"), None, -2.50, 1e12],
            "ts": pd.to_datetime(["2024-01-01"] * 6),
        }
    )
    state = _FakeState()
    [out] = list(_update_profile((1,), iter([pdf]), state))
    # count(*) counts every row; the sum keeps only the DECIMAL(12,2)
    # domain: 1.25 - 2.50 (1e12 overflows 10 integer digits)
    assert out["n_events"].iat[0] == 6
    assert out["total_value"].iat[0] == pytest.approx(-1.25)


def test_stateful_cents_fold_rounds_half_away_from_zero():
    from parquet_to_hyper_app_spark.streaming.stateful import _update_profile

    # 2.675 is NOT representable exactly; use values whose double IS an
    # exact half-cent so the rounding mode is actually exercised
    pdf = pd.DataFrame(
        {
            "user_id": [1, 1],
            "value": [0.125, -0.125],  # exact doubles: ±12.5 cents
            "ts": pd.to_datetime(["2024-01-01"] * 2),
        }
    )
    state = _FakeState()
    [out] = list(_update_profile((1,), iter([pdf]), state))
    # HALF_UP: +12.5 → 13, −12.5 → −13 (banker's would give ±12 → 0.24)
    assert out["total_value"].iat[0] == pytest.approx(0.0)
    state2 = _FakeState()
    pdf_pos = pdf[pdf["value"] > 0]
    [out2] = list(_update_profile((1,), iter([pdf_pos]), state2))
    assert out2["total_value"].iat[0] == pytest.approx(0.13)


def test_zscore_group_masks_nonfinite_rows():
    from parquet_to_hyper_app_spark.functions.udfs import _zscore_group

    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5],
            "user_id": [7] * 5,
            "value": [1.0, 2.0, 3.0, float("inf"), None],
        }
    )
    out = _zscore_group(pdf)
    z = out["zscore"].to_numpy()
    # finite rows get the z-score of the FINITE population (mean 2, sd 1)
    assert z[0] == pytest.approx(-1.0)
    assert z[1] == pytest.approx(0.0)
    assert z[2] == pytest.approx(1.0)
    # non-finite / null rows yield NaN (normalized to SQL NULL upstream)
    assert math.isnan(z[3]) and math.isnan(z[4])


def test_zscore_group_all_nonfinite_or_constant_is_null():
    from parquet_to_hyper_app_spark.functions.udfs import _zscore_group

    const = pd.DataFrame(
        {"event_id": [1, 2], "user_id": [1, 1], "value": [5.0, 5.0]}
    )
    assert _zscore_group(const)["zscore"].isna().all()
    dirty = pd.DataFrame(
        {"event_id": [1, 2], "user_id": [1, 1], "value": [float("inf"), None]}
    )
    assert _zscore_group(dirty)["zscore"].isna().all()


def test_argminmax_filters_null_ordering_values(spark, tmp_path):
    """min_by over a struct with a NULL field picks the null row in
    Spark (null struct fields sort FIRST) — the query must exclude it,
    matching DuckDB arg_min. Driven through the registry fn on a tiny
    orders table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_to_hyper_app_spark.registry import load_all

    tbl = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_custkey": pa.array([1, 1, 1, 1], pa.int64()),
            "o_orderstatus": pa.array(["F", "F", "F", "F"]),
            "o_totalprice": pa.array([10.0, None, 5.0, 20.0]),
            "o_orderdate": pa.array([0] * 4, pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 4),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    fn = load_all()["sql_argminmax"].fn
    [row] = fn(spark, str(tmp_path)).collect()
    assert row["smallest_order"] == 3  # NOT orderkey 2 (null price)
    assert row["biggest_order"] == 4
    assert row["min_price"] == 5.0 and row["max_price"] == 20.0


def test_window_distribution_nulls_rank_last(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_to_hyper_app_spark.registry import load_all

    tbl = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([1, 1, 1], pa.int64()),
            "o_orderstatus": pa.array(["F"] * 3),
            "o_totalprice": pa.array([None, 10.0, 20.0]),
            "o_orderdate": pa.array([0] * 3, pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 3),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    fn = load_all()["window_distribution"].fn
    got = {r["o_orderkey"]: r["pct_rank"] for r in fn(spark, str(tmp_path)).collect()}
    # null price ranks LAST (pct_rank 1.0), not first
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(0.0)
    assert got[3] == pytest.approx(0.5)


def test_incremental_agg_cents_expr_degrades_specials(spark):
    """The batch cents expression must NULL NaN/Inf (decimal-first),
    never clamp Inf to Long.MaxValue via a raw double→long cast."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1.25,), (float("inf"),), (float("nan"),), (None,)], "value double"
    )
    cents = df.select(
        (F.col("value").cast("decimal(12,2)") * 100).cast("long").alias("c")
    ).collect()
    assert [r["c"] for r in cents] == [125, None, None, None]


def test_vocab_coverage_empty_corpus_matches_left_join_oracle(spark, tmp_path):
    """A corpus with zero tokens (every doc NULL/empty/whitespace) must
    still emit one row per vocab size — the oracle's LEFT JOIN shape —
    with n_types = n_occurrences = 0 and NULL coverage, not 0 rows from
    an inner join against the empty cumulative table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_to_hyper_app_spark.registry import load_all

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "lang": pa.array(["en", "en", "de"]),
            "source": pa.array(["a", "a", "b"]),
            "text": pa.array([None, "", "   \t\n  "]),
            "n_chars": pa.array([0, 0, 7], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    fn = load_all()["text_vocab_coverage"].fn
    rows = {r["vocab_size"]: r for r in fn(spark, str(tmp_path)).collect()}
    assert sorted(rows) == [100, 1000, 10000]
    for r in rows.values():
        assert r["n_types"] == 0
        assert r["n_occurrences"] == 0
        assert r["coverage"] is None


def test_ws_class_agrees_across_engines(spark):
    """The WS tokenizer class must read identically in Java (Spark),
    RE2 (DuckDB), and Python re — the three engines' `\\s` classes all
    disagree (Java adds \\x0B over RE2; Python adds Unicode spaces),
    which is exactly why tokenizers spell the class out. Exercises the
    divergence characters directly: vertical tab, NBSP, line/paragraph
    separators."""
    import re

    import duckdb

    from parquet_to_hyper_app_spark.functions.crosshash import WS

    hostile = [
        "a\x0bb",          # vertical tab: Java \s yes, RE2 \s no
        "a b",        # NBSP: Python \s yes, Java/RE2 no
        "a b  ", # line/paragraph separators (Python \s)
        " lead trail ",
        "\t\n\f\r\x0b",    # all contract whitespace, nothing else
        "mixed \x0b \t x",
        "",
    ]

    def py_tokens(t):
        return [w for w in re.split(WS + "+", t) if w]

    sdf = spark.createDataFrame([(t,) for t in hostile], "text string")
    from pyspark.sql import functions as F

    spark_rows = sdf.select(
        F.filter(F.split("text", WS + "+"), lambda x: x != "").alias("tk")
    ).collect()
    spark_tokens = [r["tk"] for r in spark_rows]

    con = duckdb.connect()
    duck_tokens = [
        con.execute(
            f"SELECT list_filter(regexp_split_to_array(?, '{WS}+'), t -> t <> '')",
            [t],
        ).fetchone()[0]
        for t in hostile
    ]

    for t, st, dt in zip(hostile, spark_tokens, duck_tokens):
        assert st == dt == py_tokens(t), (repr(t), st, dt, py_tokens(t))


def test_stateful_cents_fold_rounds_half_cents_like_decimal_cast():
    """Half-cent doubles must round like the engines' double→DECIMAL
    cast (shortest decimal repr, half away from zero): 1.005 → 1.01,
    not the 1.00 that floor(|v|·100 + 0.5) produces on the binary
    double 100.4999…."""
    from parquet_to_hyper_app_spark.streaming.stateful import _update_profile

    pdf = pd.DataFrame(
        {
            "user_id": [1] * 4,
            "value": [1.005, 2.675, -1.005, 0.01],
            "ts": pd.to_datetime(["2024-01-01"] * 4),
        }
    )
    state = _FakeState()
    [out] = list(_update_profile((1,), iter([pdf]), state))
    # 1.01 + 2.68 - 1.01 + 0.01
    assert out["total_value"].iat[0] == pytest.approx(2.69)


def test_stateful_cents_fold_survives_huge_magnitudes():
    """|v| >= ~1e26 used to kill the whole streaming query: above 2^53
    the scaled fraction test flags EVERY value as a half-cent boundary
    and Decimal(repr(x)).scaleb(2).quantize overflows the default
    28-digit context (InvalidOperation — advice r6). Out-of-domain
    magnitudes must degrade to dropped-from-sum like any other
    DECIMAL(12,2) overflow, never raise."""
    from parquet_to_hyper_app_spark.streaming.stateful import (
        _cents_half_up,
        _update_profile,
    )

    # the direct repro from the advice: must not raise
    out = _cents_half_up(np.array([1e30, -1e26, 1.7e308]))
    assert (np.abs(out) > 999_999_999_999).all()

    pdf = pd.DataFrame(
        {
            "user_id": [1] * 4,
            "value": [1e30, -1e26, 1.7e308, 1.25],
            "ts": pd.to_datetime(["2024-01-01"] * 4),
        }
    )
    state = _FakeState()
    [res] = list(_update_profile((1,), iter([pdf]), state))
    assert res["n_events"].iat[0] == 4
    assert res["total_value"].iat[0] == pytest.approx(1.25)

    # boundary value just inside the exact-path window still rounds
    # through Decimal and then drops on the DECIMAL(12,2) filter
    state2 = _FakeState()
    pdf2 = pd.DataFrame(
        {
            "user_id": [1, 1],
            "value": [9999999999.995, 0.125],
            "ts": pd.to_datetime(["2024-01-01"] * 2),
        }
    )
    [res2] = list(_update_profile((1,), iter([pdf2]), state2))
    assert res2["total_value"].iat[0] == pytest.approx(0.13)


def test_stateful_last_seen_survives_all_nat_chunk():
    """An all-NULL-ts chunk must not poison last_seen: max(NaT, ts) is
    NaT forever because NaT comparisons are always False."""
    from parquet_to_hyper_app_spark.streaming.stateful import _update_profile

    nat_chunk = pd.DataFrame(
        {
            "user_id": [1, 1],
            "value": [1.0, 2.0],
            "ts": pd.to_datetime([None, None]),
        }
    )
    real_chunk = pd.DataFrame(
        {
            "user_id": [1],
            "value": [3.0],
            "ts": pd.to_datetime(["2024-06-01"]),
        }
    )
    state = _FakeState()
    [out] = list(_update_profile((1,), iter([nat_chunk, real_chunk]), state))
    assert out["n_events"].iat[0] == 3
    assert out["last_seen"].iat[0] == pd.Timestamp("2024-06-01")


def test_dirty_panel_rejects_dims_that_would_shear_the_dyadic_plant():
    """ADVICE r14: the dirty dyadic-tie plant writes 4 leading
    components into rows[9]; with dim < 4 the row would silently
    become a length-4 ragged row and the panel would fuzz a different
    contract.  The generator must refuse (assert) instead of shearing,
    and must still produce a uniform dyadic row at the dim == 4
    boundary."""
    from tools.fuzz_data import embeddings_table

    rng = np.random.default_rng(269)
    with pytest.raises(AssertionError, match="dim >= 4"):
        embeddings_table(rng, 150, 3, True)

    tbl = embeddings_table(np.random.default_rng(269), 150, 4, True)
    vecs = tbl.column("embedding").to_pylist()
    assert vecs[9] == [0.5078125, -0.5078125, 2.5078125, -2.5078125]
    # the deliberate ragged/undefined plants are rows 7, 8, 10 — every
    # OTHER defined row keeps the declared dimensionality
    for i, v in enumerate(vecs):
        if i in (7, 8, 10) or v is None:
            continue
        assert len(v) == 4, f"row {i} sheared to {len(v)}"
