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
@given(
    events=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 1000)), min_size=1, max_size=25
    ),
    orders=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 1000)), min_size=0, max_size=25
    ),
)
def test_asof_join_matches_naive(_spark, events, orders):
    """The max-struct as-of formulation must equal the per-row naive
    reference (latest order at/before each event for the same user,
    orderkey as the tie-break) on arbitrary key/time layouts —
    including duplicate timestamps, users with no orders, and orders
    after every event."""
    import datetime as dt

    from parquet_to_hyper_app_spark.operators.relational import asof_join_df

    base = dt.datetime(2024, 1, 1)
    ev_rows = [
        (i, user, base + dt.timedelta(minutes=m)) for i, (user, m) in enumerate(events)
    ]
    ord_rows = [
        (user, 1000 + i, base + dt.timedelta(minutes=m))
        for i, (user, m) in enumerate(orders)
    ]
    ev = _spark.createDataFrame(ev_rows, "event_id long, user_id long, ts timestamp_ntz")
    od = _spark.createDataFrame(
        ord_rows, "o_custkey long, o_orderkey long, o_orderdate timestamp_ntz"
    )
    got = {
        r.event_id: (r.o_orderkey, r.o_orderdate)
        for r in asof_join_df(ev, od).collect()
    }
    for eid, user, ts in ev_rows:
        cand = [(d, k) for (u, k, d) in ord_rows if u == user and d <= ts]
        want = max(cand) if cand else None
        if want is None:
            assert got[eid] == (None, None), (eid, got[eid])
        else:
            assert got[eid] == (want[1], want[0]), (eid, got[eid], want)
    assert len(got) == len(ev_rows)  # exactly one output row per event
    # tolerance variant: same reference with the staleness band applied
    tol = dt.timedelta(minutes=100)
    got_tol = {
        r.event_id: (r.o_orderkey, r.o_orderdate)
        for r in asof_join_df(ev, od, tolerance="INTERVAL 100 MINUTES").collect()
    }
    for eid, user, ts in ev_rows:
        cand = [
            (d, k) for (u, k, d) in ord_rows if u == user and ts - tol <= d <= ts
        ]
        want = max(cand) if cand else None
        assert got_tol[eid] == ((want[1], want[0]) if want else (None, None)), eid


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3000)), min_size=1, max_size=25
    ),
    gap_minutes=st.integers(1, 60),
)
def test_sessionize_matches_naive(_spark, events, gap_minutes):
    """Gap-based session numbering must equal the obvious sequential
    reference: sort each user's events, break when the gap exceeds the
    threshold, count strictly-greater gaps only (gap == threshold stays
    in-session)."""
    import datetime as dt
    from collections import defaultdict

    from parquet_to_hyper_app_spark.operators.llm.sessionize import sessionized

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, user, base + dt.timedelta(minutes=m)) for i, (user, m) in enumerate(events)
    ]
    df = _spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp_ntz")
    got = {
        r.event_id: (r.user_id, r.session_id)
        for r in sessionized(df, gap_seconds=gap_minutes * 60).collect()
    }
    per_user = defaultdict(list)
    for eid, user, ts in rows:
        per_user[user].append((ts, eid))
    for user, evs in per_user.items():
        evs.sort()
        sid = 0
        prev = None
        for ts, eid in evs:
            if prev is None or (ts - prev).total_seconds() > gap_minutes * 60:
                sid += 1
            prev = ts
            assert got[eid] == (user, sid), (eid, got[eid], (user, sid))


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


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30), min_size=2, max_size=12
    )
)
def test_ngram_jaccard_pairs_match_bruteforce(_spark, texts):
    """The asymmetric PPJoin prefix filter (r5) must be LOSSLESS: the
    mined pair set equals the exhaustive all-pairs J >= 0.5 result on
    arbitrary corpora — tiny alphabet forces heavy shingle collisions,
    the adversarial regime for prefix pruning."""
    import re

    from parquet_to_hyper_app_spark.operators.llm.dedup import ngram_jaccard_pairs

    def bigrams(text):
        toks = [t for t in re.split(r"\s+", text.lower().strip()) if t != ""]
        if not toks:
            return None  # whitespace-only/empty docs never pair
        if len(toks) == 1:
            return {f"{toks[0]} "}  # concat_ws over a missing 2nd token
        return {f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)}

    grams = {i: bigrams(t) for i, t in enumerate(texts)}
    expect = set()
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            ga, gb = grams[a], grams[b]
            if not ga or not gb:
                continue
            j = len(ga & gb) / len(ga | gb)
            if j >= 0.5:
                expect.add((a, b))

    rows = [(i, t, "en") for i, t in enumerate(texts)]
    df = _spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(df).collect()}
    assert got == expect, (sorted(got - expect), sorted(expect - got))


@settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    v=st.one_of(
        st.floats(min_value=-1e10, max_value=1e10, allow_nan=False),
        # the half-cent boundary family the fast path must hand off
        st.integers(min_value=-10_000_00, max_value=10_000_00).map(
            lambda c: c / 100.0 + 0.005
        ),
        # out-of-domain magnitudes: must never raise (advice r6 - the
        # Decimal re-round overflowed its context above ~1e26)
        st.floats(min_value=1e10, max_value=1.7e308, allow_nan=False),
        st.floats(min_value=-1.7e308, max_value=-1e10, allow_nan=False),
    )
)
def test_cents_half_up_matches_decimal_reference(v):
    """_cents_half_up must agree with the engines' double->DECIMAL cast
    (round the shortest decimal repr half away from zero) everywhere in
    the DECIMAL(12,2) domain, and degrade (not raise) outside it."""
    import decimal as _d

    import numpy as np

    from parquet_to_hyper_app_spark.streaming.stateful import _cents_half_up

    (got,) = _cents_half_up(np.array([v], dtype="float64"))
    if abs(v) * 100.0 > 1e12 + 1.0:
        # out of domain: any value that the caller's cents filter drops
        assert abs(got) > 999_999_999_999
        return
    with _d.localcontext(prec=60):
        want = float(
            _d.Decimal(repr(float(v))).scaleb(2).quantize(_d.Decimal(1), _d.ROUND_HALF_UP)
        )
    assert got == want, (v, got, want)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    data=st.data(),
    shared_extra=st.integers(min_value=0, max_value=4),
)
def test_winnowing_shared_run_guarantee(_spark, data, shared_extra):
    """Property (Schleimer et al. 2003, thm 1): two documents sharing a
    token run of length >= k + w - 1 ALWAYS share a fingerprint,
    wherever the run sits and whatever surrounds it; and a doc's
    fingerprint count never exceeds its gram count."""
    import os
    import tempfile

    from parquet_to_hyper_app_spark.operators.llm.corpus import (
        _WIN_K,
        _WIN_W,
        text_winnowing,
    )

    alphabet = [f"t{i}" for i in range(12)]
    run_len = _WIN_K + _WIN_W - 1 + shared_extra
    run = data.draw(
        st.lists(st.sampled_from(alphabet), min_size=run_len, max_size=run_len)
    )
    pad = st.lists(st.sampled_from(alphabet), min_size=0, max_size=10)
    doc1 = data.draw(pad) + run + data.draw(pad)
    doc2 = data.draw(pad) + run + data.draw(pad)
    rows = [
        (1, " ".join(doc1), "en", "s", 1),
        (2, " ".join(doc2), "en", "s", 1),
    ]
    with tempfile.TemporaryDirectory() as d:
        _spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = text_winnowing(_spark, d).collect()
    fps: dict[int, set] = {1: set(), 2: set()}
    for r in out:
        fps[r.doc_id].add(r.fp)
    assert fps[1] & fps[2], (doc1, doc2)
    for doc_id, doc in ((1, doc1), (2, doc2)):
        n_grams = max(len(doc) - _WIN_K + 1, 0)
        assert 1 <= len(fps[doc_id]) <= n_grams


# arbitrary doubles INCLUDING NaN/Inf and magnitude extremes: the
# scale-path assignment must agree with the exact sequential-fold
# contract on every input, not just the clean corpus
_vec_el = st.one_of(
    st.floats(allow_nan=True, allow_infinity=True, width=64),
    st.floats(min_value=-1e9, max_value=1e9),
    st.sampled_from([0.0, 1.0, -1.0, 0.5, 1e8, -1e8]),
)


@settings(max_examples=200, deadline=None)
@given(data=st.data())
def test_assign_ids_np_always_matches_exact_fold(data):
    """Property (r9 scale path): `_assign_ids_np`'s matmul prefilter +
    knife re-rank equals `_exact_assign_row`'s pure sequential fold for
    EVERY vector — ties, duplicated centroids, NaN/Inf components, and
    magnitude extremes included. This is the bit-equality claim the
    scale-k pandas UDF rests on, pinned without a SparkSession."""
    import numpy as np

    from parquet_to_hyper_app_spark.operators.llm.features import (
        _assign_ids_np,
        _exact_assign_row,
    )

    dim = data.draw(st.integers(min_value=1, max_value=6))
    k = data.draw(st.integers(min_value=1, max_value=5))
    n = data.draw(st.integers(min_value=1, max_value=8))
    cents = [
        [data.draw(_vec_el) for _ in range(dim)] for _ in range(k)
    ]
    if k >= 2 and data.draw(st.booleans()):
        cents[1] = list(cents[0])  # duplicated centroid: exact tie by design
    mats = np.array(
        [[data.draw(_vec_el) for _ in range(dim)] for _ in range(n)], dtype="float64"
    )
    got = _assign_ids_np(mats, cents).tolist()
    want = [_exact_assign_row(mats[i], cents) for i in range(n)]
    assert got == want, (mats.tolist(), cents)


@settings(max_examples=200, deadline=None)
@given(data=st.data())
def test_assign_ids_hier_full_probe_matches_exact_fold(data):
    """Property (r12 hier path): with nprobe = every coarse cell the
    routing is COMPLETE, so `_assign_ids_hier`'s cell-loop merge +
    candidate knife + artifact fallback must equal the pure sequential
    exact fold for EVERY vector — ties, duplicated centroids, NaN/Inf
    components, magnitude extremes, and whatever cell structure
    `_coarse_route` builds over the drawn centroids. This isolates the
    merge/knife bookkeeping from routing recall (which is the separate,
    deliberately-approximate contract measured in SCALE.md); a second
    draw runs nprobe=1 and asserts only that results are valid ids —
    the pruned path must never crash or emit -1 on hostile input."""
    import numpy as np

    from parquet_to_hyper_app_spark.operators.llm.features import (
        _assign_ids_hier,
        _coarse_route,
        _exact_assign_row,
    )

    dim = data.draw(st.integers(min_value=1, max_value=6))
    k = data.draw(st.integers(min_value=1, max_value=7))
    n = data.draw(st.integers(min_value=1, max_value=8))
    cents = [
        [data.draw(_vec_el) for _ in range(dim)] for _ in range(k)
    ]
    if k >= 2 and data.draw(st.booleans()):
        cents[1] = list(cents[0])  # duplicated centroid: exact tie by design
    mats = np.array(
        [[data.draw(_vec_el) for _ in range(dim)] for _ in range(n)], dtype="float64"
    )
    coarse, members, npr = _coarse_route(cents, nprobe=k)  # ≥ ncells → full probe
    got = _assign_ids_hier(mats, cents, coarse, members, npr).tolist()
    want = [_exact_assign_row(mats[i], cents) for i in range(n)]
    assert got == want, (mats.tolist(), cents)
    coarse1, members1, npr1 = _coarse_route(cents, nprobe=1)
    pruned = _assign_ids_hier(mats, cents, coarse1, members1, npr1).tolist()
    assert all(0 <= j < k for j in pruned), (pruned, mats.tolist(), cents)
