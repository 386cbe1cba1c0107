"""Streaming semantics tests (SURVEY.md §5.2): batch-vs-stream
equivalence — the same windowed aggregation must produce identical
results via the batch planner and via a file stream driven with
availableNow."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_to_hyper_app_spark.catalog import load_table
from parquet_to_hyper_app_spark.streaming.windows import (
    stream_session_window,
    stream_tumbling,
    stream_watermark_late,
)
from tests.conftest import SF_SMOKE


def _rows(df, cols):
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_stream_equals_batch_tumbling(spark):
    """The availableNow streaming run (complete-window subset) must be
    a value-exact subset of the batch tumbling aggregation."""
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    streamed = stream_watermark_late(spark, SF_SMOKE)
    b = dict(((str(r.window_start), r.event_type), r.n_events) for r in batch.collect())
    s = dict(((str(r.window_start), r.event_type), r.n_events) for r in streamed.collect())
    assert s, "stream emitted nothing"
    for k, v in s.items():
        assert b[k] == v, (k, v, b[k])
    # append mode withholds only windows not closed by the final watermark
    missing = set(b) - set(s)
    if missing:
        max_start = max(k[0] for k in b)
        assert all(k[0] >= max(k2[0] for k2 in s) for k in missing), missing
    assert len(s) >= len(b) - 5 * 2  # at most the last 2 window-starts withheld


def test_session_window_matches_lag_cumsum(spark):
    """F.session_window must agree with the lag/cumsum sessionization
    on session count per user (same 30-min gap)."""
    from parquet_to_hyper_app_spark.operators.llm.sessionize import sessionize

    native = stream_session_window(spark, SF_SMOKE)
    manual = sessionize(spark, SF_SMOKE)
    n_native = {
        r.user_id: r.n
        for r in native.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_manual = {
        r.user_id: r.n
        for r in manual.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert n_native == n_manual


def test_tumbling_counts_sum_to_total(spark):
    out = stream_tumbling(spark, SF_SMOKE)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == load_table(spark, SF_SMOKE, "events").count()


def test_incremental_agg_is_truly_incremental(spark, tmp_path):
    """Split the events table into 3 files, stream with
    maxFilesPerTrigger=1 (3 micro-batches), and assert (a) one snapshot
    per epoch — the merge really ran incrementally — and (b) the final
    snapshot equals the batch GROUP BY exactly (cents-exact sums)."""
    import glob
    import os

    from parquet_to_hyper_app_spark.streaming.sinks import run_incremental_agg
    from parquet_to_hyper_app_spark.streaming.source import RAW_EVENTS_SCHEMA

    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "src")
    # 3 files via repartition; written with a raw int64-µs ts so the
    # source schema matches events_file_stream's contract
    ev.select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(RAW_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "snaps")
    got = run_incremental_agg(spark, stream, str(tmp_path / "ckpt"), out_dir)
    n_snaps = len(glob.glob(os.path.join(out_dir, "snap_*")))
    assert n_snaps >= 3, f"expected >=3 epochs, got {n_snaps}"
    from parquet_to_hyper_app_spark.functions.exact import dec2, exact_sum

    want = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum(dec2("value")).alias("total_value"),
    )
    g = {r.event_type: (r.n_events, r.total_value) for r in got.collect()}
    w = {r.event_type: (r.n_events, r.total_value) for r in want.collect()}
    assert g == w


def test_incremental_agg_replay_cannot_double_count(spark, tmp_path):
    """An epoch re-delivered AFTER its own snapshot write succeeded
    (crash between snapshot write and checkpoint commit) must merge
    only with strictly earlier snapshots — replaying it leaves the
    final table identical, never doubled."""
    import glob
    import os

    from parquet_to_hyper_app_spark.streaming.sinks import merge_epoch

    ev = load_table(spark, SF_SMOKE, "events")
    out_dir = str(tmp_path / "snaps")
    b0 = ev.filter(F.col("event_id") % 2 == 0)
    b1 = ev.filter(F.col("event_id") % 2 == 1)
    merge_epoch(b0, 0, out_dir)
    merge_epoch(b1, 1, out_dir)
    final = sorted(glob.glob(os.path.join(out_dir, "snap_*")))[-1]
    before = {
        r.event_type: (r.n_events, r.cents)
        for r in spark.read.parquet(final).collect()
    }
    merge_epoch(b1, 1, out_dir)  # replay epoch 1 with snap_1 on disk
    after = {
        r.event_type: (r.n_events, r.cents)
        for r in spark.read.parquet(final).collect()
    }
    assert after == before
    total = sum(n for n, _ in after.values())
    assert total == ev.count()


def test_dedup_watermark_multibatch_stays_oracle_equivalent(spark, tmp_path):
    """Keys re-emitted after watermark state eviction (possible once the
    source runs multiple micro-batches) must not duplicate rows through
    the first-seen join — the emitted key set is deduped before the
    join, so the result equals the batch GROUP BY for any EVENT-TIME-
    ORDERED batch layout (a key first arriving wholly behind the
    advanced watermark would be eviction-dropped — see the
    run_dedup_watermark contract; this harness orders files by event
    time exactly so that case cannot occur)."""
    from parquet_to_hyper_app_spark.streaming.sinks import run_dedup_watermark
    from parquet_to_hyper_app_spark.streaming.source import RAW_EVENTS_SCHEMA

    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "src")
    # 4 single-file micro-batches in EVENT-TIME order (range-partitioned
    # on ts; the file source breaks equal-mtime ties by path, and
    # part-00000..3 match the range order). Time-ordered batches mean no
    # batch is ever behind the advanced watermark, so no key's FIRST
    # occurrence can be eviction-dropped (round-robin splits made that a
    # real race: a late-listed file's keys vanished entirely). Keys
    # spanning files still re-emit after their state evicts — the
    # duplication scenario the distinct() guards.
    ev.select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).repartitionByRange(4, "ts").sortWithinPartitions("ts").write.parquet(src)
    raw = (
        spark.readStream.schema(RAW_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    import uuid

    qname = f"ddw_test_{uuid.uuid4().hex[:8]}"
    got = run_dedup_watermark(raw, qname, str(tmp_path / "ckpt"), ev)
    rows = got.collect()
    keys = [(r.user_id, r.event_type) for r in rows]
    assert len(keys) == len(set(keys)), "duplicate keys leaked through the join"
    want = {
        (r.user_id, r.event_type): r.first_seen
        for r in ev.groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("first_seen"))
        .collect()
    }
    assert {(r.user_id, r.event_type): r.first_seen for r in rows} == want


def test_stream_ts_unit_matches_batch_catalog(spark):
    """Pin the round-2 regression: the file-stream source must deliver
    event timestamps in the SAME unit the batch catalog resolves to —
    streamed min/max(ts) (µs → timestamp) must equal batch min/max(ts)
    exactly, whatever physical unit the parquet file stores."""
    from parquet_to_hyper_app_spark.streaming.source import events_file_stream, run_to_memory

    import uuid

    qname = f"ts_unit_{uuid.uuid4().hex[:8]}"  # fresh checkpoint per run
    raw, ckpt = events_file_stream(spark, SF_SMOKE, qname)
    stream = raw.select(F.expr("timestamp_micros(ts)").cast("timestamp_ntz").alias("ts"))
    out = run_to_memory(stream, qname, ckpt, "append")
    s_min, s_max = out.agg(F.min("ts"), F.max("ts")).first()
    b_min, b_max = (
        load_table(spark, SF_SMOKE, "events").agg(F.min("ts"), F.max("ts")).first()
    )
    assert (s_min, s_max) == (b_min, b_max), (s_min, s_max, b_min, b_max)


def test_ts_scale_empty_source_is_identity(spark, tmp_path):
    """An empty (or all-NULL-ts) events source must yield the identity
    scale — the stream then runs and produces zero epochs, which the
    sinks handle; raising would turn a handled empty result into a
    query error. The probe result is also NOT cached, so a first batch
    arriving later gets a real magnitude detection."""
    from parquet_to_hyper_app_spark.streaming.source import (
        _TS_SCALE_CACHE,
        RAW_EVENTS_SCHEMA,
        _ts_micros_scale,
    )

    src = str(tmp_path / "empty_events")
    spark.createDataFrame([], RAW_EVENTS_SCHEMA).write.parquet(src)
    key = "test-empty-src"
    assert _ts_micros_scale(spark, src, key) == (1, 1)
    assert key not in _TS_SCALE_CACHE
