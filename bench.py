"""Benchmark harness — prints ONE JSON line the driver records.

Runs the headline query set at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Every query is forced with a noop-format
write so the full plan executes and materializes (a bare .count()
would let Catalyst answer from parquet footers / prune all columns).

    python bench.py            # one JSON line on stdout
    python bench.py --verbose  # per-query progress on stderr
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parquet_to_hyper_app_spark.registry import load_all  # noqa: E402
from parquet_to_hyper_app_spark.session import build_session  # noqa: E402

#: representative headline set: reference-parity ETL, scan+filter,
#: join family, aggregation, window, top-k, LLM ops, streaming window.
HEADLINE = [
    "parquet_scan",
    "convert_sink",
    "filter_project",
    "join_inner",
    "join_multiway",
    "join_asof",
    "join_range",
    "agg_groupby",
    "agg_distinct",
    "window_moving_agg",
    "sort_limit",
    "join_bucketed",
    "agg_salted_skew",
    "pipeline_training_corpus",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_lsh",
    "similarity_topk",
    "sessionize",
    "text_stats",
    "stream_tumbling",
    # round-3 additions: the analytics surface + the heaviest TPC-H
    "events_funnel",
    "text_ngram_lm",
    "tpch_q1",
    "tpch_q9",
    # round-4 additions: the exact near-dup miner (the repo's heaviest
    # oracled operator, post prefix-filter fixes) and the heaviest
    # stateful streaming query (post state-partition sizing)
    "dedup_ngram_jaccard",
    "stream_stream_join",
    # round-6 additions (verdict r5 item 6): the waivered families were
    # correctness-checked but thin in the headline set — window, text
    # and streaming each gain coverage so a perf regression there can't
    # hide between rounds
    "window_running_total",
    "window_rank",
    "text_tfidf",
    "text_token_bpe",
    "stream_session_window",
    # round-6 additions (2): the heaviest of the new curation surface —
    # cross-doc span mining and clustered semantic dedup
    "dedup_substring",
    "dedup_semantic",
    # round-7 additions (verdict r6 item 6): the single most expensive
    # operator in the repo (absent from BENCH until now), the full
    # curation-report DAG, and the streaming quality gate
    "dedup_containment",
    "pipeline_curation_report",
    "stream_quality_gate",
    # round-16 additions (VERDICT r15 item 5, additions-only): the most
    # expensive operators were invisible to the driver bench — a
    # regression in the composed miners (canonical_keep ~6.9 s,
    # clusters ~5.8 s triage), the full pipeline (~4.0 s) or the
    # compacting sink (~3.7 s) could not show up anywhere
    "dedup_canonical_keep",
    "dedup_clusters",
    "pipeline_training_corpus_full",
    "sink_compacted",
]


def main() -> int:
    verbose = "--verbose" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", os.path.basename(sf_dir.rstrip("/")))
    sf = float(m.group(1)) if m else 0.0  # 0.0 = unknown/custom dir
    specs = load_all()
    spark = build_session("bench")

    # BENCH_r04's tail was wall-to-wall "AQE is not supported in
    # stateful workloads" — structural per-query-start noise from every
    # streaming bench rep that buried any REAL warn (spill, skew,
    # broadcast timeout). Silence exactly those two loggers; every
    # other logger stays at default level so real warns surface.
    jvm = spark.sparkContext._jvm
    jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.streaming.runtime.MicroBatchExecution",
        jvm.org.apache.logging.log4j.Level.ERROR,
    )
    jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.streaming.runtime.ResolveWriteToStream",
        jvm.org.apache.logging.log4j.Level.ERROR,
    )

    # warm every query ONCE on the *target* sf_dir — the warm-up runs
    # the exact plan that gets timed (same file listing, same parquet
    # footers in page cache, same codegen'd splits), so the timed
    # best-of-3 measures steady-state execution only. Round 2 warmed at
    # sf0.001 instead: the first timed key (parquet_scan) then absorbed
    # the target-scale listing/codegen costs and benched 1.9× its
    # steady state (BENCH_r02 0.644 s vs ~0.35 s measured in isolation).
    for key in HEADLINE:
        try:
            specs[key].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:  # noqa: BLE001 - warmup must never fail the bench
            pass
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for key in HEADLINE:
        fn = specs[key].fn
        # best-of-5: mask GC/JIT-deopt spikes. Raised from 3 after the
        # r3 convert_sink reading (1.82 s best-of-3) failed to reproduce
        # in isolation (8× clean-dir reps: min 1.20 s, median 1.36 s —
        # ambient load, not a regression; a dirty overwrite dir measured
        # no slower, so no per-rep sink cleanup is needed).
        reps: list[float] = []
        for _rep in range(5):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            reps.append(time.perf_counter() - t0)
        reps.sort()
        timings[key] = round(reps[0], 3)
        # [min, median, max] — lets a reader tell a real regression
        # (median moved) from ambient-load noise (max moved) without
        # re-running; the verdict-r4 regression triage needed exactly
        # this and had to re-measure out-of-band (r4 item 4)
        spread[key] = [round(reps[0], 3), round(reps[2], 3), round(reps[4], 3)]
        if verbose:
            print(
                f"{key}: {timings[key]:.2f}s (p50 {spread[key][1]:.2f}, "
                f"max {spread[key][2]:.2f})",
                file=sys.stderr,
            )

    total = round(sum(timings.values()), 3)
    # keep the printed one-line JSON LEAN: {metric, value, unit,
    # queries, sf} only. Rounds 6-14 all came back `parsed: null` on
    # the driver side (rc 0, output present) and round 15 lost its
    # whole round-over-round PERF comparison to it — the line, grown
    # by the per-key [min, median, max] spread map, apparently
    # exceeded what the driver's capture/parser handles (VERDICT r15
    # item 5). The spread triage data still gets recorded, in a
    # sidecar file next to this script instead of on the line.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_spread.json"),
            "w",
        ) as f:
            json.dump({"spread": spread, "sf": sf}, f)
    except OSError:
        pass  # the sidecar is triage data; never fail the bench on it
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
