"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of `parquet_to_hyper_app_spark.registry`: every operator
declared in SURVEY.md §2B registers a (PySpark impl, DuckDB oracle SQL)
pair there; this module adapts the registry to the driver's
entry/queries/oracle_sql interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# the driver may load this module by file path from any CWD; make the
# sibling package importable regardless
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_to_hyper_app_spark.catalog import load_table
from parquet_to_hyper_app_spark.operators.cleaning import clean_numeric, normalize_schema
from parquet_to_hyper_app_spark.registry import load_all

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: reference conversion pipeline + TPC-H-Q1-shaped rollup.

    scan(lineitem) → clean_numeric → normalize_schema → groupBy agg —
    exercises scan, projection/expressions, partial+final hash
    aggregation (SURVEY.md §7.1).
    """
    from parquet_to_hyper_app_spark.functions.exact import dec2, exact_sum

    df = normalize_schema(clean_numeric(load_table(spark, _SF0001, "lineitem")))
    n = F.count(F.lit(1))
    return (
        df.groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(dec2("l_quantity")).alias("sum_qty"),
            exact_sum(dec2("l_extendedprice")).alias("sum_base_price"),
            exact_sum(dec2("l_extendedprice") * dec2(1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            (exact_sum(dec2("l_quantity")) / n).alias("avg_qty"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# Round-3 check ordering. The driver verifies the FIRST 50 keys of this
# dict per round; rounds 1+2 together produced rows for 99 of 134 keys.
# Slots 1–35: every key with NO driver row in either round (all 17 new
# TPC-H queries first — the ones a real analyst hits — then the corpus
# ops and remaining stragglers). Slots 36–50: keys whose implementation
# or oracle changed in round 3 (streaming ts-unit fix, newly-added
# oracles, recall columns), then headline re-checks. Keys not listed
# follow in registry order.
_CHECK_PRIORITY = [
    # -- never checked in r1/r2: TPC-H suite --
    "tpch_q1",
    "tpch_q2",
    "tpch_q4",
    "tpch_q5",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q10",
    "tpch_q11",
    "tpch_q12",
    "tpch_q13",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    # -- never checked: corpus / training-data ops --
    "contamination_ngram",
    "doc_repetition",
    "quality_rollup_source",
    "text_cross_entropy",
    "text_pii_redact",
    "doc_packing",
    "embedding_quantize",
    # -- never checked: remaining relational / window / sink / stream --
    "scd2_history",
    "join_full_outer",
    "join_asof_tolerance",
    "window_first_last",
    "window_range_interval",
    "set_intersect_all",
    "set_except_all",
    "sql_subquery_scalar",
    "sink_dynamic_partition_overwrite",
    "stream_stream_join",
    # -- round-3 fixes that MUST get a fresh row: the streaming ts-unit
    # bug (red in r2) and the keys whose oracle/columns changed --
    "stream_watermark_late",
    "stream_foreach_batch",
    "stream_stateful_profile",
    "convert_sink_events",
    "dedup_clusters",
    "pipeline_training_corpus_full",
    "similarity_ivf",
    "similarity_kmeans_ivf",
    # -- impl changed in r2 after their green row (stale greens) --
    "join_asof",
    "dedup_ngram_jaccard",
    "text_tfidf",
    # -- round-3 oracle/schema additions --
    "text_lang_id",
    "agg_approx_distinct",
    "agg_approx_percentile",
    # -- new round-3 operators (first two fit the 50-slot budget; the
    # other three analytics keys land right after and lead round 4) --
    "events_funnel",
    "retention_cohorts",
    "agg_histogram",
    "agg_median_mode",
    "text_ngram_lm",
    "stream_incremental_agg",
    "stream_dedup_watermark",
    "events_anomaly_zscore",
    "text_vocab_coverage",
    "sink_zorder_clustered",
]


def _ordered_specs():
    specs = load_all()
    ordered = {k: specs[k] for k in _CHECK_PRIORITY if k in specs}
    for key, spec in specs.items():
        if key not in ordered:
            ordered[key] = spec
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B."""
    return {key: spec.fn for key, spec in _ordered_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query key."""
    return {key: spec.oracle for key, spec in _ordered_specs().items() if spec.oracle is not None}
