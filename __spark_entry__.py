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


# Round-2 check ordering. The driver verified the first 50 registry keys
# in round 1 (CORRECTNESS_r01.json == registry order[:50]); to get every
# key a driver-verified row across rounds, the keys with no round-1 row
# come first, then keys whose implementation changed this round (their
# round-1 row is stale), then headline re-checks. Keys not listed follow
# in registry order.
_CHECK_PRIORITY = [
    # -- no round-1 CORRECTNESS row (registry order) --
    "similarity_kmeans_ivf",
    "multimodal_features",
    "sessionize",
    "text_stats",
    "text_lang_dist",
    "text_quality",
    "text_token_bpe",
    "text_fingerprint",
    "text_lang_id",
    "scalar_string",
    "scalar_date",
    "scalar_math",
    "scalar_string_extra",
    "scalar_trycast",
    "scalar_map",
    "scalar_json",
    "array_ops",
    "udf_pandas_scalar",
    "udf_grouped_map",
    "udf_table",
    "convert_sink",
    "convert_sink_events",
    "source_orc_roundtrip",
    "source_json_roundtrip",
    "source_csv_roundtrip",
    "partitioned_sink_prune",
    "stream_foreach_batch",
    "stream_stateful_profile",
    "stream_tumbling",
    "stream_sliding",
    "stream_session_window",
    "stream_watermark_late",
    "stream_dedup",
    # -- round-1 row is a harness error; the fix (scalar per-quantile
    # columns) must get a fresh row even if the check budget is tight --
    "agg_approx_percentile",
    # -- new this round --
    "dedup_embedding_lsh",
    "source_merge_schema",
    "sink_compacted",
    "sink_range_clustered",
    "join_bucketed",
    "agg_salted_skew",
    "pipeline_training_corpus",
    "pipeline_training_corpus_full",
    "sample_stratified",
    "text_vocab_topk",
    "text_length_quartiles",
    "agg_string_agg",
    "window_distribution",
    "profile_columns",
    "source_csv_permissive",
    "stream_static_join",
    "join_full_outer",
    "window_first_last",
    "sql_subquery_scalar",
    "tpch_q5",
    "tpch_q7",
    "tpch_q8",
    "tpch_q10",
    "tpch_q13",
    "tpch_q15",
    "tpch_q17",
    "scd2_history",
    "set_intersect_all",
    "set_except_all",
    "join_asof_tolerance",
    "window_range_interval",
    "contamination_ngram",
    "doc_repetition",
    "quality_rollup_source",
    "text_cross_entropy",
    "sink_dynamic_partition_overwrite",
    "stream_stream_join",
    "tpch_q1",
    "tpch_q4",
    "tpch_q12",
    "tpch_q19",
    "tpch_q22",
    "tpch_q2",
    "tpch_q9",
    "tpch_q11",
    "tpch_q16",
    "tpch_q20",
    "tpch_q21",
    "text_pii_redact",
    "doc_packing",
    "embedding_quantize",
    # -- changed this round (round-1 row is stale but green) --
    "dedup_ngram_jaccard",
    "join_asof",
    "text_tfidf",
    "similarity_ivf",
    # -- headline re-checks (fill the remaining checked slots) --
    "parquet_scan",
    "clean_numeric",
    "agg_groupby",
    "join_multiway",
    "tpch_q3",
    "tpch_q6",
    "tpch_q14",
    "tpch_q18",
    "dedup_exact",
    "dedup_minhash_lsh",
    "similarity_topk",
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
