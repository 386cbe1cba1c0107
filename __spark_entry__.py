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


# Round-4 check ordering — GENERATED, not hand-maintained (VERDICT r3
# item 6): `python tools/greens.py --emit` derives it from
# tools/green_state.json, which records each key's last non-failing
# driver round plus the source+oracle fingerprint the code had then.
# Order: never-checked keys first (the 9 round-3 additions that fell
# past round 3's 50-row budget), then keys edited since their last
# green (round-4 oracle promotions + the streaming-source refactor
# dependents + the r3 text_vocab_topk rewrite), then rotation by
# oldest green round. tests/test_green_tripwire.py regenerates the
# list and fails on drift or on a hot key outside the 50-slot budget.
with open(os.path.join(_REPO_ROOT, "tools", "check_priority.json")) as _f:
    import json as _json

    _CHECK_PRIORITY: list[str] = _json.load(_f)["order"]


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
